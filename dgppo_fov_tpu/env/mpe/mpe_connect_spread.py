"""MPEConnectSpread: coverage with a chain-connectivity constraint (n_cost=3).

Behavioral parity reference: /root/reference/dgppo/env/mpe/mpe_connect_spread.py:14-175.
Connectivity cost `(min_dist - connect_radius).max()` shared by all agents
(mpe_connect_spread.py:116-118); cost clipped to [-1, 1] — unlike base MPE's
one-sided clip (a documented reference quirk, SURVEY.md §7); reset rejects
whole configurations until both agents and goals form a connected chain
(mpe_connect_spread.py:50-88); always-connected obstacle edges.
"""
from typing import Optional, Tuple

import jax.numpy as jnp
import jax.random as jr
from jax.lax import while_loop

from ...graph import BlockGraph
from ...utils.typing import Array, Cost, State
from ..utils import get_node_goal_rng
from .base import MPE, MPEEnvState
from .mpe_spread import MPESpread


class MPEConnectSpread(MPESpread):
    PARAMS = {
        "car_radius": 0.05,
        "comm_radius": 0.5,
        "default_area_size": 1.0,
        "dist2goal": 0.01,
        "n_obs": 1,
        "obs_radius": 0.25,
        "connect_radius": 0.45,
    }

    def __init__(self, num_agents, area_size=None, max_step=128, dt=0.03, params=None):
        area_size = MPEConnectSpread.PARAMS["default_area_size"] if area_size is None else area_size
        if params is None:
            params = dict(self.PARAMS)
        super(MPESpread, self).__init__(num_agents, area_size, max_step, dt, params)
        self.num_goals = self._num_agents
        if self.params["n_obs"] != 1:
            self.params["n_obs"] = 1
            print("WARNING: n_obs is set to 1 for MPEConnectSpread.")

    @property
    def n_cost(self) -> int:
        return 3

    @property
    def cost_components(self) -> Tuple[str, ...]:
        return "agent collisions", "obs collisions", "connectivity"

    def reset(self, key: Array) -> BlockGraph:
        def non_valid_node(inp):
            _, state_nodes, goal_nodes = inp
            dist = jnp.linalg.norm(state_nodes[:, None] - state_nodes[None, :], axis=-1)
            dist += jnp.eye(self.num_agents) * 1e6
            min_dist = jnp.min(dist, axis=1)
            non_connect_agent = (min_dist > self.params["connect_radius"]).any()
            collide_agent = (min_dist < 2 * self.params["car_radius"]).any()

            dist = jnp.linalg.norm(goal_nodes[:, None] - goal_nodes[None, :], axis=-1)
            dist += jnp.eye(self.num_agents) * 1e6
            min_dist = jnp.min(dist, axis=1)
            non_connect_goal = (min_dist > self.params["connect_radius"]).any()
            return non_connect_agent | collide_agent | non_connect_goal

        def get_node(inp):
            this_key, use_key = jr.split(inp[0], 2)
            strip = (self.area_size - self.params["obs_radius"] * 2) / 2 - 1.5 * self.params["car_radius"]
            state_nodes, goal_nodes = get_node_goal_rng(
                use_key, self.area_size, 2, self.num_agents, 2.3 * self.params["car_radius"], None, strip
            )
            goal_nodes += jnp.array(
                [0.0, self.area_size - (self.area_size - self.params["obs_radius"] * 2) / 2 + 1.5 * self.params["car_radius"]]
            )
            return this_key, state_nodes, goal_nodes

        states = jnp.zeros((self.num_agents, 2))
        goals = jnp.zeros((self.num_agents, 2))
        key, states, goals = while_loop(non_valid_node, get_node, (key, states, goals))

        obs_key, key = jr.split(key, 2)
        obs_x = jr.uniform(
            obs_key, (1,), minval=self.params["obs_radius"], maxval=self.area_size - self.params["obs_radius"]
        )
        obs = jnp.array([[obs_x[0], self.area_size / 2]])

        states = jnp.concatenate([states, jnp.zeros_like(states)], axis=1)
        goals = jnp.concatenate([goals, jnp.zeros_like(goals)], axis=1)
        obs = jnp.concatenate([obs, jnp.zeros_like(obs)], axis=1)
        return self.get_graph(MPEEnvState(states, goals, obs))

    def get_cost(self, graph: BlockGraph) -> Cost:
        agent_states = graph.type_states(MPE.AGENT)
        obstacles = graph.type_states(MPE.OBS)[:, :2]
        agent_pos = agent_states[:, :2]

        dist = jnp.linalg.norm(agent_pos[:, None] - agent_pos[None, :], axis=-1)
        dist += jnp.eye(self.num_agents) * 1e6
        min_dist = jnp.min(dist, axis=1)
        agent_cost = self.params["car_radius"] * 2 - min_dist

        connect_cost = (min_dist - self.params["connect_radius"]).max()
        connect_cost = jnp.broadcast_to(connect_cost, (self.num_agents,))

        dist = jnp.linalg.norm(agent_pos[:, None] - obstacles[None, :], axis=-1)
        obs_cost = self.params["car_radius"] + self.params["obs_radius"] - jnp.min(dist, axis=1)

        cost = jnp.stack([agent_cost, obs_cost, connect_cost], axis=1)
        eps = 0.5
        cost = jnp.where(cost <= 0.0, cost - eps, cost + eps)
        # Two-sided clip — differs from base MPE (mpe_connect_spread.py:134).
        cost = jnp.clip(cost, -1.0, 1.0)
        return cost

    def state_lim(self, state: Optional[State] = None) -> Tuple[State, State]:
        lower = jnp.array([0.0, 0.0, -1.0, -1.0])
        upper = jnp.array([self.area_size, self.area_size * 2, 1.0, 1.0])
        return lower, upper

    def edge_blocks(self, state: MPEEnvState) -> Tuple[Tuple[Array, ...], Tuple[Array, ...]]:
        aa_feats, aa_mask = self._agent_agent_block(state)
        ag_feats = state.agent[:, None, :] - state.goal[None, :, :]
        ag_mask = jnp.ones((self.num_agents, self.num_goals), dtype=bool)

        if self.n_obs == 0:
            return (aa_feats, ag_feats), (aa_mask, ag_mask)
        agent_pos = state.agent[:, :2]
        obs_pos = state.obs[:, :2]
        dist = jnp.linalg.norm(agent_pos[:, None] - obs_pos[None, :], axis=-1)
        ao_mask = dist < self._params["comm_radius"] * 100
        ao_feats = state.agent[:, None, :] - state.obs[None, :, :]
        return (aa_feats, ag_feats, ao_feats), (aa_mask, ag_mask, ao_mask)
