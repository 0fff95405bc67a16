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
from ..utils import get_node_goal_rng, nearest_other_dist
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
        r_car = self.params["car_radius"]
        r_obs = self.params["obs_radius"]
        r_connect = self.params["connect_radius"]
        # Agents spawn in the lower horizontal strip, goals in the mirrored
        # upper strip (one obstacle row sits between them); whole
        # configurations are rejected until agents AND goals each form a
        # connected chain with no agent collisions.
        strip_height = (self.area_size - r_obs * 2) / 2 - 1.5 * r_car
        goal_strip_shift = jnp.array([0.0, self.area_size - (self.area_size - r_obs * 2) / 2 + 1.5 * r_car])

        def chain_broken(carry):
            _, agents, goals = carry
            agent_gap = nearest_other_dist(agents)
            goal_gap = nearest_other_dist(goals)
            return (
                (agent_gap > r_connect).any()
                | (agent_gap < 2 * r_car).any()
                | (goal_gap > r_connect).any()
            )

        def resample(carry):
            carry_key, draw_key = jr.split(carry[0], 2)
            agents, goals = get_node_goal_rng(
                draw_key, self.area_size, 2, self.num_agents, 2.3 * r_car, None, strip_height
            )
            return carry_key, agents, goals + goal_strip_shift

        placeholder = jnp.zeros((self.num_agents, 2))
        key, agent_pos, goal_pos = while_loop(chain_broken, resample, (key, placeholder, placeholder))

        # The single obstacle slides along the mid-line.
        obs_key, key = jr.split(key, 2)
        obs_x = jr.uniform(obs_key, (1,), minval=r_obs, maxval=self.area_size - r_obs)
        obs_pos = jnp.array([[obs_x[0], self.area_size / 2]])

        def at_rest(pos):  # state = position ++ zero velocity
            return jnp.concatenate([pos, jnp.zeros_like(pos)], axis=1)

        return self.get_graph(MPEEnvState(at_rest(agent_pos), at_rest(goal_pos), at_rest(obs_pos)))

    def get_cost(self, graph: BlockGraph) -> Cost:
        agent_pos = graph.type_states(MPE.AGENT)[:, :2]
        obstacles = graph.type_states(MPE.OBS)[:, :2]

        neighbor_gap = nearest_other_dist(agent_pos)
        agent_cost = self.params["car_radius"] * 2 - neighbor_gap
        # Connectivity is a TEAM constraint: the worst chain gap, shared by
        # every agent's cost row.
        connect_cost = jnp.broadcast_to(
            (neighbor_gap - self.params["connect_radius"]).max(), (self.num_agents,)
        )
        obs_dist = jnp.linalg.norm(agent_pos[:, None] - obstacles[None, :], axis=-1)
        obs_cost = self.params["car_radius"] + self.params["obs_radius"] - jnp.min(obs_dist, axis=1)

        cost = jnp.stack([agent_cost, obs_cost, connect_cost], axis=1)
        eps = 0.5
        cost = jnp.where(cost <= 0.0, cost - eps, cost + eps)
        # Two-sided clip — differs from base MPE (mpe_connect_spread.py:134).
        return jnp.clip(cost, -1.0, 1.0)

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
