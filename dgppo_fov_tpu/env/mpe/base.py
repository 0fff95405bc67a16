"""MPE particle environments: double-integrator agents, goals, point obstacles.

Behavioral parity reference: /root/reference/dgppo/env/mpe/base.py:30-251.
Dynamics: x_dot = [v, 10*a], Euler step, state clip (base.py:129-135).
Costs (2): agent-agent `2r - min_dist`, agent-obs `r + r_obs - min_dist`,
margin transform `where(c<=0, c-0.5, c+0.5)` then clip(min=-1) (base.py:164-191).
Reset: `get_node_goal_rng` + per-obstacle rejection loops (base.py:81-127),
with identical PRNG split order.

TPU redesign: the graph is a BlockGraph with static blocks
(agent<-agent, agent<-goal, agent<-obs) instead of a padded edge list.
"""
import functools as ft
import pathlib
from abc import ABC, abstractmethod
from typing import NamedTuple, Optional, Tuple

import jax
import numpy as np
import jax.numpy as jnp
import jax.random as jr

from ...graph import BlockGraph, BlockSpec, GraphSpec, TypeSpec, build_graph
from ...utils.typing import Action, AgentState, Array, Cost, Reward, State
from ..base import MultiAgentEnv, StepResult
from ..utils import get_node_goal_rng, nearest_other_dist


class MPEEnvState(NamedTuple):
    agent: State
    goal: State
    obs: State

    @property
    def n_agent(self) -> int:
        return self.agent.shape[0]


class MPE(MultiAgentEnv, ABC):
    AGENT = 0
    GOAL = 1
    OBS = 2

    PARAMS = {
        "car_radius": 0.05,
        "comm_radius": 0.5,
        "n_obs": 3,
        "obs_radius": 0.05,
        "default_area_size": 1.0,
        "dist2goal": 0.01,
    }

    def __init__(
        self,
        num_agents: int,
        area_size: Optional[float] = None,
        max_step: int = 128,
        dt: float = 0.03,
        params: dict = None,
    ):
        area_size = type(self).PARAMS["default_area_size"] if area_size is None else area_size
        super().__init__(num_agents, area_size, max_step, dt, params)
        self.num_goals = self._num_agents

    @property
    def state_dim(self) -> int:
        return 4  # x, y, vx, vy

    @property
    def node_dim(self) -> int:
        return 7  # state(4) + one-hot type: agent 001, goal 010, obstacle 100

    @property
    def edge_dim(self) -> int:
        return 4  # x_rel, y_rel, vx_rel, vy_rel

    @property
    def action_dim(self) -> int:
        return 2  # ax, ay

    @property
    def n_cost(self) -> int:
        return 2

    @property
    def cost_components(self) -> Tuple[str, ...]:
        return "agent collisions", "obs collisions"

    # ---- static graph layout -------------------------------------------------
    @property
    def n_obs(self) -> int:
        return self._params["n_obs"]

    @property
    def graph_spec(self) -> GraphSpec:
        n, g, o = self.num_agents, self.num_goals, self.n_obs
        types = [TypeSpec(MPE.AGENT, 0, n), TypeSpec(MPE.GOAL, n, g)]
        blocks = [
            BlockSpec("aa", 0, n, 0, n),
            BlockSpec("ag", 0, n, n, g),
        ]
        if o > 0:
            types.append(TypeSpec(MPE.OBS, n + g, o))
            blocks.append(BlockSpec("ao", 0, n, n + g, o))
        return GraphSpec(
            n_nodes=n + g + o,
            node_dim=self.node_dim,
            state_dim=self.state_dim,
            edge_dim=self.edge_dim,
            types=tuple(types),
            blocks=tuple(blocks),
        )

    # ---- reset ---------------------------------------------------------------
    def reset(self, key: Array) -> BlockGraph:
        states, goals = get_node_goal_rng(
            key, self.area_size, 2, self.num_agents, 2 * self.params["car_radius"], None
        )

        # Obstacle rejection sampling (reference mpe/base.py:93-118).
        def get_obs(inp):
            this_key, _ = inp
            use_key, this_key = jr.split(this_key, 2)
            return this_key, jr.uniform(
                use_key,
                (2,),
                minval=self.params["car_radius"] * 3,
                maxval=self.area_size - self.params["car_radius"] * 3,
            )

        def non_valid_obs(inp):
            _, this_obs = inp
            dist_min_agents = jnp.linalg.norm(states - this_obs, axis=1).min()
            dist_min_goals = jnp.linalg.norm(goals - this_obs, axis=1).min()
            collide_agent = dist_min_agents <= self.params["car_radius"] + self.params["obs_radius"]
            collide_goal = dist_min_goals <= self.params["car_radius"] * 2 + self.params["obs_radius"]
            out_region = jnp.any(this_obs < self.params["car_radius"] * 3) | jnp.any(
                this_obs > self.area_size - self.params["car_radius"] * 3
            )
            return collide_agent | collide_goal | out_region

        def get_valid_obs(carry, this_key):
            use_key, this_key = jr.split(this_key, 2)
            candidate = jr.uniform(use_key, (2,), minval=0, maxval=self.area_size)
            _, valid = jax.lax.while_loop(non_valid_obs, get_obs, (this_key, candidate))
            return carry, valid

        if self.n_obs > 0:
            obs_keys = jr.split(key, self.n_obs)
            _, obs = jax.lax.scan(get_valid_obs, None, obs_keys)
            obs = jnp.concatenate([obs, jnp.zeros_like(obs)], axis=1)
        else:
            obs = jnp.zeros((0, 4))

        states = jnp.concatenate([states, jnp.zeros_like(states)], axis=1)
        goals = jnp.concatenate([goals, jnp.zeros_like(goals)], axis=1)
        return self.get_graph(MPEEnvState(states, goals, obs))

    # ---- dynamics --------------------------------------------------------------
    def agent_step_euler(self, agent_states: AgentState, action: Action) -> AgentState:
        assert action.shape == (self.num_agents, self.action_dim)
        x_dot = jnp.concatenate([agent_states[:, 2:], action * 10.0], axis=1)
        return self.clip_state(x_dot * self.dt + agent_states)

    def step(self, graph: BlockGraph, action: Action, get_eval_info: bool = False) -> StepResult:
        agent_states = graph.type_states(MPE.AGENT)
        goals = graph.type_states(MPE.GOAL)
        obstacles = graph.type_states(MPE.OBS) if self.n_obs > 0 else jnp.zeros((0, 4))

        action = self.clip_action(action)
        next_agent_states = self.agent_step_euler(agent_states, action)
        done = jnp.array(False)

        # Reward and cost are evaluated on the *current* graph
        # (reference mpe/base.py:154-158).
        reward = self.get_reward(graph, action)
        cost = self.get_cost(graph)

        next_graph = self.get_graph(MPEEnvState(next_agent_states, goals, obstacles))
        return StepResult(next_graph, reward, cost, done, {})

    @abstractmethod
    def get_reward(self, graph: BlockGraph, action: Action) -> Reward: ...

    def get_cost(self, graph: BlockGraph) -> Cost:
        agent_states = graph.type_states(MPE.AGENT)
        agent_pos = agent_states[:, :2]

        agent_cost = self.params["car_radius"] * 2 - nearest_other_dist(agent_pos)

        if self.n_obs == 0:
            obs_cost = jnp.zeros(self.num_agents)
        else:
            obstacles = graph.type_states(MPE.OBS)[:, :2]
            dist = jnp.linalg.norm(agent_pos[:, None] - obstacles[None, :], axis=-1)
            min_dist = jnp.min(dist, axis=1)
            obs_cost = self.params["car_radius"] + self.params["obs_radius"] - min_dist

        cost = jnp.stack([agent_cost, obs_cost], axis=1)

        # Margin + one-sided clip (reference mpe/base.py:186-189).
        eps = 0.5
        cost = jnp.where(cost <= 0.0, cost - eps, cost + eps)
        cost = jnp.clip(cost, min=-1.0)
        return cost

    # ---- graph construction ------------------------------------------------------
    @abstractmethod
    def edge_blocks(self, state: MPEEnvState) -> Tuple[Tuple[Array, ...], Tuple[Array, ...]]:
        """Return (edges, masks) tuples matching graph_spec.blocks order."""

    def _indicator(self) -> jnp.ndarray:
        """Static per-node one-hot type indicator (reference mpe/base.py:222-225:
        agent col 6, goal col 5, obs col 4 — i.e. cols state_dim + [2,1,0])."""
        n, g, o = self.num_agents, self.num_goals, self.n_obs
        ind = np.zeros((n + g + o, 3), dtype=np.float32)
        ind[:n, 2] = 1.0
        ind[n : n + g, 1] = 1.0
        if o > 0:
            ind[n + g :, 0] = 1.0
        return jnp.asarray(ind)

    def get_graph(self, env_state: MPEEnvState) -> BlockGraph:
        spec = self.graph_spec
        o = self.n_obs

        states = jnp.concatenate(
            [env_state.agent, env_state.goal] + ([env_state.obs] if o > 0 else []), axis=0
        )
        # node_feats = [states | indicator]; the indicator block is a
        # compile-time constant, so this is a single concat per step.
        node_feats = jnp.concatenate([states, self._indicator()], axis=1)

        edges, masks = self.edge_blocks(env_state)
        return build_graph(spec, node_feats, states, edges, masks, env_state)

    # ---- common edge-block builders -----------------------------------------------
    def _agent_agent_block(self, state: MPEEnvState) -> Tuple[Array, Array]:
        agent_pos = state.agent[:, :2]
        state_diff = state.agent[:, None, :] - state.agent[None, :, :]  # recv - send
        dist = jnp.linalg.norm(agent_pos[:, None] - agent_pos[None, :], axis=-1)
        dist = dist + jnp.eye(self.num_agents) * (self._params["comm_radius"] + 1)
        mask = dist < self._params["comm_radius"]
        return state_diff, mask

    def _agent_obs_block(self, state: MPEEnvState) -> Tuple[Array, Array]:
        agent_pos = state.agent[:, :2]
        obs_pos = state.obs[:, :2]
        dist = jnp.linalg.norm(agent_pos[:, None] - obs_pos[None, :], axis=-1)
        mask = dist < self._params["comm_radius"]
        state_diff = state.agent[:, None, :] - state.obs[None, :, :]
        return state_diff, mask

    def state_lim(self, state: Optional[State] = None) -> Tuple[State, State]:
        lower = jnp.array([0.0, 0.0, -1.0, -1.0])
        upper = jnp.array([self.area_size, self.area_size, 1.0, 1.0])
        return lower, upper

    def action_lim(self) -> Tuple[Action, Action]:
        return -jnp.ones(2), jnp.ones(2)

    def render_video(
        self, rollout, video_path: pathlib.Path, Ta_is_unsafe=None, viz_opts: dict = None,
        dpi: int = 100, **kwargs,
    ) -> pathlib.Path:
        from ..plot import render_mpe

        return render_mpe(
            rollout=rollout,
            video_path=video_path,
            side_length=self.area_size,
            dim=2,
            n_agent=self.num_agents,
            n_obs=self.n_obs,
            r=self.params["car_radius"],
            obs_r=self.params["obs_radius"],
            cost_components=self.cost_components,
            Ta_is_unsafe=Ta_is_unsafe,
            viz_opts=viz_opts,
            n_goal=self.num_goals,
            dpi=dpi,
            **kwargs,
        )
