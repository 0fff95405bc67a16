"""Lidar environments: double-integrator agents sensing rotated-rectangle
obstacles through a LiDAR raycaster; top-k hit points become graph nodes.

Behavioral parity reference: /root/reference/dgppo/env/lidar_env/base.py:35-281.
 - reset samples n_obs random rotated rectangles (base.py:89-107)
 - get_lidar_data: vmapped raycast, n_rays beams, top_k returns per agent
   (base.py:126-140)
 - double-integrator Euler step (base.py:142-149); step recomputes LiDAR for
   the next state (base.py:151-174)
 - costs (2): agent-agent `2r - min_dist`, agent-hit `r - min_dist`, margin
   0.5, clip [-1, 1] (base.py:180-207 — note two-sided clip, unlike MPE)
 - graph nodes: agents + goals + n_agents*top_k hit points (base.py:227-271)
 - velocity limits ±0.5 (base.py:273-276)

TPU redesign: hits are a diagonal BlockSpec (agent i <- its own top-k hits),
and node states/types occupy static slices (no padding node, no cumsum
scatter).
"""
import functools as ft
import pathlib
from abc import ABC, abstractmethod
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import jax.random as jr
import numpy as np

from ...graph import BlockGraph, BlockSpec, GraphSpec, TypeSpec, build_graph
from ...utils.tree import jax_vmap, merge01
from ...utils.typing import Action, AgentState, Array, Cost, Pos, Reward, State
from ..base import MultiAgentEnv, StepResult
from ..obstacle import Rectangle
from ..utils import get_lidar, get_node_goal_rng, nearest_other_dist


class LidarEnvState(NamedTuple):
    agent: State
    goal: State
    obstacle: Optional[Rectangle]

    @property
    def n_agent(self) -> int:
        return self.agent.shape[0]


class LidarEnv(MultiAgentEnv, ABC):
    AGENT = 0
    GOAL = 1
    OBS = 2

    # Agents render as circles by default; bicycle agents override to draw
    # oriented f1tenth car bodies (reference lidar_bicycle_target.py:125-293).
    RENDER_CAR_BODY = False

    PARAMS = {
        "car_radius": 0.05,
        "comm_radius": 0.5,
        "n_rays": 32,
        "obs_len_range": [0.1, 0.3],
        "n_obs": 3,
        "default_area_size": 1.5,
        "dist2goal": 0.01,
        "top_k_rays": 8,
    }

    def __init__(self, num_agents, area_size=None, max_step=128, dt=0.03, params=None):
        area_size = type(self).PARAMS["default_area_size"] if area_size is None else area_size
        super().__init__(num_agents, area_size, max_step, dt, params)
        self.create_obstacles = jax_vmap(Rectangle.create)
        self.num_goals = self._num_agents

    @property
    def state_dim(self) -> int:
        return 4

    @property
    def node_dim(self) -> int:
        return 7  # state(4) + indicator: agent 001, goal 010, obstacle 100

    @property
    def edge_dim(self) -> int:
        return 4

    @property
    def action_dim(self) -> int:
        return 2

    @property
    def n_cost(self) -> int:
        return 2

    @property
    def cost_components(self) -> Tuple[str, ...]:
        return "agent collisions", "obs collisions"

    @property
    def n_obs(self) -> int:
        return self._params["n_obs"]

    @property
    def top_k(self) -> int:
        return self._params["top_k_rays"]

    @property
    def n_hits(self) -> int:
        return self.top_k * self.num_agents if self.n_obs > 0 else 0

    # ---- static graph layout -----------------------------------------------
    def _extra_blocks(self) -> Tuple[BlockSpec, ...]:
        """Subclasses add blocks (e.g. FoV chain edges) after aa/ag/hits."""
        return ()

    @property
    def graph_spec(self) -> GraphSpec:
        n, g, h = self.num_agents, self.num_goals, self.n_hits
        types = [TypeSpec(LidarEnv.AGENT, 0, n), TypeSpec(LidarEnv.GOAL, n, g)]
        blocks = [BlockSpec("aa", 0, n, 0, n), BlockSpec("ag", 0, n, n, g)]
        if h > 0:
            types.append(TypeSpec(LidarEnv.OBS, n + g, h))
            blocks.append(BlockSpec("ah", 0, n, n + g, h, diag_chunk=self.top_k))
        blocks.extend(self._extra_blocks())
        return GraphSpec(
            n_nodes=n + g + h,
            node_dim=self.node_dim,
            state_dim=self.state_dim,
            edge_dim=self.edge_dim,
            types=tuple(types),
            blocks=tuple(blocks),
        )

    # ---- reset ----------------------------------------------------------------
    def sample_obstacles(
        self, key: Array, theta_range: Tuple[float, float] = (0.0, 2 * np.pi)
    ) -> Tuple[Optional[Rectangle], Array]:
        """Random rotated rectangles; returns (obstacles, remaining key).

        `theta_range` parameterizes the rotation draw — the bicycle env's
        reference reset samples theta in [-pi, pi) where the others use
        [0, 2pi) — so every family shares this one sampler (same key-split
        order: obstacle, length, theta; none consumed when n_obs == 0).
        """
        if self.n_obs == 0:
            return None, key
        obstacle_key, key = jr.split(key, 2)
        obs_pos = jr.uniform(obstacle_key, (self.n_obs, 2), minval=0, maxval=self.area_size)
        length_key, key = jr.split(key, 2)
        obs_len = jr.uniform(
            length_key,
            (self.n_obs, 2),
            minval=self._params["obs_len_range"][0],
            maxval=self._params["obs_len_range"][1],
        )
        theta_key, key = jr.split(key, 2)
        obs_theta = jr.uniform(theta_key, (self.n_obs,), minval=theta_range[0], maxval=theta_range[1])
        return self.create_obstacles(obs_pos, obs_len[:, 0], obs_len[:, 1], obs_theta), key

    def reset(self, key: Array) -> BlockGraph:
        obstacles, key = self.sample_obstacles(key)
        states, goals = get_node_goal_rng(
            key, self.area_size, 2, self.num_agents, 2.2 * self.params["car_radius"], obstacles
        )
        states = jnp.concatenate(
            [states, jnp.zeros((self.num_agents, self.state_dim - states.shape[1]))], axis=1
        )
        goals = jnp.concatenate(
            [goals, jnp.zeros((self.num_goals, self.state_dim - goals.shape[1]))], axis=1
        )
        env_states = LidarEnvState(states, goals, obstacles)
        lidar_data = self.get_lidar_data(states, obstacles)
        return self.get_graph(env_states, lidar_data)

    def get_lidar_data(self, states: State, obstacles) -> Optional[Array]:
        if self.n_obs == 0:
            return None
        if isinstance(obstacles, Rectangle):
            # Beam-vectorized fast path (ops/raycast.py): segment quantities
            # computed once per agent instead of per beam.
            from ...ops.raycast import lidar_rectangles
            from ..utils import inside_obstacles

            agent_pos = states[:, :2]
            is_in = inside_obstacles(agent_pos, obstacles)
            lidar_data = jax_vmap(
                ft.partial(
                    lidar_rectangles,
                    points=obstacles.points,
                    num_beams=self._params["n_rays"],
                    sense_range=self._params["comm_radius"],
                    max_returns=self.top_k,
                )
            )(agent_pos, is_inside=is_in)
        else:
            get_lidar_vmap = jax_vmap(
                ft.partial(
                    get_lidar,
                    obstacles=obstacles,
                    num_beams=self._params["n_rays"],
                    sense_range=self._params["comm_radius"],
                    max_returns=self.top_k,
                )
            )
            lidar_data = get_lidar_vmap(states[:, :2])
        assert lidar_data.shape == (self.num_agents, self.top_k, 2)
        return lidar_data

    # ---- dynamics -----------------------------------------------------------------
    def agent_step_euler(self, agent_states: AgentState, action: Action) -> AgentState:
        assert action.shape == (self.num_agents, self.action_dim)
        x_dot = jnp.concatenate([agent_states[:, 2:], action * 10.0], axis=1)
        return self.clip_state(x_dot * self.dt + agent_states)

    def step(self, graph: BlockGraph, action: Action, get_eval_info: bool = False) -> StepResult:
        agent_states = graph.type_states(LidarEnv.AGENT)
        goals = graph.type_states(LidarEnv.GOAL)
        obstacles = graph.env_states.obstacle if self.n_obs > 0 else None

        action = self.clip_action(action)
        next_agent_states = self.agent_step_euler(agent_states, action)
        next_state = LidarEnvState(next_agent_states, goals, obstacles)
        lidar_data_next = self.get_lidar_data(next_agent_states, obstacles)
        done = jnp.array(False)

        reward = self.get_reward(graph, action)
        cost = self.get_cost(graph)
        return StepResult(self.get_graph(next_state, lidar_data_next), reward, cost, done, {})

    @abstractmethod
    def get_reward(self, graph: BlockGraph, action: Action) -> Reward: ...

    def get_cost(self, graph: BlockGraph) -> Cost:
        agent_states = graph.type_states(LidarEnv.AGENT)
        agent_pos = agent_states[:, :2]

        agent_cost = self.params["car_radius"] * 2 - nearest_other_dist(agent_pos)

        if self.n_obs == 0:
            obs_cost = jnp.zeros((self.num_agents,), dtype=jnp.float32)
        else:
            hits = graph.type_states(LidarEnv.OBS)[:, :2].reshape(self.num_agents, self.top_k, 2)
            dist = jnp.linalg.norm(hits - agent_pos[:, None, :], axis=-1)
            obs_cost = self.params["car_radius"] - dist.min(axis=1)

        cost = jnp.stack([agent_cost, obs_cost], axis=1)
        eps = 0.5
        cost = jnp.where(cost <= 0.0, cost - eps, cost + eps)
        # Two-sided clip (lidar_env/base.py:205) — differs from MPE's one-sided.
        cost = jnp.clip(cost, -1.0, 1.0)
        return cost

    # ---- graph construction ---------------------------------------------------------
    @abstractmethod
    def edge_blocks(
        self, state: LidarEnvState, lidar_data: Optional[Pos]
    ) -> Tuple[Tuple[Array, ...], Tuple[Array, ...]]: ...

    def _indicator(self) -> jnp.ndarray:
        """Static per-node one-hot type indicator (lidar_env/base.py:243-247:
        agent col state_dim+2, goal col state_dim+1, hit col state_dim)."""
        n, g, h = self.num_agents, self.num_goals, self.n_hits
        ind = np.zeros((n + g + h, 3), dtype=np.float32)
        ind[:n, 2] = 1.0
        ind[n : n + g, 1] = 1.0
        if h > 0:
            ind[n + g :, 0] = 1.0
        return jnp.asarray(ind)

    def get_graph(self, state: LidarEnvState, lidar_data: Optional[Pos] = None) -> BlockGraph:
        spec = self.graph_spec
        h = self.n_hits

        flat_hits = merge01(lidar_data) if lidar_data is not None else None

        states = jnp.concatenate([state.agent, state.goal], axis=0)
        if flat_hits is not None:
            hit_states = jnp.concatenate(
                [flat_hits, jnp.zeros((h, self.state_dim - flat_hits.shape[1]))], axis=1
            )
            states = jnp.concatenate([states, hit_states], axis=0)

        # node_feats = [states | indicator]; indicator is a compile-time
        # constant (lidar_env/base.py:234-247 built the same content with
        # scatter updates).
        node_feats = jnp.concatenate([states, self._indicator()], axis=1)

        edges, masks = self.edge_blocks(state, flat_hits)
        return build_graph(spec, node_feats, states, edges, masks, state)

    # ---- common edge builders ----------------------------------------------------------
    def state2feat(self, state: State) -> Array:
        return state

    def _agent_agent_block(self, state: LidarEnvState) -> Tuple[Array, Array]:
        agent_pos = state.agent[:, :2]
        feats = jax_vmap(self.state2feat)(state.agent)
        edge_feats = feats[:, None, :] - feats[None, :, :]
        dist = jnp.linalg.norm(agent_pos[:, None] - agent_pos[None, :], axis=-1)
        dist = dist + jnp.eye(self.num_agents) * (self._params["comm_radius"] + 1)
        mask = dist < self._params["comm_radius"]
        return edge_feats, mask

    def _agent_hits_block(self, state: LidarEnvState, flat_hits: Array) -> Tuple[Array, Array]:
        """Diagonal block: agent i <- its own top_k hit points.

        Active-range mask: hit within comm_radius - 0.1
        (lidar_target.py:86-89).
        """
        agent_pos = state.agent[:, :2]
        hits = flat_hits.reshape(self.num_agents, self.top_k, 2)
        rel = agent_pos[:, None, :] - hits  # (n, k, 2)
        dist = jnp.linalg.norm(rel, axis=-1)
        mask = dist < self._params["comm_radius"] - 1e-1
        feats = jnp.concatenate(
            [rel, jnp.zeros((self.num_agents, self.top_k, self.edge_dim - 2))], axis=-1
        )
        return feats, mask

    def state_lim(self, state: Optional[State] = None) -> Tuple[State, State]:
        lower = jnp.array([0.0, 0.0, -0.5, -0.5])
        upper = jnp.array([self.area_size, self.area_size, 0.5, 0.5])
        return lower, upper

    def action_lim(self) -> Tuple[Action, Action]:
        return -jnp.ones(2), jnp.ones(2)

    def render_video(
        self, rollout, video_path: pathlib.Path, Ta_is_unsafe=None, viz_opts: dict = None,
        dpi: int = 100, **kwargs,
    ) -> pathlib.Path:
        from ..plot import render_lidar

        return render_lidar(
            rollout=rollout,
            video_path=video_path,
            side_length=self.area_size,
            dim=2,
            n_agent=self.num_agents,
            n_rays=self.top_k if self.n_obs > 0 else 0,
            r=self.params["car_radius"],
            cost_components=self.cost_components,
            Ta_is_unsafe=Ta_is_unsafe,
            viz_opts=viz_opts,
            n_goal=self.num_goals,
            dpi=dpi,
            car_body=self.RENDER_CAR_BODY,
            **kwargs,
        )
