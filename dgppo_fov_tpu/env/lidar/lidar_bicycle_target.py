"""LidarBicycleTarget: bicycle-dynamics agents with assigned goals.

Behavioral parity reference:
/root/reference/dgppo/env/lidar_env/lidar_bicycle_target.py:24-123.
State (x, y, cos th, sin th, v); action (omega, acc); nonlinear step
theta' = theta + v*omega*dt*10, pos += v*(cos,sin)*dt, v' = v + 10*acc*dt
(lidar_bicycle_target.py:92-111). `state2feat` maps to (x, y, vx, vy) for
edges (lidar_bicycle_target.py:113-118). Reset samples obstacle theta in
[-pi, pi) (not [0, 2pi)) and random initial headings.
"""
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

from ...graph import BlockGraph
from ...utils.typing import Action, AgentState, Array, State
from ..utils import get_node_goal_rng
from .base import LidarEnvState
from .lidar_target import LidarTarget


class LidarBicycleTarget(LidarTarget):
    RENDER_CAR_BODY = True  # oriented f1tenth body (reference :125-293)

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

    @property
    def state_dim(self) -> int:
        return 5  # x, y, cos(theta), sin(theta), v

    @property
    def node_dim(self) -> int:
        return 8  # state(5) + indicator

    @property
    def action_dim(self) -> int:
        return 2  # omega, acc

    def reset(self, key: Array) -> BlockGraph:
        # Shared sampler with the bicycle reference's [-pi, pi) theta range.
        # Also fixes num_obs=0: the previous inline copy built an EMPTY
        # Rectangle where step() substitutes None, so the rollout scan's
        # carry changed pytree structure and crashed.
        obstacles, key = self.sample_obstacles(key, theta_range=(-np.pi, np.pi))

        states, goals = get_node_goal_rng(
            key, self.area_size, 2, self.num_agents, 2.2 * self.params["car_radius"], obstacles
        )
        theta_key, key = jr.split(key, 2)
        thetas = jr.uniform(theta_key, (self.num_agents,), minval=0, maxval=2 * np.pi)
        theta_states = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], axis=-1)
        states = jnp.concatenate([states, theta_states, jnp.zeros((self.num_agents, 1))], axis=1)
        goals = jnp.concatenate([goals, jnp.zeros((self.num_agents, 3))], axis=1)
        env_states = LidarEnvState(states, goals, obstacles)
        lidar_data = self.get_lidar_data(states, obstacles)
        return self.get_graph(env_states, lidar_data)

    def agent_step_euler(self, agent_states: AgentState, action: Action) -> AgentState:
        assert action.shape == (self.num_agents, self.action_dim)

        def single_agent_step(x, u):
            theta = jnp.arctan2(x[3], x[2])
            theta_next = theta + x[4] * u[0] * self.dt * 10
            return jnp.array(
                [
                    x[0] + x[4] * jnp.cos(theta) * self.dt,
                    x[1] + x[4] * jnp.sin(theta) * self.dt,
                    jnp.cos(theta_next),
                    jnp.sin(theta_next),
                    x[4] + u[1] * self.dt * 10.0,
                ]
            )

        next_states = jax.vmap(single_agent_step)(agent_states, action)
        return self.clip_state(next_states)

    def state2feat(self, state: State) -> Array:
        vx = state[4] * state[2]
        vy = state[4] * state[3]
        return jnp.concatenate([state[:2], vx[None], vy[None]], axis=-1)

    def state_lim(self, state: Optional[State] = None) -> Tuple[State, State]:
        lower = jnp.array([0.0, 0.0, -1, -1, -0.5])
        upper = jnp.array([self.area_size, self.area_size, 1, 1, 0.5])
        return lower, upper

    # render_video: inherited from LidarEnv; RENDER_CAR_BODY selects the
    # oriented f1tenth body renderer (plot.py get_f1tenth_body).
