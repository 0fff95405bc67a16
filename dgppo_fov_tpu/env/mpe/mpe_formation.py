"""MPEFormation: one landmark; goals form a circle of radius comm_radius.

Behavioral parity reference: /root/reference/dgppo/env/mpe/mpe_formation.py:14-117.
num_goals = 1 (the landmark node); target positions are derived on the fly by
`landmark2goal` in the reward.
"""
from typing import Optional

import jax
import jax.numpy as jnp
import jax.random as jr

from ...graph import BlockGraph
from ...utils.typing import Action, Array, Reward
from ..utils import get_node_goal_rng
from .base import MPE, MPEEnvState
from .mpe_spread import MPESpread


class MPEFormation(MPESpread):
    PARAMS = {
        "car_radius": 0.05,
        "comm_radius": 0.5,
        "n_obs": 3,
        "obs_radius": 0.05,
        "default_area_size": 1.5,
        "dist2goal": 0.01,
    }

    def __init__(self, num_agents, area_size=None, max_step=128, dt=0.03, params=None):
        area_size = MPEFormation.PARAMS["default_area_size"] if area_size is None else area_size
        super().__init__(num_agents, area_size, max_step, dt, params)
        self.num_goals = 1

    def landmark2goal(self, landmarks: Array, R: float) -> Array:
        assert landmarks.shape == (1, 2)
        thetas = jnp.linspace(0, 2 * jnp.pi, self.num_agents + 1)[:-1]
        return landmarks + R * jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], axis=-1)

    def reset(self, key: Array) -> BlockGraph:
        states, _ = get_node_goal_rng(
            key, self.area_size, 2, self.num_agents, 2 * self.params["car_radius"], None
        )

        R = self.params["comm_radius"]
        landmark_key, key = jr.split(key)
        landmark = jr.uniform(
            landmark_key,
            (1, 2),
            minval=R + 2 * self.params["car_radius"],
            maxval=self.area_size - R - 2 * self.params["car_radius"],
        )
        goals = self.landmark2goal(landmark, R)

        def get_obs(inp):
            this_key, _ = inp
            use_key, this_key = jr.split(this_key, 2)
            return this_key, jr.uniform(
                use_key, (2,),
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
        landmark = jnp.concatenate([landmark, jnp.zeros_like(landmark)], axis=1)
        return self.get_graph(MPEEnvState(states, landmark, obs))

    def get_reward(self, graph: BlockGraph, action: Action) -> Reward:
        agent_states = graph.type_states(MPE.AGENT)
        landmark = graph.type_states(MPE.GOAL)[:, :2]
        goals = self.landmark2goal(landmark, self.params["comm_radius"])

        reward = jnp.zeros((), dtype=jnp.float32)
        dist2goal = jnp.linalg.norm(
            goals[:, None, :2] - agent_states[None, :, :2], axis=-1
        ).min(axis=1)
        reward -= dist2goal.mean() * 0.01
        reward -= jnp.where(dist2goal > self._params["dist2goal"], 1.0, 0.0).mean() * 0.001
        reward -= (jnp.linalg.norm(action, axis=1) ** 2).mean() * 0.0001
        return reward
