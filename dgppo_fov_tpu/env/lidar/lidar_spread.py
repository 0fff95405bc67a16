"""LidarSpread: unassigned coverage with LiDAR-sensed rectangle obstacles.

Behavioral parity reference: /root/reference/dgppo/env/lidar_env/lidar_spread.py:11-96.
Dense agent<-goal edges.
"""
from typing import Optional, Tuple

import jax.numpy as jnp

from ...graph import BlockGraph
from ...utils.tree import jax_vmap
from ...utils.typing import Action, Array, Pos, Reward
from .base import LidarEnv, LidarEnvState


class LidarSpread(LidarEnv):
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

    def get_reward(self, graph: BlockGraph, action: Action) -> Reward:
        agent_states = graph.type_states(LidarEnv.AGENT)
        goals = graph.type_states(LidarEnv.GOAL)
        reward = jnp.zeros((), dtype=jnp.float32)

        dist2goal = jnp.linalg.norm(
            goals[:, None, :2] - agent_states[None, :, :2], axis=-1
        ).min(axis=1)
        reward -= dist2goal.mean() * 0.01
        reward -= jnp.where(dist2goal > self._params["dist2goal"], 1.0, 0.0).mean() * 0.001
        reward -= (jnp.linalg.norm(action, axis=1) ** 2).mean() * 0.0001
        return reward

    def edge_blocks(
        self, state: LidarEnvState, flat_hits: Optional[Pos]
    ) -> Tuple[Tuple[Array, ...], Tuple[Array, ...]]:
        aa_feats, aa_mask = self._agent_agent_block(state)

        feats_a = jax_vmap(self.state2feat)(state.agent)
        feats_g = jax_vmap(self.state2feat)(state.goal)
        ag_feats = feats_a[:, None, :] - feats_g[None, :, :]
        ag_mask = jnp.ones((self.num_agents, self.num_goals), dtype=bool)

        if flat_hits is None:
            return (aa_feats, ag_feats), (aa_mask, ag_mask)
        ah_feats, ah_mask = self._agent_hits_block(state, flat_hits)
        return (aa_feats, ag_feats, ah_feats), (aa_mask, ag_mask, ah_mask)
