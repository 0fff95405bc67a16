"""MPESpread: unassigned coverage (each goal scored by its nearest agent).

Behavioral parity reference: /root/reference/dgppo/env/mpe/mpe_spread.py:10-81.
"""
from typing import Tuple

import jax.numpy as jnp

from ...graph import BlockGraph
from ...utils.typing import Action, Array, Reward
from .base import MPE, MPEEnvState


class MPESpread(MPE):
    PARAMS = {
        "car_radius": 0.05,
        "comm_radius": 0.5,
        "n_obs": 3,
        "obs_radius": 0.05,
        "default_area_size": 1.5,
        "dist2goal": 0.01,
    }

    def get_reward(self, graph: BlockGraph, action: Action) -> Reward:
        agent_states = graph.type_states(MPE.AGENT)
        goals = graph.type_states(MPE.GOAL)
        reward = jnp.zeros((), dtype=jnp.float32)

        # Each goal finds its nearest agent.
        dist2goal = jnp.linalg.norm(
            goals[:, None, :2] - agent_states[None, :, :2], axis=-1
        ).min(axis=1)
        reward -= dist2goal.mean() * 0.01
        reward -= jnp.where(dist2goal > self._params["dist2goal"], 1.0, 0.0).mean() * 0.001
        reward -= (jnp.linalg.norm(action, axis=1) ** 2).mean() * 0.0001
        return reward

    def edge_blocks(self, state: MPEEnvState) -> Tuple[Tuple[Array, ...], Tuple[Array, ...]]:
        aa_feats, aa_mask = self._agent_agent_block(state)

        # All-pairs agent <- goal edges (mpe_spread.py:63-68).
        ag_feats = state.agent[:, None, :] - state.goal[None, :, :]
        ag_mask = jnp.ones((self.num_agents, self.num_goals), dtype=bool)

        if self.n_obs == 0:
            return (aa_feats, ag_feats), (aa_mask, ag_mask)
        ao_feats, ao_mask = self._agent_obs_block(state)
        return (aa_feats, ag_feats, ao_feats), (aa_mask, ag_mask, ao_mask)
