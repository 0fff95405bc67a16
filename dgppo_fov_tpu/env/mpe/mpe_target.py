"""MPETarget: assigned goals (agent i -> goal i).

Behavioral parity reference: /root/reference/dgppo/env/mpe/mpe_target.py:10-80.
Reward: -0.01*mean(dist2goal) - 0.001*mean(not_reached) - 0.0001*mean(|a|^2).

TPU redesign note: the reference builds n separate 1x1 agent<-goal edge
blocks (mpe_target.py:63-69); here the agent<-goal block is a dense
(n_agents, n_goals) block with an identity mask — identical incoming-edge
sets per receiver, so the attention math is unchanged.
"""
from typing import Optional, Tuple

import jax.numpy as jnp

from ...graph import BlockGraph
from ...utils.typing import Action, Array, Reward
from .base import MPE, MPEEnvState


class MPETarget(MPE):
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

        dist2goal = jnp.linalg.norm(goals[:, :2] - agent_states[:, :2], axis=-1)
        reward -= dist2goal.mean() * 0.01
        reward -= jnp.where(dist2goal > self._params["dist2goal"], 1.0, 0.0).mean() * 0.001
        reward -= (jnp.linalg.norm(action, axis=1) ** 2).mean() * 0.0001
        return reward

    def edge_blocks(self, state: MPEEnvState) -> Tuple[Tuple[Array, ...], Tuple[Array, ...]]:
        aa_feats, aa_mask = self._agent_agent_block(state)

        # agent i <- goal i only (identity mask).
        ag_feats = state.agent[:, None, :] - state.goal[None, :, :]
        ag_mask = jnp.eye(self.num_agents, dtype=bool)

        if self.n_obs == 0:
            return (aa_feats, ag_feats), (aa_mask, ag_mask)
        ao_feats, ao_mask = self._agent_obs_block(state)
        return (aa_feats, ag_feats, ao_feats), (aa_mask, ag_mask, ao_mask)
