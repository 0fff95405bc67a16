"""MPECorridor: two fixed large obstacles forming a corridor; goals across it.

Behavioral parity reference: /root/reference/dgppo/env/mpe/mpe_corridor.py:12-100.
obs_radius = (area - corridor_width)/4 (mpe_corridor.py:37); agents sampled in
a thin bottom strip (side_length_y arg), goals shifted above the corridor
(mpe_corridor.py:41-50); agent<-obs edges always connected (mask radius x100,
mpe_corridor.py:95); asymmetric state_lim with y up to 2x area
(mpe_corridor.py:65-68).
"""
from typing import Optional, Tuple

import jax.numpy as jnp

from ...graph import BlockGraph
from ...utils.typing import Array, State
from ..utils import get_node_goal_rng
from .base import MPEEnvState
from .mpe_spread import MPESpread


class MPECorridor(MPESpread):
    PARAMS = {
        "car_radius": 0.05,
        "comm_radius": 0.5,
        "default_area_size": 1.0,
        "dist2goal": 0.01,
        "n_obs": 2,
        "corridor_width": 0.2,
    }

    def __init__(self, num_agents, area_size=None, max_step=128, dt=0.03, params=None):
        area_size = MPECorridor.PARAMS["default_area_size"] if area_size is None else area_size
        # Skip MPESpread.__init__ specifics; base MPE ctor (reference calls
        # super(MPESpread, self).__init__, mpe_corridor.py:32).
        super(MPESpread, self).__init__(num_agents, area_size, max_step, dt, params)
        self.num_goals = self._num_agents
        if self.params["n_obs"] != 2:
            self.params["n_obs"] = 2
            print("WARNING: n_obs is set to 2 for MPECorridor.")
        self.params["obs_radius"] = (self.area_size - self.params["corridor_width"]) / 4

    def reset(self, key: Array) -> BlockGraph:
        strip = (self.area_size - self.params["obs_radius"] * 2) / 2 - 1.5 * self.params["car_radius"]
        states, goals = get_node_goal_rng(
            key, self.area_size, 2, self.num_agents, 2 * self.params["car_radius"], None, strip
        )
        goals = goals + jnp.array(
            [0.0, self.area_size - (self.area_size - self.params["obs_radius"] * 2) / 2 + 1.5 * self.params["car_radius"]]
        )

        obs = jnp.array(
            [
                [self.params["obs_radius"], self.area_size / 2],
                [self.area_size - self.params["obs_radius"], self.area_size / 2],
            ]
        )

        states = jnp.concatenate([states, jnp.zeros_like(states)], axis=1)
        goals = jnp.concatenate([goals, jnp.zeros_like(goals)], axis=1)
        obs = jnp.concatenate([obs, jnp.zeros_like(obs)], axis=1)
        return self.get_graph(MPEEnvState(states, goals, obs))

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
        # Always-connected obstacle edges (mask radius x100).
        agent_pos = state.agent[:, :2]
        obs_pos = state.obs[:, :2]
        dist = jnp.linalg.norm(agent_pos[:, None] - obs_pos[None, :], axis=-1)
        ao_mask = dist < self._params["comm_radius"] * 100
        ao_feats = state.agent[:, None, :] - state.obs[None, :, :]
        return (aa_feats, ag_feats, ao_feats), (aa_mask, ag_mask, ao_mask)
