"""LidarOmniTarget — omnidirectional (mecanum-wheel) agents with
field-of-view chain constraints (the fork's flagship environment).

Behavioral parity reference:
/root/reference/dgppo/env/lidar_env/lidar_omni_target.py:30-650.
 - State (x, y, cos psi, sin psi, vx, vy, omega), dim 7; action
   (ax, ay, alpha), dim 3, alpha limit ±1000 (lidar_omni_target.py:510-520).
 - Omni Euler step: acc x10, angular acc x5 (lidar_omni_target.py:146-197).
 - n_cost = 5: agent-coll, obs-coll, and three FoV chain constraints for
   pairs i -> i+1 in agent i's local frame: angle `cos(beta)*||p|| - x_local`,
   max-range `||p|| - r_max`, min-dist `D - ||p||`
   (lidar_omni_target.py:522-649, margin 0.1, clip [-1, 1]; agent N-1 gets
   the safe value -1).
 - edge_dim = 10: 7 relative-state dims + is-critical-edge flag + local-frame
   distance + local forward component (lidar_omni_target.py:341-423).
 - Reset orients each agent toward its successor; last agent random heading
   (lidar_omni_target.py:248-272).
 - Reward adds rotation/angular-velocity penalties (lidar_omni_target.py:295-333).
"""
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

from ...graph import BlockGraph
from ...utils.tree import jax_vmap
from ...utils.typing import Action, AgentState, Array, Cost, Pos, Reward, State
from ..utils import get_node_goal_rng, nearest_other_dist
from .base import LidarEnv, LidarEnvState


def rotation_matrix_transpose(cos_psi, sin_psi) -> Array:
    """R^T for R = [[cos, -sin], [sin, cos]]."""
    return jnp.array([[cos_psi, sin_psi], [-sin_psi, cos_psi]])


batch_rotation_matrix_transpose = jax.vmap(rotation_matrix_transpose)


class LidarOmniTarget(LidarEnv):
    PARAMS = {
        "car_radius": 0.05,
        "comm_radius": 0.5,
        "n_rays": 32,
        "obs_len_range": [0.1, 0.3],
        "n_obs": 3,
        "default_area_size": 1.5,
        "dist2goal": 0.01,
        "top_k_rays": 8,
        "max_angular_vel": 100.0,
        "rotation_penalty": 0.001,
        # FoV cone parameters
        "fov_angle_deg": 60.0,
        "max_sensor_range": 0.5,
        "min_safe_distance": 0.2,
    }

    def __init__(self, num_agents, area_size=None, max_step=128, dt=0.03, params=None):
        # area_size=None resolves via type(self).PARAMS in the base __init__.
        super().__init__(num_agents, area_size, max_step, dt, params)

        self._fov_beta_rad = jnp.deg2rad(self.params["fov_angle_deg"])
        self._cos_fov_beta = jnp.cos(self._fov_beta_rad)
        self._r_max = self.params["max_sensor_range"]
        self._min_safe_dist_D = self.params["min_safe_distance"]
        assert self._min_safe_dist_D > 2 * self.params["car_radius"], "need D > 2r"
        assert self._min_safe_dist_D < self._r_max, "need D < r_max"

    @property
    def n_cost(self) -> int:
        return 5

    @property
    def cost_components(self) -> Tuple[str, ...]:
        return "agent collisions", "obs collisions", "fov angle", "fov max range", "fov min distance"

    @property
    def state_dim(self) -> int:
        return 7  # x, y, cos psi, sin psi, vx, vy, omega

    @property
    def node_dim(self) -> int:
        return 10  # state(7) + indicator(3)

    @property
    def edge_dim(self) -> int:
        return 10  # rel state (7) + is_critical + local distance + local forward

    @property
    def action_dim(self) -> int:
        return 3  # ax, ay, alpha

    # ---- dynamics -------------------------------------------------------------
    def agent_step_euler(self, agent_states: AgentState, action: Action) -> AgentState:
        assert action.shape == (self.num_agents, self.action_dim)
        pos = agent_states[:, :2]
        orientation = agent_states[:, 2:4]
        vel = agent_states[:, 4:6]
        omega = agent_states[:, 6:7]

        acc = action[:, :2] * 10.0
        alpha = action[:, 2:3] * 5.0

        theta = jnp.arctan2(orientation[:, 1], orientation[:, 0])
        new_theta = theta + (omega * self.dt)[:, 0]
        new_orientation = jnp.stack([jnp.cos(new_theta), jnp.sin(new_theta)], axis=1)

        new_pos = pos + vel * self.dt
        new_vel = vel + acc * self.dt
        new_omega = omega + alpha * self.dt
        new_state = jnp.concatenate([new_pos, new_orientation, new_vel, new_omega], axis=1)
        return self.clip_state(new_state)

    # ---- reset -----------------------------------------------------------------
    def reset(self, key: Array) -> BlockGraph:
        obstacles, key = self.sample_obstacles(key)

        node_goal_key, key = jr.split(key, 2)
        min_distance = jnp.maximum(2.2 * self.params["car_radius"], self._min_safe_dist_D)
        agent_pos, goal_pos = get_node_goal_rng(
            node_goal_key, self.area_size, 2, self.num_agents, min_distance, obstacles
        )

        # Chain topology: agent i faces agent i+1; last agent random heading.
        theta_states = jnp.zeros((self.num_agents, 2))
        if self.num_agents > 1:
            delta_p = agent_pos[1:] - agent_pos[:-1]  # row i: p_{i+1} - p_i
            norm = jnp.linalg.norm(delta_p, axis=-1, keepdims=True) + 1e-8
            theta_states = theta_states.at[:-1].set(delta_p / norm)
            theta_key, key = jr.split(key, 2)
            last_theta = jr.uniform(theta_key, (1,), minval=0, maxval=2 * np.pi)[0]
            theta_states = theta_states.at[self.num_agents - 1].set(
                jnp.array([jnp.cos(last_theta), jnp.sin(last_theta)])
            )
        elif self.num_agents == 1:
            theta_key, key = jr.split(key, 2)
            theta = jr.uniform(theta_key, (1,), minval=0, maxval=2 * np.pi)[0]
            theta_states = theta_states.at[0].set(jnp.array([jnp.cos(theta), jnp.sin(theta)]))

        states = jnp.concatenate([agent_pos, theta_states, jnp.zeros((self.num_agents, 3))], axis=1)
        goals = jnp.concatenate([goal_pos, jnp.zeros((self.num_goals, self.state_dim - 2))], axis=1)
        env_states = LidarEnvState(states, goals, obstacles)
        lidar_data = self.get_lidar_data(states, obstacles)
        return self.get_graph(env_states, lidar_data)

    # ---- reward ----------------------------------------------------------------
    def get_reward(self, graph: BlockGraph, action: Action) -> Reward:
        agent_states = graph.type_states(LidarEnv.AGENT)
        goals = graph.type_states(LidarEnv.GOAL)
        reward = jnp.zeros((), dtype=jnp.float32)

        dist2goal = jnp.linalg.norm(goals[:, :2] - agent_states[:, :2], axis=-1)
        reward -= dist2goal.mean() * 0.01
        reward -= jnp.where(dist2goal > self._params["dist2goal"], 1.0, 0.0).mean() * 0.001
        reward -= (jnp.linalg.norm(action[:, :2], axis=1) ** 2).mean() * 0.0001
        reward -= (jnp.abs(action[:, 2]) ** 2).mean() * self._params["rotation_penalty"]
        omega = agent_states[:, 6]
        reward -= (jnp.abs(omega) ** 2).mean() * self._params["rotation_penalty"] * 0.5
        return reward

    # ---- edges ------------------------------------------------------------------
    def edge_blocks(
        self, state: LidarEnvState, flat_hits: Optional[Pos]
    ) -> Tuple[Tuple[Array, ...], Tuple[Array, ...]]:
        agent_states = state.agent
        agent_pos = agent_states[:, :2]
        agent_ori = agent_states[:, 2:4]
        N = self.num_agents

        # Agent <- agent: rel state (7) + critical flag + local-frame feats.
        # Shared relative-feature/comm-mask block (base.py _agent_agent_block);
        # omni reads the first 7 relative columns and adds its local-frame ones.
        aa_rel_feats, aa_mask = self._agent_agent_block(state)
        edge_feats_rel = aa_rel_feats[:, :, :7]
        pos_diff = agent_pos[:, None, :] - agent_pos[None, :, :]  # [i,j] = p_i - p_j

        # Local frame of the first index i (the receiver): p_j^i = R_i^T (p_j - p_i).
        global_pos_diff = -pos_diff  # [i,j] = p_j - p_i
        R_i_T = batch_rotation_matrix_transpose(agent_ori[:, 0], agent_ori[:, 1])  # (N,2,2)
        p_j_i = jnp.einsum("iab,ijb->ija", R_i_T, global_pos_diff)  # (N,N,2)
        i_x_j = p_j_i[:, :, 0:1]
        norm_p_j_i = jnp.linalg.norm(p_j_i, axis=-1, keepdims=True)

        is_critical = jnp.zeros((N, N, 1))
        if N > 1:
            idx_i = jnp.arange(N - 1)
            is_critical = is_critical.at[idx_i, idx_i + 1, 0].set(1.0)

        aa_feats = jnp.concatenate([edge_feats_rel, is_critical, norm_p_j_i, i_x_j], axis=-1)
        assert aa_feats.shape[-1] == self.edge_dim

        # Agent <- its own goal: rel state (7) + 3 zero pads; identity mask.
        feats = jax_vmap(self.state2feat)(agent_states)
        feats_g = jax_vmap(self.state2feat)(state.goal)
        ag_rel = (feats[:, None, :] - feats_g[None, :, :])[:, :, :7]
        ag_feats = jnp.concatenate(
            [ag_rel, jnp.zeros((N, self.num_goals, self.edge_dim - 7))], axis=-1
        )
        ag_mask = jnp.eye(N, dtype=bool)

        if flat_hits is None:
            return (aa_feats, ag_feats), (aa_mask, ag_mask)

        # Agent <- its own top_k hits (note: mask radius is comm_radius here,
        # without the -0.1 used by the other lidar envs;
        # lidar_omni_target.py:486).
        hits = flat_hits.reshape(N, self.top_k, 2)
        rel = agent_pos[:, None, :] - hits
        hit_dist = jnp.linalg.norm(rel, axis=-1)
        ah_mask = hit_dist < self._params["comm_radius"]
        ah_feats = jnp.concatenate(
            [rel, jnp.zeros((N, self.top_k, self.edge_dim - 2))], axis=-1
        )
        return (aa_feats, ag_feats, ah_feats), (aa_mask, ag_mask, ah_mask)

    # ---- limits -----------------------------------------------------------------
    def state_lim(self, state: Optional[State] = None) -> Tuple[State, State]:
        w = self._params["max_angular_vel"]
        lower = jnp.array([0.0, 0.0, -1.0, -1.0, -2.0, -2.0, -w])
        upper = jnp.array([self.area_size, self.area_size, 1.0, 1.0, 2.0, 2.0, w])
        return lower, upper

    def action_lim(self) -> Tuple[Action, Action]:
        lower = jnp.array([-1.0, -1.0, -1000.0])
        upper = jnp.array([1.0, 1.0, 1000.0])
        return lower, upper

    # ---- costs ------------------------------------------------------------------
    def get_cost(self, graph: BlockGraph) -> Cost:
        agent_states = graph.type_states(LidarEnv.AGENT)
        agent_pos = agent_states[:, :2]
        N = self.num_agents

        agent_coll_cost = self.params["car_radius"] * 2 - nearest_other_dist(agent_pos)

        if self.n_obs == 0 or self.top_k == 0:
            obs_coll_cost = jnp.zeros((N,), dtype=jnp.float32)
        else:
            hits = graph.type_states(LidarEnv.OBS)[:, :2]
            dist_obs = jnp.linalg.norm(hits[None, :, :] - agent_pos[:, None, :], axis=-1)
            # Reference quirk preserved: omni's get_cost derives the obstacle
            # node count from the PADDED node total (reference
            # lidar_omni_target.py:566: nodes - N - num_goals = top_k*N + 1),
            # so its type_states gather (utils/graph.py:136-140, a scatter
            # into a zeros buffer) leaves one phantom all-zeros point at the
            # origin that participates in the min-distance. An agent within
            # car_radius of (0, 0) is therefore flagged unsafe by the
            # reference even with no real obstacle nearby; reproduce exactly.
            phantom_dist = jnp.linalg.norm(agent_pos, axis=-1)[:, None]
            dist_obs = jnp.concatenate([dist_obs, phantom_dist], axis=1)
            obs_coll_cost = self.params["car_radius"] - dist_obs.min(axis=1)

        safe_value = -1.0
        fov_angle_cost = jnp.full((N,), safe_value)
        fov_range_cost = jnp.full((N,), safe_value)
        fov_coll_cost = jnp.full((N,), safe_value)

        if N > 1:
            states_i = agent_states[:-1]
            states_j = agent_states[1:]
            pos_i, ori_i, pos_j = states_i[:, :2], states_i[:, 2:4], states_j[:, :2]

            delta_p_global = pos_j - pos_i
            R_i_T = batch_rotation_matrix_transpose(ori_i[:, 0], ori_i[:, 1])
            p_j_i = jnp.squeeze(R_i_T @ delta_p_global[:, :, None], axis=-1)

            i_x_j = p_j_i[:, 0]
            norm_p_j_i = jnp.linalg.norm(p_j_i, axis=-1)
            norm_safe = norm_p_j_i + 1e-8

            h_angle = self._cos_fov_beta * norm_safe - i_x_j
            h_range = norm_p_j_i - self._r_max
            h_coll_fov = self._min_safe_dist_D - norm_p_j_i

            fov_angle_cost = fov_angle_cost.at[:-1].set(h_angle)
            fov_range_cost = fov_range_cost.at[:-1].set(h_range)
            fov_coll_cost = fov_coll_cost.at[:-1].set(h_coll_fov)

        cost = jnp.stack(
            [agent_coll_cost, obs_coll_cost, fov_angle_cost, fov_range_cost, fov_coll_cost], axis=1
        )
        eps = 0.1
        cost = jnp.where(cost <= 0.0, cost - eps, cost + eps)
        return jnp.clip(cost, -1.0, 1.0)
