"""VMASWheel: 3 agents push a rotating line (mass 15) to a goal angle while
keeping it out of a forbidden angular sector.

Behavioral parity reference: /root/reference/dgppo/env/vmas/vmas_wheel.py:35-453.
 - frame_skip=3, substeps=1, default collision force, world semidim 1.2
   (vmas_wheel.py:64,132)
 - agents drag 0.25, line drag 0.015, line max angvel 0.6, u_multiplier 0.6
   (vmas_wheel.py:140-164)
 - contact forces from the physics info feed into node features
   (vmas_wheel.py:190-201,277-284)
 - reward on wrapped angle distance to goal (vmas_wheel.py:218-233)
 - cost: agent-agent + line-in-sector, margin 0.5, one-sided clip(min=-1)
   (vmas_wheel.py:235-260)
 - avoid angle rejection-sampled from 8 candidates (vmas_wheel.py:435-452)
"""
from typing import NamedTuple, Optional, Tuple

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from ...graph import BlockGraph, BlockSpec, GraphSpec, TypeSpec, build_graph
from ...utils.typing import Action, Array, Cost, PRNGKey, State
from ..base import MultiAgentEnv, StepResult
from ..utils import get_node_goal_rng
from .physics import EntitySpec, EntityState, Line, Sphere, World


def angle_dist(a, b):
    """Shortest signed distance between two angles, in [-pi, pi]."""
    return jnp.arctan2(jnp.sin(a - b), jnp.cos(a - b))


def sample_valid_avoid_angle(key: PRNGKey, line_angle, goal_angle, min_dist, goal_maxdist):
    """Pick, among 8 random angles, the valid one closest to the goal
    (parity: vmas_wheel.py:435-452)."""
    n = 8
    b_angles = jax.random.uniform(key, shape=(n,), minval=-np.pi, maxval=np.pi)
    b_disttogoal = jnp.abs(angle_dist(b_angles, goal_angle))
    b_disttoline = jnp.abs(angle_dist(b_angles, line_angle))
    b_valid = (b_disttogoal > min_dist) & (b_disttoline > min_dist) & (b_disttogoal < goal_maxdist)
    b_masked = jnp.where(b_valid, b_disttogoal, jnp.inf)
    return b_angles[jnp.argsort(b_masked)[0]]


class VMASWheelState(NamedTuple):
    line_angle: Array
    line_angvel: Array
    a_pos: Array
    a_vel: Array
    a_contact_force: Array
    goal_angle: Array
    avoid_angle: Array


class VMASWheel(MultiAgentEnv):
    AGENT = 0

    PARAMS = {
        "comm_radius": 0.4,
        "default_area_size": 0.8,
        "dist2goal": 0.01,
        "agent_radius": 0.03,
    }

    def __init__(self, num_agents, area_size=None, max_step=64, dt=0.1, params=None):
        half_width = 1.2
        assert num_agents == 3, "VMASWheel only supports 3 agents."
        area_size = 2 * half_width
        self.half_width = half_width
        self.agent_radius = 0.03
        super().__init__(3, area_size, max_step, dt, params)

        self.line_length = 2.0
        self.obs_halfwidth_rad = np.deg2rad(15)
        self.obs_init_pad_rad = np.deg2rad(1)
        self.frame_skip = 3

        # Physics dt is the physax default 0.1 regardless of env dt
        # (reference vmas_wheel.py:132 + env/__init__.py:53 quirk).
        self._world = World(dt=0.1, x_semidim=1.2, y_semidim=1.2)
        line_spec = EntitySpec(
            name="line",
            shape=Line(length=self.line_length),
            movable=False,
            rotatable=True,
            collide=True,
            mass=15.0,
            drag=0.015,
            max_angvel=0.6,
        )
        agent_specs = tuple(
            EntitySpec(
                name=f"agent_{ii}",
                shape=Sphere(self.agent_radius),
                movable=True,
                rotatable=True,
                collide=True,
                is_agent=True,
                u_multiplier=0.6,
                drag=0.25,
                collides_with=("line",),
            )
            for ii in range(3)
        )
        self._specs = (line_spec,) + agent_specs

    @property
    def state_dim(self) -> int:
        return 4

    @property
    def node_dim(self) -> int:
        # [pos(2), vel(2), line sincos(2), line angvel(1), contact force(2),
        #  goal sincos(2), obs sincos(2)]
        return 13

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
        # The reference names only the first of its n_cost=2 components
        # (vmas_wheel.py:85-87), which truncates any zip over per-constraint
        # values; both are named here so rendered cost text shows both.
        return ("agent collisions", "line in avoid sector")

    @property
    def graph_spec(self) -> GraphSpec:
        n = self.num_agents
        return GraphSpec(
            n_nodes=n,
            node_dim=self.node_dim,
            state_dim=0,
            edge_dim=self.edge_dim,
            types=(TypeSpec(VMASWheel.AGENT, 0, n),),
            blocks=(BlockSpec("aa", 0, n, 0, n),),
        )

    # ---- reset -----------------------------------------------------------------
    def reset(self, key: Array) -> BlockGraph:
        line_rot_key, line_angvel_key, agent_key, a_vel_key, a_goal_key, a_avoid_key = jax.random.split(key, 6)

        line_angle = jax.random.uniform(line_rot_key, minval=-np.pi, maxval=np.pi)
        line_angvel = jax.random.uniform(line_angvel_key, minval=-0.05, maxval=0.05)

        agent_pos, _ = get_node_goal_rng(
            agent_key, 0.99 * self.area_size, 2, self.num_agents, 2 * self.params["agent_radius"], None
        )
        agent_pos = agent_pos - self.half_width

        a_vel = jax.random.uniform(a_vel_key, shape=(self.num_agents, 2), minval=-0.01, maxval=0.01)
        a_contactforce = jnp.zeros((self.num_agents, 2))

        goal_angle = jax.random.uniform(a_goal_key, minval=-np.pi, maxval=np.pi)
        avoid_angle = sample_valid_avoid_angle(
            a_avoid_key, line_angle, goal_angle,
            self.obs_halfwidth_rad + self.obs_init_pad_rad, goal_maxdist=np.pi / 2,
        )
        return self.get_graph(
            VMASWheelState(line_angle, line_angvel, agent_pos, a_vel, a_contactforce, goal_angle, avoid_angle)
        )

    # ---- step -------------------------------------------------------------------
    def step(self, graph: BlockGraph, action: Action, get_eval_info: bool = False) -> StepResult:
        action = self.clip_action(action)
        env_state: VMASWheelState = graph.env_states

        line_st = EntityState.zero()._replace(
            rot=env_state.line_angle[None], ang_vel=env_state.line_angvel[None]
        )
        agent_sts = tuple(
            EntityState.zero()._replace(
                pos=env_state.a_pos[ii],
                vel=env_state.a_vel[ii],
                force=action[ii] * self._specs[1 + ii].u_multiplier,
            )
            for ii in range(self.num_agents)
        )
        states = (line_st,) + agent_sts

        def body(sts, _):
            sts, _ = self._world.step(self._specs, sts)
            return sts, None

        if self.frame_skip > 1:
            states, _ = lax.scan(body, states, length=self.frame_skip - 1)
        states, info = self._world.step(self._specs, states)

        line_st = states[0]
        a_pos = jnp.stack([st.pos for st in states[1:]], axis=0)
        a_vel = jnp.stack([st.vel for st in states[1:]], axis=0)
        a_contact = jnp.stack(
            [info["contact_forces"][spec.name] for spec in self._specs[1:]], axis=0
        )

        env_state_new = env_state._replace(
            line_angle=line_st.rot.squeeze(-1),
            line_angvel=line_st.ang_vel.squeeze(-1),
            a_pos=a_pos,
            a_vel=a_vel,
            a_contact_force=a_contact,
        )
        done = jnp.array(False)
        reward = self.get_reward(graph, action)
        cost = self.get_cost(graph)
        return StepResult(self.get_graph(env_state_new), reward, cost, done, {})

    # ---- reward / cost -------------------------------------------------------------
    def get_reward(self, graph: BlockGraph, action: Action):
        env_state: VMASWheelState = graph.env_states
        ang_diff = angle_dist(env_state.line_angle, env_state.goal_angle)
        ang_diff_sq = (0.1 * ang_diff / jnp.pi) ** 2
        reward = -ang_diff_sq * 0.5
        reward = reward - jnp.where(ang_diff > np.deg2rad(1.0), 1.0, 0.0).mean() * 0.005
        return reward

    def get_cost(self, graph: BlockGraph) -> Cost:
        env_state: VMASWheelState = graph.env_states
        agent_pos = env_state.a_pos

        dist = jnp.linalg.norm(agent_pos[:, None] - agent_pos[None, :], axis=-1)
        dist += jnp.eye(self.num_agents) * 1e6
        min_dist = jnp.min(dist, axis=1)
        cost_agent = self.params["agent_radius"] * 2 - min_dist

        line_dist = angle_dist(env_state.line_angle, env_state.avoid_angle)
        cost_line = (self.obs_halfwidth_rad - jnp.abs(line_dist)) / np.pi
        a_cost_line = jnp.broadcast_to(cost_line, (self.num_agents,))

        cost = jnp.stack([cost_agent, a_cost_line], axis=-1)
        eps = 0.5
        cost = jnp.where(cost <= 0.0, cost - eps, cost + eps)
        # One-sided clip (vmas_wheel.py:257) — a documented reference quirk.
        return jnp.clip(cost, min=-1.0)

    # ---- graph -----------------------------------------------------------------------
    def get_graph(self, env_state: VMASWheelState) -> BlockGraph:
        state = env_state
        sincos = jnp.array([jnp.sin(state.line_angle), jnp.cos(state.line_angle)])
        ang_goal = angle_dist(state.line_angle, state.goal_angle)
        sincos_goal = jnp.array([jnp.sin(ang_goal), jnp.cos(ang_goal)])
        ang_obs = angle_dist(state.line_angle, state.avoid_angle)
        sincos_obs = jnp.array([jnp.sin(ang_obs), jnp.cos(ang_obs)])

        node_feats = jnp.zeros((self.num_agents, self.node_dim))
        node_feats = node_feats.at[:, :2].set(state.a_pos)
        node_feats = node_feats.at[:, 2:4].set(state.a_vel)
        node_feats = node_feats.at[:, 4:6].set(sincos)
        node_feats = node_feats.at[:, 6].set(state.line_angvel)
        node_feats = node_feats.at[:, 7:9].set(state.a_contact_force)
        node_feats = node_feats.at[:, 9:11].set(sincos_goal)
        node_feats = node_feats.at[:, 11:13].set(sincos_obs)

        edges, masks = self.edge_blocks(env_state)
        states_vec = jnp.zeros((self.num_agents, 0))
        return build_graph(self.graph_spec, node_feats, states_vec, edges, masks, env_state)

    def edge_blocks(self, env_state: VMASWheelState):
        agent_states = jnp.concatenate([env_state.a_pos, env_state.a_vel], axis=-1)
        state_diff = agent_states[:, None, :] - agent_states[None, :, :]
        mask = jnp.eye(self.num_agents) == 0
        return (state_diff,), (mask,)

    def state_lim(self, state: Optional[State] = None):
        return -jnp.inf * jnp.ones(self.state_dim), jnp.inf * jnp.ones(self.state_dim)

    def action_lim(self) -> Tuple[Action, Action]:
        return -jnp.ones(2), jnp.ones(2)

    def render_video(self, rollout, video_path, Ta_is_unsafe=None, viz_opts=None, dpi=200, **kwargs):
        from .render import render_wheel

        return render_wheel(self, rollout, video_path, dpi=dpi)
