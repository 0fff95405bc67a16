"""VMASReverseTransport: 3 agents inside a hollow box (mass 10) push it to a
goal while the box center avoids 3 circular obstacles.

Behavioral parity reference:
/root/reference/dgppo/env/vmas/vmas_reverse_transport.py:32-320.
 - frame_skip=4, substeps=5, collision_force=500, contact_margin=6e-3,
   world semidim 1.2 (vmas_reverse_transport.py:64,139)
 - node_dim=20 flat observation: pos, vel, box pos/vel, rel goal, contact
   flag, sorted rel obstacle unit vectors + distances
   (vmas_reverse_transport.py:265-296)
 - full-observation graph: all-pairs agent edges only
   (vmas_reverse_transport.py:298-312)
 - costs (2): 4x agent-agent, 2x box-obstacle, margin 0.5, clip [-1, 1]
   (vmas_reverse_transport.py:224-250)
 - world + entities constructed inside step (static shapes; entity specs are
   compile-time constants) (vmas_reverse_transport.py:131-207)
"""
from typing import NamedTuple, Optional, Tuple

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from ...graph import BlockGraph, BlockSpec, GraphSpec, TypeSpec, build_graph
from ...utils.typing import Action, Array, Cost, State
from ..base import MultiAgentEnv, StepResult
from ..utils import get_node_goal_rng
from .physics import Box, EntitySpec, EntityState, Sphere, World


class VMASReverseTransportState(NamedTuple):
    box_pos: Array
    box_vel: Array
    a_pos: Array
    a_vel: Array
    goal_pos: Array
    o_pos: Array


class VMASReverseTransport(MultiAgentEnv):
    AGENT = 0

    PARAMS = {
        "comm_radius": 0.4,
        "default_area_size": 0.8,
        "dist2goal": 0.01,
        "agent_radius": 0.03,
    }

    def __init__(self, num_agents, area_size=None, max_step=64, dt=0.1, params=None):
        half_width = 0.8
        assert num_agents == 3, "VMASReverseTransport only supports 3 agents."
        area_size = 2 * half_width
        self.half_width = half_width
        self.agent_radius = 0.03
        super().__init__(3, area_size, max_step, dt, params)

        self.package_width = 0.6
        self.package_length = 0.6
        self.package_mass = 10.0
        self.obs_radius = 0.15
        self.n_obs = 3
        self.frame_skip = 4

        # NOTE: the physics dt is the physax default 0.1 regardless of the
        # env dt (reference constructs World() without dt,
        # vmas_reverse_transport.py:139, while make_env passes dt=0.03 to the
        # env, env/__init__.py:53 — a documented reference quirk).
        self._world = World(
            dt=0.1, substeps=5, x_semidim=1.2, y_semidim=1.2, contact_margin=6e-3, collision_force=500
        )
        box_spec = EntitySpec(
            name="box",
            shape=Box(length=self.package_length, width=self.package_width, hollow=True),
            movable=True,
            rotatable=False,
            collide=True,
            mass=self.package_mass,
        )
        agent_specs = tuple(
            EntitySpec(
                name=f"agent_{ii}",
                shape=Sphere(self.agent_radius),
                movable=True,
                rotatable=True,
                collide=True,
                is_agent=True,
                u_multiplier=0.5,
                collides_with=("box",),
            )
            for ii in range(3)
        )
        self._specs = (box_spec,) + agent_specs

    @property
    def state_dim(self) -> int:
        return 4

    @property
    def node_dim(self) -> int:
        # [pos(2), vel(2), box_pos(2), box_vel(2), rel_goal(2), in_contact(1),
        #  sorted rel obstacle unit vecs(6), rel obstacle dists(3)]
        return 20

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
        return "agent collisions", "obstacle collisions"

    @property
    def graph_spec(self) -> GraphSpec:
        n = self.num_agents
        return GraphSpec(
            n_nodes=n,
            node_dim=self.node_dim,
            state_dim=0,
            edge_dim=self.edge_dim,
            types=(TypeSpec(VMASReverseTransport.AGENT, 0, n),),
            blocks=(BlockSpec("aa", 0, n, 0, n),),
        )

    # ---- reset ---------------------------------------------------------------
    def reset(self, key: Array) -> BlockGraph:
        box_key, agent_key, a_vel_key, goal_key, obs_key = jax.random.split(key, 5)

        box_cen_halfwidth = self.half_width - 0.5 * self.package_length
        x0_radius = 0.98 * box_cen_halfwidth
        x0_angle = jax.random.uniform(box_key, minval=0.0, maxval=2 * np.pi)
        box_pos = x0_radius * jnp.array([jnp.cos(x0_angle), jnp.sin(x0_angle)])

        noise_ub = np.deg2rad(30)
        goal_angle = x0_angle + np.pi + jax.random.uniform(goal_key, minval=-noise_ub, maxval=noise_ub)
        goal_pos = x0_radius * jnp.array([jnp.cos(goal_angle), jnp.sin(goal_angle)])

        obs_radius = x0_radius - 1.5 * self.obs_radius
        assert obs_radius > 0
        o_angle = jax.random.uniform(obs_key, shape=(self.n_obs,), minval=0.0, maxval=2 * np.pi)
        o_pos = obs_radius * jnp.stack([jnp.cos(o_angle), jnp.sin(o_angle)], axis=-1)

        agent_pos, _ = get_node_goal_rng(
            agent_key, 0.4 * self.package_length, 2, self.num_agents, 2 * self.params["agent_radius"], None
        )
        agent_pos = agent_pos - 0.2 + box_pos

        box_vel = jnp.zeros(2)
        a_vel = jax.random.uniform(a_vel_key, shape=(self.num_agents, 2), minval=-0.01, maxval=0.01)

        return self.get_graph(
            VMASReverseTransportState(box_pos, box_vel, agent_pos, a_vel, goal_pos, o_pos)
        )

    # ---- step -------------------------------------------------------------------
    def _physics_states(self, env_state: VMASReverseTransportState, action: Array):
        box_st = EntityState.zero()._replace(pos=env_state.box_pos, vel=env_state.box_vel)
        agent_sts = tuple(
            EntityState.zero()._replace(
                pos=env_state.a_pos[ii],
                vel=env_state.a_vel[ii],
                force=action[ii] * self._specs[1 + ii].u_multiplier,
            )
            for ii in range(self.num_agents)
        )
        return (box_st,) + agent_sts

    def step(self, graph: BlockGraph, action: Action, get_eval_info: bool = False) -> StepResult:
        action = self.clip_action(action)
        env_state: VMASReverseTransportState = graph.env_states

        states = self._physics_states(env_state, action)

        def body(sts, _):
            sts, _ = self._world.step(self._specs, sts)
            return sts, None

        if self.frame_skip > 1:
            states, _ = lax.scan(body, states, length=self.frame_skip - 1)
        states, info = self._world.step(self._specs, states)

        box_st = states[0]
        a_pos = jnp.stack([st.pos for st in states[1:]], axis=0)
        a_vel = jnp.stack([st.vel for st in states[1:]], axis=0)

        env_state_new = env_state._replace(
            box_pos=box_st.pos, box_vel=box_st.vel, a_pos=a_pos, a_vel=a_vel
        )
        done = jnp.array(False)
        reward = self.get_reward(graph, action)
        cost = self.get_cost(graph)
        return StepResult(self.get_graph(env_state_new), reward, cost, done, {})

    # ---- reward / cost --------------------------------------------------------------
    def get_reward(self, graph: BlockGraph, action: Action):
        env_state: VMASReverseTransportState = graph.env_states
        dist2goal = jnp.linalg.norm(env_state.goal_pos - env_state.box_pos, axis=-1)
        reward = -dist2goal.mean() * 0.01
        reward -= jnp.where(dist2goal > self._params["dist2goal"], 1.0, 0.0).mean() * 0.001
        return reward

    def get_cost(self, graph: BlockGraph) -> Cost:
        env_state: VMASReverseTransportState = graph.env_states
        agent_pos = env_state.a_pos

        dist = jnp.linalg.norm(agent_pos[:, None] - agent_pos[None, :], axis=-1)
        dist += jnp.eye(self.num_agents) * 1e6
        min_dist = jnp.min(dist, axis=1)
        a_cost_agent = self.params["agent_radius"] * 2 - min_dist

        o_dist = jnp.linalg.norm(env_state.box_pos - env_state.o_pos, axis=-1)
        cost_box = self.obs_radius - jnp.min(o_dist)
        a_cost_box = jnp.broadcast_to(cost_box, (self.num_agents,))

        cost = jnp.stack([4 * a_cost_agent, 2 * a_cost_box], axis=1)
        eps = 0.5
        cost = jnp.where(cost <= 0.0, cost - eps, cost + eps)
        return jnp.clip(cost, -1.0, 1.0)

    # ---- graph -------------------------------------------------------------------------
    def get_a_incontact(self, a_pos: Array, box_pos: Array) -> Array:
        a_rel = a_pos - box_pos
        eps = 1e-2
        length = self.package_width - eps
        return jnp.any(jnp.abs(a_rel) > length, axis=1)

    def get_graph(self, env_state: VMASReverseTransportState) -> BlockGraph:
        state = env_state
        rel_goal_pos = state.goal_pos - state.box_pos
        a_incontact = self.get_a_incontact(state.a_pos, state.box_pos)

        o_rel = state.o_pos - state.box_pos
        o_dist = jnp.sqrt(jnp.sum(o_rel**2, axis=-1) + 1e-6)
        o_rel_vec = o_rel / o_dist[:, None]
        idx_sort = jnp.argsort(o_dist)
        o_rel_vec = o_rel_vec[idx_sort]
        o_dist = o_dist[idx_sort]

        node_feats = jnp.zeros((self.num_agents, self.node_dim))
        node_feats = node_feats.at[:, :2].set(state.a_pos)
        node_feats = node_feats.at[:, 2:4].set(state.a_vel)
        node_feats = node_feats.at[:, 4:6].set(state.box_pos)
        node_feats = node_feats.at[:, 6:8].set(state.box_vel)
        node_feats = node_feats.at[:, 8:10].set(rel_goal_pos)
        node_feats = node_feats.at[:, 10].set(a_incontact)
        node_feats = node_feats.at[:, 11:17].set(o_rel_vec.flatten())
        node_feats = node_feats.at[:, 17:20].set(o_dist)

        edges, masks = self.edge_blocks(env_state)
        states_vec = jnp.zeros((self.num_agents, 0))
        return build_graph(self.graph_spec, node_feats, states_vec, edges, masks, env_state)

    def edge_blocks(self, env_state: VMASReverseTransportState):
        agent_states = jnp.concatenate([env_state.a_pos, env_state.a_vel], axis=-1)
        state_diff = agent_states[:, None, :] - agent_states[None, :, :]
        mask = jnp.eye(self.num_agents) == 0
        return (state_diff,), (mask,)

    def state_lim(self, state: Optional[State] = None):
        return -jnp.inf * jnp.ones(self.state_dim), jnp.inf * jnp.ones(self.state_dim)

    def action_lim(self) -> Tuple[Action, Action]:
        return -jnp.ones(2), jnp.ones(2)

    def render_video(self, rollout, video_path, Ta_is_unsafe=None, viz_opts=None, dpi=200, **kwargs):
        from .render import render_reverse_transport

        return render_reverse_transport(self, rollout, video_path, dpi=dpi)
