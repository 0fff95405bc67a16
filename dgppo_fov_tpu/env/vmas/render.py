"""VMAS environment renderers.

Behavioral parity reference: /root/reference/dgppo/env/vmas/
vmas_reverse_transport.py:322-431, vmas_wheel.py:317-422 — same scene
content (box/line, goal, obstacles/sector, agents, per-frame text), compact
re-implementation.
"""
import pathlib

import numpy as np

from ...utils.tree import jax2np, tree_index
from ..plot import save_anim


def render_reverse_transport(env, rollout, video_path: pathlib.Path, dpi: int = 200):
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation

    T_env_states = jax2np(rollout.graph.env_states)
    T = np.asarray(rollout.costs).shape[0]

    fig, ax = plt.subplots(1, 1, figsize=(10, 10), dpi=dpi)
    hw = env.half_width
    ax.set_xlim(-1.01 * hw, 1.01 * hw)
    ax.set_ylim(-1.01 * hw, 1.01 * hw)
    ax.set_aspect("equal")
    ax.add_patch(plt.Rectangle((-hw, -hw), 2 * hw, 2 * hw, fc="none", ec="C3"))

    goal_pos = tree_index(T_env_states, 0).goal_pos
    ax.add_patch(plt.Circle(goal_pos, env.params["dist2goal"], color="C5", alpha=0.5))
    o_pos = tree_index(T_env_states, 0).o_pos
    for oo in range(env.n_obs):
        ax.add_patch(plt.Circle(o_pos[oo], env.obs_radius, fc="C0", ec="none", alpha=0.7))

    offset = np.array([-env.package_length / 2, -env.package_width / 2])
    box_patch = plt.Rectangle(offset, env.package_length, env.package_width, ec="C3", fc="none")
    ax.add_patch(box_patch)
    agent_patches = [plt.Circle((0, 0), env.agent_radius, color=f"C{i+1}", zorder=5) for i in range(env.num_agents)]
    for p in agent_patches:
        ax.add_patch(p)
    kk_text = ax.text(0.99, 1.02, "", va="bottom", ha="right", transform=ax.transAxes, size=14)

    def update(kk):
        st = tree_index(T_env_states, kk)
        for i in range(env.num_agents):
            agent_patches[i].set_center(st.a_pos[i])
        box_patch.set_xy(offset + st.box_pos)
        kk_text.set_text(f"k={kk:03}")
        return [box_patch, *agent_patches, kk_text]

    ani = FuncAnimation(fig, update, frames=T, interval=1000 / 30.0, blit=True)
    written = save_anim(ani, video_path)
    plt.close(fig)
    return written


def render_wheel(env, rollout, video_path: pathlib.Path, dpi: int = 200):
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation
    from matplotlib.patches import Wedge

    T_env_states = jax2np(rollout.graph.env_states)
    T = np.asarray(rollout.costs).shape[0]

    fig, ax = plt.subplots(1, 1, figsize=(10, 10), dpi=dpi)
    hw = env.half_width
    ax.set_xlim(-1.02 * hw, 1.02 * hw)
    ax.set_ylim(-1.02 * hw, 1.02 * hw)
    ax.set_aspect("equal")

    st0 = tree_index(T_env_states, 0)
    L = env.line_length
    ax.plot([0, np.cos(st0.goal_angle) * L], [0, np.sin(st0.goal_angle) * L], "C5", lw=2, alpha=0.2)
    ax.add_patch(
        Wedge(
            (0, 0), 1.2 * L,
            np.rad2deg(st0.avoid_angle - env.obs_halfwidth_rad),
            np.rad2deg(st0.avoid_angle + env.obs_halfwidth_rad),
            alpha=0.2, color="C0",
        )
    )
    (line_artist,) = ax.plot([], [], "C3", lw=3)
    agent_patches = [plt.Circle((0, 0), env.agent_radius, color=f"C{i+1}", zorder=5) for i in range(env.num_agents)]
    for p in agent_patches:
        ax.add_patch(p)
    kk_text = ax.text(0.99, 1.02, "", va="bottom", ha="right", transform=ax.transAxes, size=14)

    def update(kk):
        st = tree_index(T_env_states, kk)
        a = float(st.line_angle)
        line_artist.set_data([-np.cos(a) * L / 2, np.cos(a) * L / 2], [-np.sin(a) * L / 2, np.sin(a) * L / 2])
        for i in range(env.num_agents):
            agent_patches[i].set_center(st.a_pos[i])
        kk_text.set_text(f"k={kk:03}")
        return [line_artist, *agent_patches, kk_text]

    ani = FuncAnimation(fig, update, frames=T, interval=1000 / 30.0, blit=True)
    written = save_anim(ani, video_path)
    plt.close(fig)
    return written
