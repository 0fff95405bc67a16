"""Host-side video rendering (matplotlib FuncAnimation -> mp4/gif).

Behavioral parity reference: /root/reference/dgppo/env/plot.py:25-723
(render_mpe at plot.py:206, render_lidar at plot.py:468) — same information
content (agents, goals, obstacles/LiDAR hits, cost/safety text overlays),
compact re-implementation. Rendering is strictly off the hot path.
"""
import pathlib
from typing import Optional, Tuple

import numpy as np

from ..utils.tree import jax2np, tree_index


def save_anim(ani, path: pathlib.Path) -> pathlib.Path:
    """Save an animation; mp4 via ffmpeg when available, else gif (pillow).

    Returns the path actually written: the requested `path` when the mp4
    writer succeeds, else the `.gif` sibling the fallback writes (callers
    must report THIS path, not the requested one).
    """
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    try:
        ani.save(str(path), writer="ffmpeg", fps=30)
        return path
    except Exception:
        gif_path = path.with_suffix(".gif")
        ani.save(str(gif_path), writer="pillow", fps=15)
        return gif_path


def get_f1tenth_body(center, heading, r: float) -> np.ndarray:
    """Car-body polygon corners for bicycle agents.

    Parity: reference env/plot.py `get_f1tenth_body` — a rectangle of
    length 2r / width r centered at `center`, rotated to `heading`.
    """
    length, width = 2.0 * r, r
    corners = np.array(
        [[-length / 2, -width / 2], [length / 2, -width / 2],
         [length / 2, width / 2], [-length / 2, width / 2]]
    )
    c, s = np.cos(heading), np.sin(heading)
    rot = np.array([[c, -s], [s, c]])
    return corners @ rot.T + np.asarray(center)


class MutablePatchCollection:
    """Patch collection whose members can be moved between frames.

    Parity: reference utils/utils.py MutablePatchCollection — a thin helper
    used by the animation loops; here a minimal list wrapper that re-syncs
    artist state.
    """

    def __init__(self, patches):
        self.patches = list(patches)

    def add_to(self, ax):
        for p in self.patches:
            ax.add_patch(p)
        return self.patches

    def __iter__(self):
        return iter(self.patches)


def _setup_axes(side_length, dpi):
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(1, 1, figsize=(10, 10), dpi=dpi)
    ax.set_xlim(0.0, side_length)
    ax.set_ylim(0.0, side_length)
    ax.set_aspect("equal")
    return fig, ax


def _cost_text(costs_k, cost_components):
    worst = np.asarray(costs_k).max(axis=0)
    return ", ".join(f"{name}: {c:+.2f}" for name, c in zip(cost_components, worst))


def render_mpe(
    rollout,
    video_path: pathlib.Path,
    side_length: float,
    dim: int,
    n_agent: int,
    n_obs: int,
    r: float,
    obs_r: float,
    cost_components: Tuple[str, ...],
    Ta_is_unsafe=None,
    viz_opts: dict = None,
    n_goal: Optional[int] = None,
    dpi: int = 100,
    **kwargs,
):
    """Parity: reference render_mpe (env/plot.py:206-465)."""
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation

    T_env_states = jax2np(rollout.graph.env_states)
    T_costs = jax2np(rollout.costs)
    T = T_costs.shape[0]
    n_goal = n_agent if n_goal is None else n_goal

    fig, ax = _setup_axes(side_length, dpi)

    state0 = tree_index(T_env_states, 0)
    goal_pts = ax.scatter(state0.goal[:, 0], state0.goal[:, 1], marker="*", s=150, c="C5", zorder=4)
    if n_obs > 0:
        for k in range(n_obs):
            ax.add_patch(plt.Circle(state0.obs[k, :2], obs_r, fc="C7", ec="none", zorder=3))

    agent_patches = [plt.Circle((0, 0), r, color=f"C{i % 10}", zorder=5) for i in range(n_agent)]
    for p in agent_patches:
        ax.add_patch(p)
    cost_text = ax.text(0.01, 1.02, "", va="bottom", ha="left", transform=ax.transAxes, size=12)
    kk_text = ax.text(0.99, 1.02, "", va="bottom", ha="right", transform=ax.transAxes, size=12)

    def update(kk):
        state = tree_index(T_env_states, kk)
        for i in range(n_agent):
            agent_patches[i].set_center(state.agent[i, :2])
            if Ta_is_unsafe is not None:
                unsafe = bool(np.asarray(Ta_is_unsafe)[kk, i])
                agent_patches[i].set_edgecolor("red" if unsafe else "none")
                agent_patches[i].set_linewidth(3.0 if unsafe else 0.0)
        cost_text.set_text(_cost_text(T_costs[kk], cost_components))
        kk_text.set_text(f"k={kk:03}")
        return [*agent_patches, cost_text, kk_text, goal_pts]

    ani = FuncAnimation(fig, update, frames=T, interval=1000 / 30.0, blit=True)
    written = save_anim(ani, video_path)
    plt.close(fig)
    return written


def render_lidar(
    rollout,
    video_path: pathlib.Path,
    side_length: float,
    dim: int,
    n_agent: int,
    n_rays: int,
    r: float,
    cost_components: Tuple[str, ...],
    Ta_is_unsafe=None,
    viz_opts: dict = None,
    n_goal: Optional[int] = None,
    dpi: int = 100,
    car_body: bool = False,
    **kwargs,
):
    """Parity: reference render_lidar (env/plot.py:468-723).

    car_body=True draws each agent as an oriented f1tenth rectangle (heading
    from state columns 2:4 = (cos, sin)) instead of a circle — the
    reference's custom LidarBicycleTarget renderer
    (lidar_bicycle_target.py:125-293).
    """
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation

    T_env_states = jax2np(rollout.graph.env_states)
    T_states = jax2np(rollout.graph.states)
    T_costs = jax2np(rollout.costs)
    T = T_costs.shape[0]
    n_goal = n_agent if n_goal is None else n_goal

    fig, ax = _setup_axes(side_length, dpi)

    state0 = tree_index(T_env_states, 0)
    # Obstacles: rotated rectangles.
    if state0.obstacle is not None:
        pts = np.asarray(state0.obstacle.points)  # (n_obs, 4, 2)
        for k in range(pts.shape[0]):
            ax.add_patch(plt.Polygon(pts[k], fc="C7", ec="none", zorder=3))
    ax.scatter(state0.goal[:, 0], state0.goal[:, 1], marker="*", s=150, c="C5", zorder=4)

    if car_body:
        agent_patches = MutablePatchCollection(
            plt.Polygon(get_f1tenth_body((0.0, 0.0), 0.0, r), color=f"C{i % 10}", zorder=5)
            for i in range(n_agent)
        ).add_to(ax)
    else:
        agent_patches = [plt.Circle((0, 0), r, color=f"C{i % 10}", zorder=5) for i in range(n_agent)]
        for p in agent_patches:
            ax.add_patch(p)
    hits_scatter = ax.scatter([], [], s=4, c="red", zorder=6) if n_rays > 0 else None
    cost_text = ax.text(0.01, 1.02, "", va="bottom", ha="left", transform=ax.transAxes, size=12)
    kk_text = ax.text(0.99, 1.02, "", va="bottom", ha="right", transform=ax.transAxes, size=12)

    def update(kk):
        state = tree_index(T_env_states, kk)
        for i in range(n_agent):
            if car_body:
                heading = float(np.arctan2(state.agent[i, 3], state.agent[i, 2]))
                agent_patches[i].set_xy(get_f1tenth_body(state.agent[i, :2], heading, r))
            else:
                agent_patches[i].set_center(state.agent[i, :2])
            if Ta_is_unsafe is not None:
                unsafe = bool(np.asarray(Ta_is_unsafe)[kk, i])
                agent_patches[i].set_edgecolor("red" if unsafe else "none")
                agent_patches[i].set_linewidth(3.0 if unsafe else 0.0)
        artists = [*agent_patches]
        if hits_scatter is not None:
            hits = T_states[kk, n_agent + n_goal :, :2]
            hits_scatter.set_offsets(hits)
            artists.append(hits_scatter)
        cost_text.set_text(_cost_text(T_costs[kk], cost_components))
        kk_text.set_text(f"k={kk:03}")
        return artists + [cost_text, kk_text]

    ani = FuncAnimation(fig, update, frames=T, interval=1000 / 30.0, blit=True)
    written = save_anim(ani, video_path)
    plt.close(fig)
    return written
