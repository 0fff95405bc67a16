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


# --------------------------------------------------------------------------
# Generic graph / scene plotting (2D + 3D)
#
# Behavioral parity reference: /root/reference/dgppo/env/plot.py:25-205
# (plot_graph, plot_graph_3d, get_BuRd, get_obs_collection). Host-side
# numpy only; arrays already hold materialized geometry (obstacle corner
# points live in the pytrees), so no device compute is needed here.
# --------------------------------------------------------------------------


def _hsl_hex(h: float, s: float, l: float) -> str:
    """hex color from HSL (the reference pulls in `colour.hsl2hex` for this)."""
    import colorsys

    r, g, b = colorsys.hls_to_rgb(h, l, s)
    return "#{:02x}{:02x}{:02x}".format(round(r * 255), round(g * 255), round(b * 255))


def get_BuRd():
    """Diverging blue/red colormap for signed (SDF/CBF-style) fields.

    Parity: reference env/plot.py:118-126 `get_BuRd` — same HSL anchor
    colors, hard break at 0.5 so the zero level-set is visually sharp.
    """
    from matplotlib.colors import LinearSegmentedColormap

    blue, light_blue = _hsl_hex(0.57, 0.5, 0.55), _hsl_hex(0.5, 1.0, 0.995)
    red, light_red = _hsl_hex(0.028, 0.62, 0.59), _hsl_hex(0.098, 1.0, 0.995)
    return LinearSegmentedColormap.from_list(
        "SDF", [(0, light_blue), (0.5, blue), (0.5, red), (1, light_red)], N=256
    )


def _per_node(val, n):
    """Broadcast a scalar/str to an n-list; pass lists/arrays through."""
    if isinstance(val, (str, bool, float, int)):
        return [val] * n
    out = list(np.asarray(val)) if not isinstance(val, list) else val
    return out


def plot_graph(
    ax,
    pos,
    radius,
    color,
    with_label=True,
    plot_edge: bool = False,
    edge_index=None,
    edge_color="k",
    alpha: float = 1.0,
    **_,
):
    """Draw a 2D node/edge graph: circles (+ index labels) and trimmed edges.

    Parity: reference env/plot.py:25-69 `plot_graph`. `pos` is (N, 2);
    `edge_index` is (2, E) [sender; receiver] (see `block_edge_index` for
    deriving one from a BlockGraph's masks). Edge segments are shortened by
    the endpoint radii and widened by their sum, as in the reference.
    """
    import matplotlib.pyplot as plt
    from matplotlib.collections import LineCollection, PatchCollection

    pos = np.asarray(pos, dtype=np.float64)
    n = pos.shape[0]
    radius = np.asarray(_per_node(radius, n), dtype=np.float64)
    color = _per_node(color, n)
    with_label = _per_node(with_label, n)

    circles = [
        plt.Circle((pos[i, 0], pos[i, 1]), radius=radius[i], color=color[i],
                   clip_on=False, alpha=alpha, linewidth=0.0)
        for i in range(n)
    ]
    for i in range(n):
        if with_label[i]:
            ax.text(pos[i, 0], pos[i, 1], f"{i}", size=12, color="k",
                    family="sans-serif", weight="normal",
                    horizontalalignment="center", verticalalignment="center",
                    transform=ax.transData, clip_on=True)
    ax.add_collection(PatchCollection(circles, match_original=True))

    if plot_edge and edge_index is not None:
        edge_index = np.asarray(edge_index)
        send, recv = edge_index[0], edge_index[1]
        start, end = pos[send], pos[recv]
        vec = end - start
        norm = np.maximum(np.linalg.norm(vec, axis=1, keepdims=True), 1e-9)
        direction = vec / norm
        start = start + direction * radius[send][:, None]
        end = end - direction * radius[recv][:, None]
        widths = (radius[send] + radius[recv]) * 20
        ecolor = _per_node(edge_color, len(send))
        ax.add_collection(
            LineCollection(np.stack([start, end], axis=1), colors=ecolor,
                           linewidths=widths, alpha=0.5)
        )
    return ax


def plot_node_3d(ax, pos, r: float, color: str, alpha: float, grid: int = 10):
    """One sphere glyph on a 3D axis (reference env/plot.py:72-80)."""
    u = np.linspace(0, 2 * np.pi, grid)
    v = np.linspace(0, np.pi, grid)
    x = r * np.outer(np.cos(u), np.sin(v)) + pos[0]
    y = r * np.outer(np.sin(u), np.sin(v)) + pos[1]
    z = r * np.outer(np.ones(np.size(u)), np.cos(v)) + pos[2]
    ax.plot_surface(x, y, z, color=color, alpha=alpha)
    return ax


def plot_graph_3d(
    ax,
    pos,
    radius: float,
    color,
    with_label: bool = True,
    plot_edge: bool = False,
    edge_index=None,
    edge_color="k",
    alpha: float = 1.0,
    **_,
):
    """3D analogue of `plot_graph` (reference env/plot.py:83-113).

    Nodes are sphere surfaces of a shared `radius`; edges straight segments.
    """
    pos = np.asarray(pos, dtype=np.float64)
    n = pos.shape[0]
    color = _per_node(color, n)
    for i in range(n):
        plot_node_3d(ax, pos[i], radius, color[i], alpha)
        if with_label:
            ax.text(pos[i, 0], pos[i, 1], pos[i, 2], f"{i}", size=12, color="k",
                    family="sans-serif", weight="normal",
                    horizontalalignment="center", verticalalignment="center")
    if plot_edge and edge_index is not None:
        edge_index = np.asarray(edge_index)
        ecolor = _per_node(edge_color, edge_index.shape[1])
        for k in range(edge_index.shape[1]):
            i, j = edge_index[0, k], edge_index[1, k]
            seg = np.stack([pos[i], pos[j]])
            ax.plot(seg[:, 0], seg[:, 1], seg[:, 2], linewidth=1.0, color=ecolor[k])
    return ax


_CUBOID_FACES = np.array(
    [[0, 1, 2, 3], [4, 5, 6, 7], [0, 1, 5, 4], [2, 3, 7, 6], [0, 3, 7, 4], [1, 2, 6, 5]]
)


def get_obs_collection(obstacles, color: str = "r", alpha: float = 0.8):
    """Matplotlib collection for a batched obstacle pytree.

    Parity: reference env/plot.py:129-189 (`get_obs_collection` +
    `get_cuboid_collection`/`get_sphere_collection`). Rectangle -> 2D
    PatchCollection; Cuboid/Sphere -> Poly3DCollection. Geometry comes
    straight from the pytree's materialized `points`/`center` fields.
    """
    from matplotlib.collections import PatchCollection
    from matplotlib.patches import Polygon
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    from .obstacle import Cuboid, Rectangle, Sphere

    if isinstance(obstacles, Rectangle):
        points = np.asarray(obstacles.points)  # (n_obs, 4, 2)
        polys = [Polygon(points[i]) for i in range(points.shape[0])]
        return PatchCollection(polys, color="#8a0000", alpha=1.0, zorder=99)
    if isinstance(obstacles, Cuboid):
        corners = np.asarray(obstacles.points)  # (n_obs, 8, 3)
        faces = corners[:, _CUBOID_FACES].reshape(-1, 4, 3)
        return Poly3DCollection(faces, alpha=alpha, linewidth=1.0,
                                edgecolor="k", facecolor=color)
    if isinstance(obstacles, Sphere):
        center = np.asarray(obstacles.center)  # (n_obs, 3)
        rad = np.asarray(obstacles.radius)  # (n_obs,)
        u = np.linspace(0, 2 * np.pi, 30)
        v = np.linspace(0, np.pi, 30)
        shell = np.stack(
            [np.outer(np.cos(u), np.sin(v)),
             np.outer(np.sin(u), np.sin(v)),
             np.outer(np.ones_like(u), np.cos(v))],
            axis=-1,
        )  # (30, 30, 3) unit sphere
        meshes = rad[:, None, None, None] * shell[None] + center[:, None, None, :]
        return Poly3DCollection(meshes.reshape(-1, 30, 3), alpha=alpha,
                                linewidth=0.0, edgecolor="k", facecolor=color)
    raise NotImplementedError(f"no renderer for obstacle type {type(obstacles)!r}")


def block_edge_index(graph, threshold: float = 0.5) -> np.ndarray:
    """(2, E) [sender; receiver] pairs of a BlockGraph's active edges.

    Bridges the block-dense layout to index-list plotting: walks each
    BlockSpec, keeps (recv, send) cells whose mask exceeds `threshold`,
    and maps block-local coordinates back to global node ids (diagonal
    blocks via their per-receiver sender chunks).
    """
    pairs = []
    for spec, mask in zip(graph.spec.blocks, graph.masks):
        m = np.asarray(mask) > threshold
        if spec.diag_chunk:
            recv_loc, chunk_loc = np.nonzero(m)  # (n_recv, diag_chunk)
            send = spec.send_start + recv_loc * spec.diag_chunk + chunk_loc
            recv = spec.recv_start + recv_loc
        else:
            recv_loc, send_loc = np.nonzero(m)  # (n_recv, n_send)
            send = spec.send_start + send_loc
            recv = spec.recv_start + recv_loc
        pairs.append(np.stack([send, recv]))
    if not pairs:
        return np.zeros((2, 0), dtype=np.int64)
    return np.concatenate(pairs, axis=1)


def plot_block_graph(ax, graph, radius=0.05, type_colors=None, dim: int = 2, **kw):
    """Render a single BlockGraph: nodes colored by type, active edges drawn.

    Convenience wrapper over `plot_graph`/`plot_graph_3d` — the BlockGraph
    equivalent of calling the reference plot_graph on a GraphsTuple.
    Positions are the leading `dim` state components (the convention every
    registered env follows).
    """
    assert graph.is_single, "plot_block_graph takes an unbatched graph"
    pos = np.asarray(graph.states[..., :dim])
    palette = ["#3978f0", "#2fa84f", "#e05b5b", "#9467bd", "#8c564b", "#7f7f7f"]
    colors = [palette[0]] * graph.spec.n_nodes
    for t in graph.spec.types:
        c = (type_colors or {}).get(t.type_id, palette[t.type_id % len(palette)])
        for i in range(t.start, t.start + t.count):
            colors[i] = c
    edge_index = block_edge_index(graph)
    fn = plot_graph_3d if dim == 3 else plot_graph
    return fn(ax, pos, radius, colors, plot_edge=edge_index.shape[1] > 0,
              edge_index=edge_index, **kw)


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
