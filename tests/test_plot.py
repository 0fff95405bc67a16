"""Smoke tests for the generic graph/scene plotting API.

Parity surface: /root/reference/dgppo/env/plot.py:25-205 (plot_graph 2D/3D,
get_BuRd, get_obs_collection incl. the 3D Cuboid/Sphere branches). These are
host-side renderers; the tests assert artists land on real axes and a full 3D
scene round-trips through the Agg canvas.
"""
import matplotlib

matplotlib.use("Agg")

import jax.numpy as jnp
import jax.random as jr
import matplotlib.pyplot as plt
import numpy as np

from dgppo_fov_tpu.env.obstacle import Cuboid, Rectangle, Sphere
from dgppo_fov_tpu.env.plot import (
    block_edge_index,
    get_BuRd,
    get_obs_collection,
    plot_block_graph,
    plot_graph,
    plot_graph_3d,
)


def test_plot_graph_2d_nodes_edges_and_rectangles():
    fig, ax = plt.subplots()
    pos = np.array([[0.0, 0.0], [1.0, 0.0], [0.5, 1.0]])
    edge_index = np.array([[0, 1, 2], [1, 2, 0]])
    plot_graph(ax, pos, radius=[0.1, 0.2, 0.1], color=["r", "g", "b"],
               plot_edge=True, edge_index=edge_index)
    rect = Rectangle.create(jnp.array([0.5, 0.5]), 0.4, 0.2, jnp.array(0.3))
    batched = Rectangle(*[jnp.asarray(x)[None] for x in rect])
    ax.add_collection(get_obs_collection(batched))
    # circles+edges+obstacle = 3 collections; labels = 3 texts
    assert len(ax.collections) == 3
    assert len(ax.texts) == 3
    fig.canvas.draw()
    plt.close(fig)


def test_plot_graph_3d_cuboid_sphere_scene():
    """The VERDICT-8 done-criterion: a 3D Cuboid/Sphere scene renders."""
    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    pos = np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [0.0, 1.0, 0.5]])
    plot_graph_3d(ax, pos, radius=0.1, color="b", plot_edge=True,
                  edge_index=np.array([[0, 1], [1, 2]]))
    cub = Cuboid.create(jnp.array([0.5, 0.5, 0.5]), 0.3, 0.2, 0.1,
                        jnp.array([0.0, 0.0, 0.0, 1.0]))
    sph = Sphere.create(jnp.array([1.0, 0.0, 0.0]), jnp.array(0.2))
    cub_b = Cuboid(*[jnp.asarray(x)[None] for x in cub])
    sph_b = Sphere(*[jnp.asarray(x)[None] for x in sph])
    cub_col = get_obs_collection(cub_b, color="r", alpha=0.5)
    sph_col = get_obs_collection(sph_b, color="g", alpha=0.5)
    ax.add_collection3d(cub_col)
    ax.add_collection3d(sph_col)
    fig.canvas.draw()  # 3D collections project their paths at draw time
    # 1 cuboid -> 6 quad faces; 1 sphere -> 30 meridian strips
    assert len(cub_col.get_paths()) == 6
    assert len(sph_col.get_paths()) == 30
    plt.close(fig)


def test_get_BuRd_zero_break():
    cm = get_BuRd()
    lo, hi = np.array(cm(0.49)), np.array(cm(0.51))
    # blue side below the break, red side above
    assert lo[2] > lo[0] and hi[0] > hi[2]


def test_plot_block_graph_from_env():
    """End-to-end: a live env's BlockGraph renders with per-type colors and
    mask-derived edges (dense + diagonal lidar blocks via block_edge_index)."""
    from dgppo_fov_tpu.env import make_env

    env = make_env("LidarTarget", num_agents=3, max_step=8)
    graph = env.reset(jr.PRNGKey(0))
    ei = block_edge_index(graph)
    assert ei.shape[0] == 2 and ei.shape[1] > 0
    assert int(ei.max()) < graph.spec.n_nodes
    fig, ax = plt.subplots()
    plot_block_graph(ax, graph, radius=0.05)
    assert len(ax.collections) >= 1
    fig.canvas.draw()
    plt.close(fig)
