"""Fast raycast ops vs the per-beam reference formulation."""
import functools as ft

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgppo_fov_tpu.env.obstacle import Rectangle
from dgppo_fov_tpu.env.utils import get_lidar, inside_obstacles
from dgppo_fov_tpu.ops.raycast import (
    beam_fan,
    lidar_rectangles,
    raytrace_alphas,
    raytrace_alphas_pallas,
    rectangle_segments,
)


def _random_rects(key, n_obs=3):
    k1, k2, k3 = jax.random.split(key, 3)
    pos = jax.random.uniform(k1, (n_obs, 2), minval=0.0, maxval=1.5)
    lens = jax.random.uniform(k2, (n_obs, 2), minval=0.1, maxval=0.3)
    thetas = jax.random.uniform(k3, (n_obs,), minval=0.0, maxval=2 * np.pi)
    return jax.vmap(Rectangle.create)(pos, lens[:, 0], lens[:, 1], thetas)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fast_alphas_match_per_beam(seed):
    key = jax.random.PRNGKey(seed)
    rects = _random_rects(key)
    start = jax.random.uniform(jax.random.fold_in(key, 9), (2,), minval=0.0, maxval=1.5)

    rays = jnp.asarray(beam_fan(32, 0.5))
    p3, p4 = rectangle_segments(rects.points)
    fast = raytrace_alphas(start, rays, p3, p4)

    # Per-beam formulation (the reference's structure).
    ends = start[None, :] + rays

    def per_beam(end):
        return jax.vmap(lambda r: r.raytracing(start, end))(rects).min()

    slow = jax.vmap(per_beam)(ends)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("seed", [0, 5])
def test_lidar_rectangles_matches_get_lidar(seed):
    key = jax.random.PRNGKey(seed)
    rects = _random_rects(key)
    start = jax.random.uniform(jax.random.fold_in(key, 7), (2,), minval=0.0, maxval=1.5)

    slow = get_lidar(start, rects, num_beams=32, sense_range=0.5, max_returns=8)
    is_in = inside_obstacles(start, rects)
    fast = lidar_rectangles(start, rects.points, is_in, num_beams=32, sense_range=0.5, max_returns=8)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow), rtol=1e-4, atol=1e-5)


def test_pallas_kernel_matches_xla():
    key = jax.random.PRNGKey(0)
    B, S = 100, 12
    starts = jax.random.uniform(key, (B, 2), minval=0.0, maxval=1.5)
    rects = [_random_rects(jax.random.fold_in(key, i)) for i in range(B)]
    points = jnp.stack([r.points for r in rects])  # (B, n_obs, 4, 2)
    p3 = points.reshape(B, -1, 2)
    p4 = jnp.roll(points, 1, axis=2).reshape(B, -1, 2)
    assert p3.shape == (B, S, 2)

    rays = beam_fan(32, 0.5)
    xla = jax.vmap(lambda s, a, b: raytrace_alphas(s, jnp.asarray(rays), a, b))(starts, p3, p4)
    try:
        pallas = raytrace_alphas_pallas(starts, rays, p3, p4)
    except Exception as e:  # pallas unsupported on this backend config
        pytest.skip(f"pallas unavailable: {e}")
    np.testing.assert_allclose(np.asarray(pallas), np.asarray(xla), rtol=1e-5, atol=1e-6)


def test_raytrace_alphas_empty_obstacle_set():
    """Regression: zero segments must return all-miss sentinels (the
    reference raytracing() has an explicit empty-set branch) instead of
    crashing on a zero-size min reduction."""
    rays = jnp.asarray(beam_fan(32, 0.5))
    alphas = raytrace_alphas(jnp.array([0.5, 0.5]), rays, jnp.zeros((0, 2)), jnp.zeros((0, 2)))
    assert alphas.shape == (32,)
    np.testing.assert_array_equal(np.asarray(alphas), np.full((32,), 1e6, np.float32))
