"""Fast LiDAR raycasting against rotated rectangles.

Behavioral parity reference: /root/reference/dgppo/env/utils.py:49-136 +
env/obstacle.py:74-105. Mathematically identical output (same determinant
clamp, same validity window, same 1e6 miss sentinel, same top-k tie order),
but restructured for the TPU:

 - the reference vmaps `Rectangle.raytracing(start, end)` over beams, so the
   segment-dependent quantities (edge deltas, start-corner offsets) are
   recomputed for each of the 32 beams. Here they are computed once per
   agent and broadcast over beams: per (beam, segment) work drops to a
   handful of fused VPU flops;
 - ray directions are trace-time constants (the beam fan is fixed), so the
   determinant becomes a constant-by-row outer product;
 - top-k selection uses lax.top_k instead of a full argsort.

A Pallas kernel (`raytrace_alphas_pallas`) implements the same contraction
with explicit VMEM staging; it is validated in interpret mode and NOT used
on hardware. Measured on the real chip, the XLA path is within ~2x of the
HBM-bandwidth ceiling for this op, and Mosaic (as shipped on this platform)
cannot express the kernel efficiently: an unrolled segment loop explodes
compile time (~145 s per segment of body complexity), `dynamic_slice` is not
implemented for TPU lowering, and `ref[:, pl.ds(s, 1)]` requires the dynamic
lane index to be a provable multiple of 128 — while this op's natural minor
dimensions are S=32 segments / R=32 beams. The gather-free top-k selection
below captures the win that mattered (TPU gathers were ~2x this op's cost).
"""
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.typing import Array


def beam_fan(num_beams: int, sense_range: float) -> np.ndarray:
    """Constant (num_beams, 2) ray displacement vectors.

    Parity: reference env/utils.py:51-55 (thetas from -pi to pi - 2pi/n).
    """
    thetas = np.linspace(-np.pi, np.pi - 2 * np.pi / num_beams, num_beams)
    return np.stack([np.cos(thetas), np.sin(thetas)], axis=-1).astype(np.float32) * sense_range


def rectangle_segments(points: Array) -> Tuple[Array, Array]:
    """(p3, p4) segment endpoints, flattened over obstacles.

    points: (n_obs, 4, 2) rectangle corners. Edge k of each rectangle runs
    corner[k] -> corner[k-1] (the reference's edge indexing,
    obstacle.py:82-85).
    """
    p3 = points.reshape(-1, 2)  # (S, 2)
    p4 = jnp.roll(points, 1, axis=1).reshape(-1, 2)
    return p3, p4


def raytrace_alphas(start: Array, rays: Array, p3: Array, p4: Array) -> Array:
    """Min fractional hit distance per beam against all segments.

    start: (2,), rays: (R, 2) displacement vectors (constant),
    p3/p4: (S, 2) segment endpoints. Returns alphas (R,) in [0, 1] or 1e6.
    """
    if p3.shape[0] == 0:
        # No obstacles: every beam misses (the reference raytracing() has the
        # same explicit empty-set branch returning the 1e6 sentinel).
        return jnp.full((rays.shape[0],), 1e6, dtype=rays.dtype)

    d_edge = p4 - p3  # (S, 2) — beam-independent
    rhs = start[None, :] - p3  # (S, 2) — beam-independent

    # det[r, s] = (x1-x2)(y4-y3) - (y1-y2)(x4-x3); (x1-x2, y1-y2) = -rays[r].
    det = -(rays[:, 0:1] * d_edge[None, :, 1] - rays[:, 1:2] * d_edge[None, :, 0])  # (R, S)
    det = jnp.sign(det) * jnp.clip(jnp.abs(det), 1e-7, 1e7)

    # alpha numerator is beam-independent: (S,).
    alpha_num = d_edge[:, 1] * rhs[:, 0] - d_edge[:, 0] * rhs[:, 1]
    # beta numerator: (R, S).
    beta_num = rays[:, 1:2] * rhs[None, :, 0] - rays[:, 0:1] * rhs[None, :, 1]

    alphas = alpha_num[None, :] / det
    betas = beta_num / det
    valid = (alphas >= 0) & (alphas <= 1) & (betas >= 0) & (betas <= 1)
    return jnp.min(jnp.where(valid, alphas, 1e6), axis=1)  # (R,)


def lidar_rectangles(
    start: Array,
    points: Array,
    is_inside: Array,
    num_beams: int,
    sense_range: float,
    max_returns: int,
) -> Array:
    """Top-`max_returns` hit points for one agent against rotated rectangles.

    start: (2,) agent position; points: (n_obs, 4, 2) rectangle corners;
    is_inside: () bool — start inside any obstacle (hits collapse to start,
    reference env/utils.py:117-129).
    """
    rays = jnp.asarray(beam_fan(num_beams, sense_range))
    p3, p4 = rectangle_segments(points)
    alphas = raytrace_alphas(start, rays, p3, p4)
    alphas = alphas * (1 - is_inside)

    # Select the k nearest hits without a gather: top_k returns the selected
    # alphas directly, and the selected ray vectors come from a one-hot
    # matmul against the constant beam fan (TPU gathers cost ~2x this).
    # precision=HIGHEST: the TPU default truncates matmul inputs to bf16,
    # which would corrupt every selected ray vector by up to ~0.2% of
    # sense_range (measured vs rays[order]); at full precision the one-hot
    # contraction reproduces the gather bit-exactly.
    neg_v, order = jax.lax.top_k(-alphas, max_returns)
    onehot = (order[:, None] == jnp.arange(num_beams)[None, :]).astype(alphas.dtype)
    sel_rays = jnp.matmul(onehot, rays, precision=jax.lax.Precision.HIGHEST)  # (max_returns, 2)
    return start[None, :] + sel_rays * (-neg_v)[:, None]


# ---- Pallas variant -------------------------------------------------------------
def raytrace_alphas_pallas(starts: Array, rays: np.ndarray, p3: Array, p4: Array) -> Array:
    """Batched Pallas kernel: alphas (B, R) for starts (B, 2) and per-row
    segments p3/p4 (B, S, 2). Same math as `raytrace_alphas`.

    Stages each row-tile's segment data in VMEM and unrolls the (small,
    static) segment loop; beams live on the lane dimension.
    """
    from jax.experimental import pallas as pl

    B, S = p3.shape[0], p3.shape[1]
    R = rays.shape[0]
    TILE = min(256, B)
    n_tiles = -(-B // TILE)
    pad = n_tiles * TILE - B
    if pad:
        starts = jnp.concatenate([starts, jnp.zeros((pad, 2), starts.dtype)], 0)
        p3 = jnp.concatenate([p3, jnp.ones((pad, S, 2), p3.dtype)], 0)
        p4 = jnp.concatenate([p4, jnp.ones((pad, S, 2), p4.dtype)], 0)

    rays_c = jnp.asarray(rays)  # (R, 2) constant operand

    def kernel(starts_ref, p3_ref, p4_ref, rays_ref, out_ref):
        st = starts_ref[:]  # (TILE, 2)
        ray_x = rays_ref[:, 0][None, :]  # (1, R)
        ray_y = rays_ref[:, 1][None, :]
        best = jnp.full((TILE, R), 1e6, dtype=jnp.float32)
        for s in range(S):
            ex = p4_ref[:, s, 0] - p3_ref[:, s, 0]  # (TILE,)
            ey = p4_ref[:, s, 1] - p3_ref[:, s, 1]
            rx = st[:, 0] - p3_ref[:, s, 0]
            ry = st[:, 1] - p3_ref[:, s, 1]
            det = -(ray_x * ey[:, None] - ray_y * ex[:, None])  # (TILE, R)
            det = jnp.sign(det) * jnp.clip(jnp.abs(det), 1e-7, 1e7)
            alpha = (ey * rx - ex * ry)[:, None] / det
            beta = (ray_y * rx[:, None] - ray_x * ry[:, None]) / det
            valid = (alpha >= 0) & (alpha <= 1) & (beta >= 0) & (beta <= 1)
            best = jnp.minimum(best, jnp.where(valid, alpha, 1e6))
        out_ref[:] = best

    # Interpret mode on CPU (Mosaic compiles only for TPU).
    interpret = jax.default_backend() == "cpu"

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE, R), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE, 2), lambda i: (i, 0)),
            pl.BlockSpec((TILE, S, 2), lambda i: (i, 0, 0)),
            pl.BlockSpec((TILE, S, 2), lambda i: (i, 0, 0)),
            pl.BlockSpec((R, 2), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE, R), lambda i: (i, 0)),
        interpret=interpret,
    )(starts, p3, p4, rays_c)
    return out[:B]
