"""Gradient/NaN utilities.

Behavioral parity reference: /root/reference/dgppo/trainer/utils.py:89-118.
Note `compute_norm_and_clip` semantics: scale by max_norm / max(max_norm,
|g|) — i.e. never upscale; identical to the reference.
"""
import jax
import jax.numpy as jnp
import jax.tree_util as jtu


def has_any_nan(x) -> jnp.ndarray:
    return jnp.array([jnp.isnan(l).any() for l in jtu.tree_leaves(x)]).any()


def has_any_inf(x) -> jnp.ndarray:
    return jnp.array([jnp.isinf(l).any() for l in jtu.tree_leaves(x)]).any()


def has_any_nan_or_inf(x) -> jnp.ndarray:
    return has_any_nan(x) | has_any_inf(x)


def compute_norm(grad) -> jnp.ndarray:
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in jtu.tree_leaves(grad)))


def compute_norm_and_clip(grad, max_norm: float):
    g_norm = compute_norm(grad)
    clipped_g_norm = jnp.maximum(max_norm, g_norm)
    clipped_grad = jtu.tree_map(lambda t: (t / clipped_g_norm) * max_norm, grad)
    return clipped_grad, g_norm


@jax.jit
def params_delta_norm(prev, new) -> jnp.ndarray:
    """Global L2 norm of the parameter change across one update.

    Optimizer-liveness signal (no reference counterpart): a run whose
    apply_if_finite is skipping every update — or whose tanh heads have
    saturated — prints frozen eval lines forever; params_delta_norm == 0
    makes that state visible in metrics.jsonl. Cast to f32 so bf16 master
    copies (none today) would not round the norm."""
    return compute_norm(jtu.tree_map(lambda a, b: (b - a).astype(jnp.float32), prev, new))


def snapshot_params(params):
    """Deep-copied device buffers: safe to hold across a donating update
    (donation invalidates the INPUT buffers even if Python still references
    them — a plain `prev = algo.params` would die at the delta-norm read)."""
    return jtu.tree_map(jnp.copy, params)
