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


class EntropyCollapseMonitor:
    """Escalating one-shot warnings for sigma-floor policy collapse.

    Thresholds are per action dimension (the logged policy/entropy is the
    per-agent sum over dims): -6/dim means sigma ~2e-4 — deep in the
    collapse; -9.5/dim means pinned at the reference 1e-5 floor, the
    terminal basin two 20k-step runs never escaped (PARITY.md "sigma-floor"
    analysis). Each level fires once per run so a long collapse does not
    spam the log; recovery re-arms the lower level.
    """

    DEEP_PER_DIM = -6.0
    TERMINAL_PER_DIM = -9.5

    def __init__(self, action_dim: int):
        self.action_dim = max(int(action_dim), 1)
        self._warned_deep = False
        self._warned_terminal = False

    def check(self, entropy: float) -> str | None:
        per_dim = entropy / self.action_dim
        if per_dim < self.TERMINAL_PER_DIM and not self._warned_terminal:
            self._warned_terminal = True
            # A run that collapses straight past TERMINAL must not fire the
            # lesser 'deep' warning on the NEXT check (escalation downgrade).
            self._warned_deep = True
            return (
                f"policy entropy {entropy:.1f} ({per_dim:.1f}/dim) is pinned at the "
                "sigma floor — the terminal collapse basin (PARITY.md sigma-floor "
                "analysis). The entropy bonus cannot recover from here at the "
                "reference std floor; consider restarting with --std-dev-min 1e-2 "
                "or a different seed."
            )
        if per_dim < self.DEEP_PER_DIM and not self._warned_deep:
            self._warned_deep = True
            return (
                f"policy entropy {entropy:.1f} ({per_dim:.1f}/dim) — deep entropy "
                "collapse; if it keeps falling the run will pin at the sigma floor "
                "(see --std-dev-min)."
            )
        if per_dim >= self.DEEP_PER_DIM:
            self._warned_deep = False  # recovered; re-arm the early warning
        return None
