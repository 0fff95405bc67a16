"""Composable stages of the PPO-family update pipeline.

All four algorithms (InforMARL, InforMARLLagr, DGPPO, HCBFCRPO) share one
update skeleton: unroll critics along the trajectory, bootstrap the final
value, build Dec-EFOCP GAE targets, assemble a per-agent advantage, then
fit networks over minibatches of whole trajectories with truncated-BPTT
chunking. This module holds those stages as small pure functions so each
algorithm file states only its own composition (which critic feeds which
target, and how the advantage is assembled).

Behavioral parity references (math only — the decomposition here is ours):
reference algo/informarl.py:268-457, algo/dgppo.py:188-321,
algo/informarl_lagr.py:148-309, trainer/utils.py:89-118.
"""
import functools as ft
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import optax
from jax import lax

from ..trainer.data import Rollout
from ..trainer.utils import compute_norm_and_clip, has_any_nan_or_inf
from ..utils.typing import Array
from .gae import compute_dec_ocp_gae


class ValuePath(NamedTuple):
    """A critic evaluated along a batched trajectory.

    per_step:       (b, T, ...) value at each visited state
    carries:        (b, T, ...) RNN carry entering each step (for TBPTT replay)
    with_bootstrap: (b, T+1, ...) per_step plus the final-state bootstrap row
    """

    per_step: Array
    carries: Array
    with_bootstrap: Array


def unroll_value(scan_one_env: Callable, bootstrap_one_env: Callable, rollout: Rollout) -> ValuePath:
    """vmap a single-env critic scan over the batch and append the bootstrap.

    scan_one_env(rollout_slice) -> (values, carries, final_carry);
    bootstrap_one_env(final_graph, final_carry) -> final value.
    """
    values, carries, final_carries = jax.vmap(scan_one_env)(rollout)
    final_values = jax.vmap(bootstrap_one_env)(rollout.final_graph, final_carries)
    return ValuePath(values, carries, jnp.concatenate([values, final_values[:, None]], axis=1))


def efocp_targets(
    costs: Array, stage_loss: Array, vh_with_boot: Array, vl_with_boot: Array,
    gamma: float, gae_lambda: float,
) -> Tuple[Array, Array]:
    """Dec-EFOCP GAE over the batch: (b,T,a,h) constraint targets Qh and
    (b,T) task targets Ql. `stage_loss` is the per-step scalar loss l
    (the reference folds reward negation / cost penalties in here)."""
    return jax.vmap(
        ft.partial(compute_dec_ocp_gae, disc_gamma=gamma, gae_lambda=gae_lambda)
    )(costs, stage_loss, vh_with_boot, vl_with_boot)


def time_normalized(adv: Array) -> Array:
    """Normalize an advantage per environment over its time axis (axis 1) —
    the reference's normalization axes (informarl.py:334-336)."""
    centered = adv - adv.mean(axis=1, keepdims=True)
    return centered / (adv.std(axis=1, keepdims=True) + 1e-8)


def per_agent(shared: Array, n_agents: int) -> Array:
    """Tile a (b,T) team-level signal to a (b,T,a) per-agent one."""
    return jnp.repeat(shared[:, :, None], n_agents, axis=-1)


class CBFTerms(NamedTuple):
    """Discrete-CBF condition evaluated on a constraint-value path.

    rate:      (b,T,a,h) (Vh' - Vh)/dt + alpha*Vh — negative means the
               discrete CBF condition holds
    violation: (b,T,a,h) hinge max(rate + eps, 0)
    all_met:   (b,T,a)   every constraint of the agent satisfies rate <= 0
    """

    rate: Array
    violation: Array
    all_met: Array


def discrete_cbf(vh_with_boot: Array, dt: float, alpha: float, eps: float) -> CBFTerms:
    """reference dgppo.py:246-247,250: finite-difference CBF derivative along
    the trajectory plus the class-K term, and its hinge violation."""
    vh_now = vh_with_boot[:, :-1]
    rate = (vh_with_boot[:, 1:] - vh_now) / dt + alpha * vh_now
    return CBFTerms(rate, jnp.maximum(rate + eps, 0.0), (rate <= 0).min(axis=-1))


def fuse_task_with_cbf(task_adv: Array, cbf: CBFTerms, weight) -> Tuple[Array, Array]:
    """DGPPO's advantage merge (reference dgppo.py:250-259): keep the task
    advantage only where the agent's discrete CBF condition holds everywhere,
    add the weighted worst-constraint violation, and negate (losses are
    minimized). Returns (fused advantage, fraction of safe data)."""
    gated = jnp.where(cbf.all_met, task_adv, jnp.zeros_like(task_adv))
    fused = -(gated + cbf.violation.max(axis=-1) * weight)
    return fused, cbf.all_met.mean()


# --------------------------------------------------------------- minibatching


def strip_env_states(rollout: Rollout) -> Rollout:
    """Drop env_states before entering jit (they are host-side only;
    reference informarl.py:261-264 strips them the same way)."""
    return rollout._replace(
        graph=rollout.graph.without_env_states(),
        final_graph=rollout.final_graph.without_env_states(),
    )


def minibatch_plan(rollout: Rollout, batch_size: int, rnn_step: int) -> Array:
    """Host-side epoch plan: a shuffled split of env indices into minibatches
    of whole trajectories.

    Consumes np.random exactly like the reference (one np.random.shuffle of
    arange(n_env); informarl.py:268-273) so seeded runs reproduce.
    """
    n_env, horizon = rollout.dones.shape[:2]
    assert n_env * horizon >= batch_size, "batch_size exceeds collected transitions"
    assert horizon % rnn_step == 0, f"horizon {horizon} not divisible by rnn_step {rnn_step}"
    order = np.arange(n_env)
    np.random.shuffle(order)
    envs_per_minibatch = batch_size // horizon
    return jnp.array(jnp.array_split(order, n_env // envs_per_minibatch))


def take_envs(tree, env_idx: Array):
    """Select a minibatch of environments (leading axis) from a pytree."""
    return jtu.tree_map(lambda x: x[env_idx], tree)


def take_chunks(tree, rnn_step: int):
    """Split the time axis (axis 1) of a pytree into TBPTT chunks:
    (b, T, ...) -> (b, T//rnn_step, rnn_step, ...).

    The reference's chunk table is always `array_split(arange(T))`
    (informarl.py:271-272) — contiguous ranges — so the split is a static
    reshape, not a gather of the whole minibatch per sub-update.

    A full Rollout's `final_graph` has no time axis (and no chunked update
    reads it), so it is dropped rather than mis-chunked.
    """
    if isinstance(tree, Rollout):
        tree = tree._replace(final_graph=None)

    def split(x):
        b, horizon = x.shape[:2]
        assert horizon % rnn_step == 0, f"horizon {horizon} not divisible by rnn_step {rnn_step}"
        return x.reshape(b, horizon // rnn_step, rnn_step, *x.shape[2:])

    return jtu.tree_map(split, tree)


def fresh_chunk_carries(carries: Array, rnn_step: int) -> Array:
    """Zero initial RNN state per chunk (truncated BPTT; the reference
    re-evaluates every chunk from a zero carry, informarl.py:367,413):
    (b, T, ...) carries -> (b, T//rnn_step, ...) zeros."""
    b, horizon = carries.shape[:2]
    return jnp.zeros((b, horizon // rnn_step) + carries.shape[2:], carries.dtype)


def scan_minibatches(per_minibatch: Callable, carry, minibatches: Array):
    """Run `per_minibatch(carry, env_idx) -> (carry, info)` over the epoch's
    minibatches; return the final carry and the LAST minibatch's metrics
    (the reference logs only the last)."""
    carry, infos = lax.scan(per_minibatch, carry, minibatches)
    return carry, jtu.tree_map(lambda x: x[-1], infos)


# -------------------------------------------------------------- gradient step


def fit(
    train_state,
    loss_fn: Callable,
    max_grad_norm: float,
    prefix: str,
    has_aux: bool = False,
    loss_key: Optional[str] = None,
    nan_key: Optional[str] = None,
    norm_key: Optional[str] = None,
    extra_metrics: Optional[dict] = None,
):
    """One clipped gradient step with the shared safety rails: NaN/Inf
    counter, global-norm clip (never upscales; trainer/utils.py semantics),
    then apply_gradients (whose optax.apply_if_finite skips non-finite
    updates). Metric keys default to '<prefix>/loss|grad_norm|has_nan'."""
    if has_aux:
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(train_state.params)
    else:
        loss, grads = jax.value_and_grad(loss_fn)(train_state.params)
        aux = {}
    saw_nan = has_any_nan_or_inf(grads).astype(jnp.float32)
    grads, grad_norm = compute_norm_and_clip(grads, max_grad_norm)
    train_state = train_state.apply_gradients(grads=grads)
    info = {
        loss_key or f"{prefix}/loss": loss,
        norm_key or f"{prefix}/grad_norm": grad_norm,
        nan_key or f"{prefix}/has_nan": saw_nan,
    }
    return train_state, info | aux | (extra_metrics or {})


#: Clamp on the PPO log-ratio before exponentiation. exp() overflows f32 at
#: ~88.7; a policy whose std has collapsed to the bf16 noise floor produces
#: |logp_new - logp_old| in the thousands (measured -1079 in the r3 --bf16
#: run, logs/MPETarget/dgppo/seed0_819110834_QTBY), so one bad minibatch made
#: every subsequent update non-finite and apply_if_finite froze the optimizer
#: permanently. Clamping at +/-20 (ratio in [2e-9, 4.9e8]) is the identity in
#: value AND gradient whenever |diff| <= 20 — healthy f32 runs stay below ~11
#: even mid-destabilization, so reference parity (bitwise on the golden
#: update tests) is unaffected — while keeping the loss finite so the
#: entropy bonus can pull a collapsed policy back (the f32 run recovers from
#: the same entropy dip at step ~2k; the unclamped bf16 run could not).
PPO_LOG_RATIO_CLAMP = 20.0


def ppo_ratio(logp_new: Array, logp_old: Array) -> Array:
    """exp(logp_new - logp_old) with the finite-rail clamp above."""
    return jnp.exp(
        jnp.clip(logp_new - logp_old, -PPO_LOG_RATIO_CLAMP, PPO_LOG_RATIO_CLAMP)
    )


def ppo_clip_objective(logp_new: Array, logp_old: Array, adv: Array, clip_eps: float):
    """PPO clipped surrogate (reference informarl.py:417-433) plus its
    diagnostics. Returns (surrogate loss, metrics)."""
    ratio = ppo_ratio(logp_new, logp_old)
    unclipped = -ratio * adv
    clipped = -jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps) * adv
    loss = jnp.maximum(unclipped, clipped).mean()
    metrics = {
        "policy/clip_frac": jnp.mean(clipped > unclipped),
        "policy/total_variation_dist": 0.5 * jnp.mean(jnp.abs(ratio - 1.0)),
    }
    return loss, metrics
