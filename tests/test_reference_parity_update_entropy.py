"""Update parity at coef_ent>0 — quantifying PARITY.md divergence #1.

The reference's entropy estimator draws its single log-det-jacobian sample
from `jr.PRNGKey(np.random.randint(0, 102400))` executed at TRACE time
(reference distribution.py:40-43): within one compiled update the
perturbation epsilon is a fixed tensor, identical across timesteps, envs,
and minibatches. Our framework instead keys the sample per (env, t) — a
documented divergence whose training-level effect was previously unmeasured.

This test closes the gap with an exact experiment: np.random.randint is
monkeypatched to a known constant K while the reference's update traces, and
our algorithm runs in the reference-compat mode (`entropy_fixed_key = K`,
see InforMARL._entropy_keys) that reproduces the same fixed perturbation —
the in-process tfp shim's Normal.sample(seed) is jr.normal-based, so the
epsilon tensors agree bitwise. One full DGPPO update at the DEFAULT
coef_ent=1e-2 must then match leaf-by-leaf, proving the entropy estimator
is the ONLY divergence on this path and bounding it exactly.

The training-level bound (both estimators over 30 updates vs seed-to-seed
variance) is scripts/exp_entropy_modes.py; result recorded in PARITY.md.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from .parity_common import (
    BATCH_IDX,
    REF_PATH,
    assert_metrics_close,
    assert_params_close,
    build_pair,
    ref_plans,
    transfer_params,
)

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_PATH), reason="reference repo not mounted")

FIXED_K = 7321


def test_dgppo_update_parity_with_entropy_bonus(ref_oracle, parity_rollouts, monkeypatch):
    from dgppo_fov_tpu.utils.ref_remap import remap_policy_params, remap_value_params

    # The reference's DEFAULT entropy bonus.
    env_r, env_o, algo_r, algo_o = build_pair("dgppo", coef_ent=1e-2)
    ro_r, ro_o = parity_rollouts.ro_r, parity_rollouts.ro_o
    det_r, det_o = parity_rollouts.det_r, parity_rollouts.det_o

    transfer_params(algo_r, algo_o, with_vh=True)
    batch_idx, rnn_chunk_ids = ref_plans(ro_r)
    step = jnp.array(0)

    # Pin the reference's trace-time entropy seed and mirror it on our side.
    monkeypatch.setattr(np.random, "randint", lambda *a, **k_: FIXED_K)
    algo_o.entropy_fixed_key = FIXED_K

    Vl_r, Vh_r, pol_r, info_r = algo_r.update_inner(
        algo_r.Vl_train_state, algo_r.Vh_train_state, algo_r.policy_train_state,
        ro_r, det_r, batch_idx, rnn_chunk_ids, step,
    )
    Vl_o, Vh_o, pol_o, info_o = algo_o.update_inner(
        algo_o.Vl_train_state, algo_o.Vh_train_state, algo_o.policy_train_state,
        ro_o, det_o, jnp.array(BATCH_IDX), step,
    )

    # With the shared fixed perturbation the ENTROPY metric itself must match
    # too (it is excluded in the coef_ent=0 tests as trace-time-seeded).
    assert_metrics_close(info_r, info_o, (
        "Vl/loss", "Vl/grad_norm", "Vh/loss_Vh", "Vh/grad_Vh_norm",
        "policy/loss", "policy/grad_norm", "policy/clip_frac",
        "policy/total_variation_dist", "policy/entropy", "eval/safe_data",
    ))
    assert_params_close(remap_policy_params(pol_r.params), pol_o.params, "policy")
    assert_params_close(remap_value_params(Vl_r.params), Vl_o.params, "Vl")
    assert_params_close(remap_value_params(Vh_r.params), Vh_o.params, "Vh")
