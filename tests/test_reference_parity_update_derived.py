"""Update-level golden parity for the three DERIVED algorithms (round-2
VERDICT missing #1): one full update step on the SAME rollout with the SAME
(transferred) parameters must produce the same updated parameters
leaf-by-leaf in both frameworks — for InforMARLLagr (multiplier ascent,
reference informarl_lagr.py:164-309), DGPPO (det-rollout Vh fit + CBF-fused
advantage, reference dgppo.py:188-321), and HCBFCRPO (analytic CBF,
reference hcbfcrpo.py:118-205).

Protocol (same as tests/test_reference_parity_update.py, which covers the
InforMARL base): the session-shared reference rollouts (conftest
.parity_rollouts — valid across algorithm classes because the policy-init
key stream is shared) are used with remapped params and identical
minibatch/chunk plans (bypassing the host-side shuffle); the reference's
UPDATED params are remapped and compared leaf-by-leaf. coef_ent=0 because
the reference's entropy estimator seeds its sample at trace time (reference
distribution.py:40-43; PARITY.md divergence #1) —
tests/test_reference_parity_update_entropy.py covers coef_ent>0.
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


def test_informarl_lagr_update_parity(ref_oracle, parity_rollouts):
    """One Lagr update: Vl + Vh(+RNN, global info) fits, Lagrangian-blended
    policy step, and the multiplier dual ascent (informarl_lagr.py:286-309)."""
    from dgppo_fov_tpu.utils.ref_remap import remap_policy_params, remap_value_params

    env_r, env_o, algo_r, algo_o = build_pair("informarl_lagr")
    ro_r, ro_o = parity_rollouts.ro_r, parity_rollouts.ro_o
    transfer_params(algo_r, algo_o, with_vh=True)

    np.testing.assert_array_equal(np.asarray(algo_r.ah_lagr), np.asarray(algo_o.ah_lagr))
    batch_idx, rnn_chunk_ids = ref_plans(ro_r)

    Vl_r, Vh_r, pol_r, lagr_r, info_r = algo_r.update_inner(
        algo_r.Vl_train_state, algo_r.Vh_train_state, algo_r.policy_train_state,
        algo_r.ah_lagr, ro_r, batch_idx, rnn_chunk_ids,
    )
    Vl_o, Vh_o, pol_o, lagr_o, info_o = algo_o.update_inner(
        algo_o.Vl_train_state, algo_o.Vh_train_state, algo_o.policy_train_state,
        algo_o.ah_lagr, ro_o, jnp.array(BATCH_IDX),
    )

    assert_metrics_close(info_r, info_o, (
        "Vl/loss", "Vl/grad_norm", "Vh/loss", "Vh/grad_norm", "Vh/max_target", "Vh/min_target",
        "policy/loss", "policy/grad_norm", "policy/clip_frac", "policy/total_variation_dist",
        "policy/lagr_mean",
    ))
    np.testing.assert_allclose(np.asarray(lagr_r), np.asarray(lagr_o), rtol=1e-6, atol=1e-9)
    assert_params_close(remap_policy_params(pol_r.params), pol_o.params, "policy")
    assert_params_close(remap_value_params(Vl_r.params), Vl_o.params, "Vl")
    assert_params_close(remap_value_params(Vh_r.params), Vh_o.params, "Vh")


def test_dgppo_update_parity(ref_oracle, parity_rollouts):
    """One DGPPO update: shared det rollout, stateless-Vh paths with the
    policy-carry bootstrap (dgppo.py:219-229), CBF-fused gated advantage
    (dgppo.py:246-259), Vh fit to det-rollout GAE targets (dgppo.py:296-321)."""
    from dgppo_fov_tpu.utils.ref_remap import remap_policy_params, remap_value_params

    env_r, env_o, algo_r, algo_o = build_pair("dgppo")
    ro_r, ro_o = parity_rollouts.ro_r, parity_rollouts.ro_o
    det_r, det_o = parity_rollouts.det_r, parity_rollouts.det_o

    transfer_params(algo_r, algo_o, with_vh=True)
    batch_idx, rnn_chunk_ids = ref_plans(ro_r)
    step = jnp.array(0)

    Vl_r, Vh_r, pol_r, info_r = algo_r.update_inner(
        algo_r.Vl_train_state, algo_r.Vh_train_state, algo_r.policy_train_state,
        ro_r, det_r, batch_idx, rnn_chunk_ids, step,
    )
    Vl_o, Vh_o, pol_o, info_o = algo_o.update_inner(
        algo_o.Vl_train_state, algo_o.Vh_train_state, algo_o.policy_train_state,
        ro_o, det_o, jnp.array(BATCH_IDX), step,
    )

    assert_metrics_close(info_r, info_o, (
        "Vl/loss", "Vl/grad_norm", "Vh/loss_Vh", "Vh/grad_Vh_norm",
        "policy/loss", "policy/grad_norm", "policy/clip_frac", "policy/total_variation_dist",
        "eval/safe_data",
    ))
    assert_params_close(remap_policy_params(pol_r.params), pol_o.params, "policy")
    assert_params_close(remap_value_params(Vl_r.params), Vl_o.params, "Vl")
    assert_params_close(remap_value_params(Vh_r.params), Vh_o.params, "Vh")


def test_hcbfcrpo_update_parity(ref_oracle, parity_rollouts):
    """One HCBFCRPO update: the CBF path reads the env's analytic cost
    (hcbfcrpo.py:90-93) instead of a trained Vh; otherwise DGPPO's merge."""
    from dgppo_fov_tpu.utils.ref_remap import remap_policy_params, remap_value_params

    env_r, env_o, algo_r, algo_o = build_pair("hcbfcrpo")
    ro_r, ro_o = parity_rollouts.ro_r, parity_rollouts.ro_o
    transfer_params(algo_r, algo_o, with_vh=False)
    batch_idx, rnn_chunk_ids = ref_plans(ro_r)
    step = jnp.array(0)

    Vl_r, pol_r, info_r = algo_r.update_inner(
        algo_r.Vl_train_state, algo_r.policy_train_state, ro_r, batch_idx, rnn_chunk_ids, step,
    )
    Vl_o, pol_o, info_o = algo_o.update_inner(
        algo_o.Vl_train_state, algo_o.policy_train_state, ro_o, jnp.array(BATCH_IDX), step,
    )

    assert_metrics_close(info_r, info_o, (
        "Vl/loss", "Vl/grad_norm", "policy/loss", "policy/grad_norm", "policy/clip_frac",
        "policy/total_variation_dist", "eval/safe_data",
    ))
    assert_params_close(remap_policy_params(pol_r.params), pol_o.params, "policy")
    assert_params_close(remap_value_params(Vl_r.params), Vl_o.params, "Vl")
