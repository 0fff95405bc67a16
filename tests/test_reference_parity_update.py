"""Update-level golden parity: one InforMARL update step on the SAME rollout
with the SAME (transferred) parameters must produce the same updated
parameters in both frameworks.

Protocol:
 1. Build reference InforMARL (under shims); take the session-shared
    reference rollout (conftest.parity_rollouts, collected with the shared
    policy-init key stream).
 2. The rollout is converted to our layout (graphs rebuilt from typed states
    via our env.get_graph — bitwise-equal features by env parity;
    final_graph replaces per-step next_graph).
 3. Remap the reference params into our fused layout; both sides get fresh
    Adam states and identical minibatch/chunk index arrays (bypassing the
    host-side shuffle).
 4. Run each framework's update_inner; remap the reference's UPDATED params
    and compare leaf-by-leaf with ours (also loss/grad metrics).

coef_ent=0 because the reference's entropy estimator seeds its sample with a
trace-time np.random.randint (reference distribution.py:40-43; PARITY.md
divergence #1) — with the entropy bonus disabled the losses and gradients are
deterministic functions of the shared inputs.
tests/test_reference_parity_update_entropy.py proves the coef_ent>0 case.
"""
import os

import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest

from .parity_common import (
    BATCH_IDX,
    REF_PATH,
    assert_metrics_close,
    assert_params_close,
    build_pair,
    ref_plans,
)

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_PATH), reason="reference repo not mounted")


def test_update_inner_parity(ref_oracle, parity_rollouts):
    from dgppo_fov_tpu.utils.ref_remap import remap_policy_params, remap_value_params

    from .parity_common import transfer_params

    env_r, env_o, algo_r, algo_o = build_pair("informarl")
    ro_r, ro_o = parity_rollouts.ro_r, parity_rollouts.ro_o
    assert ro_o.rnn_states.shape == ro_r.rnn_states.shape

    transfer_params(algo_r, algo_o, with_vh=False)
    batch_idx, rnn_chunk_ids = ref_plans(ro_r)
    step = jnp.array(0)

    Vl_r, pol_r, info_r = algo_r.update_inner(
        algo_r.Vl_train_state, algo_r.policy_train_state, ro_r, batch_idx, rnn_chunk_ids, step
    )
    Vl_o, pol_o, info_o = algo_o.update_inner(
        algo_o.Vl_train_state, algo_o.policy_train_state, ro_o, jnp.array(BATCH_IDX), step
    )

    # Metrics parity (entropy excluded: reference uses a trace-time seed).
    assert_metrics_close(info_r, info_o, (
        "Vl/loss", "Vl/grad_norm", "policy/loss", "policy/grad_norm", "policy/clip_frac",
        "policy/total_variation_dist", "Vl/max_target", "Vl/min_target", "policy/log_pi_min",
    ))

    # Updated-parameter parity: remap the reference's post-update params and
    # compare leaf-by-leaf with ours.
    assert_params_close(remap_policy_params(pol_r.params), pol_o.params, "policy")
    assert_params_close(remap_value_params(Vl_r.params), Vl_o.params, "Vl")
