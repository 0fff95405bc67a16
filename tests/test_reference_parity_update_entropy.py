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
"""
import os
import sys

import jax.numpy as jnp
import jax.random as jr
import jax.tree_util as jtu
import numpy as np
import pytest

REF_PATH = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_PATH), reason="reference repo not mounted")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from .test_reference_parity_update import B, _convert_rollout  # noqa: E402
from .test_reference_parity_update_derived import (  # noqa: E402
    ALGO_KW,
    BATCH_IDX,
    _assert_metrics_close,
    _assert_params_close,
    _build_pair,
    _ref_plans,
    _transfer_params,
    ref,  # fixture
)

FIXED_K = 7321


def test_dgppo_update_parity_with_entropy_bonus(ref, monkeypatch):
    from dgppo_fov_tpu.utils.ref_remap import remap_policy_params, remap_value_params

    kw = dict(ALGO_KW, coef_ent=1e-2)  # the reference's DEFAULT entropy bonus

    from dgppo.algo import make_algo as ref_make_algo
    from dgppo.env import make_env as ref_make_env

    from dgppo_fov_tpu.algo import make_algo as our_make_algo
    from dgppo_fov_tpu.env import make_env as our_make_env

    T = kw["batch_size"] // 2
    env_r = ref_make_env("MPETarget", num_agents=3, num_obs=2, max_step=8)
    env_o = our_make_env("MPETarget", num_agents=3, num_obs=2, max_step=8)
    dims = lambda env: dict(
        node_dim=env.node_dim, edge_dim=env.edge_dim,
        state_dim=env.state_dim, action_dim=env.action_dim,
    )
    algo_r = ref_make_algo(algo="dgppo", env=env_r, **dims(env_r), **kw)
    algo_o = our_make_algo(algo="dgppo", env=env_o, **dims(env_o), **kw)

    ro_r = algo_r.collect(algo_r.params, jr.split(jr.PRNGKey(7), B))
    ro_o = _convert_rollout(env_o, ro_r)
    ro_o = ro_o._replace(
        graph=ro_o.graph.without_env_states(), final_graph=ro_o.final_graph.without_env_states()
    )
    det_r = algo_r.det_rollout_fn(algo_r.params, jr.split(jr.PRNGKey(11), B))
    det_o = _convert_rollout(env_o, det_r)
    det_o = det_o._replace(
        graph=det_o.graph.without_env_states(), final_graph=det_o.final_graph.without_env_states()
    )

    _transfer_params(algo_r, algo_o, with_vh=True)
    batch_idx, rnn_chunk_ids = _ref_plans(ro_r)
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
    _assert_metrics_close(info_r, info_o, (
        "Vl/loss", "Vl/grad_norm", "Vh/loss_Vh", "Vh/grad_Vh_norm",
        "policy/loss", "policy/grad_norm", "policy/clip_frac",
        "policy/total_variation_dist", "policy/entropy", "eval/safe_data",
    ))
    _assert_params_close(remap_policy_params(pol_r.params), pol_o.params, "policy")
    _assert_params_close(remap_value_params(Vl_r.params), Vl_o.params, "Vl")
    _assert_params_close(remap_value_params(Vh_r.params), Vh_o.params, "Vh")
