"""Update-level golden parity for the three DERIVED algorithms (round-2
VERDICT missing #1): one full update step on the SAME rollout with the SAME
(transferred) parameters must produce the same updated parameters
leaf-by-leaf in both frameworks — for InforMARLLagr (multiplier ascent,
reference informarl_lagr.py:164-309), DGPPO (det-rollout Vh fit + CBF-fused
advantage, reference dgppo.py:188-321), and HCBFCRPO (analytic CBF,
reference hcbfcrpo.py:118-205).

Protocol (same as tests/test_reference_parity_update.py, which covers the
InforMARL base): reference collects the rollout(s); they are converted to our
layout via our env.get_graph (bitwise-equal features by env parity); params
are remapped into our fused layout; both update_inners run with identical
minibatch/chunk plans (bypassing the host-side shuffle); the reference's
UPDATED params are remapped and compared leaf-by-leaf. coef_ent=0 because
the reference's entropy estimator seeds its sample at trace time
(reference distribution.py:40-43; PARITY.md divergence #1).
"""
import os
import sys

import jax
import jax.numpy as jnp
import jax.random as jr
import jax.tree_util as jtu
import numpy as np
import pytest

REF_PATH = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_PATH), reason="reference repo not mounted")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from .test_reference_parity_update import B, N_AGENTS, N_OBS, T, _convert_rollout  # noqa: E402

ALGO_KW = dict(
    n_agents=N_AGENTS,
    cost_weight=0.0,
    batch_size=2 * T,  # 2 envs per minibatch
    rnn_step=4,
    seed=0,
    use_rnn=True,
    coef_ent=0.0,
    train_steps=100,
)
BATCH_IDX = np.array([[0, 1], [2, 3]])


@pytest.fixture(scope="module")
def ref():
    from ref_oracle.shims import import_reference

    return import_reference(REF_PATH)


def _build_pair(ref, algo_name):
    from dgppo.algo import make_algo as ref_make_algo
    from dgppo.env import make_env as ref_make_env

    from dgppo_fov_tpu.algo import make_algo as our_make_algo
    from dgppo_fov_tpu.env import make_env as our_make_env

    env_r = ref_make_env("MPETarget", num_agents=N_AGENTS, num_obs=N_OBS, max_step=T)
    env_o = our_make_env("MPETarget", num_agents=N_AGENTS, num_obs=N_OBS, max_step=T)
    dims = lambda env: dict(
        node_dim=env.node_dim, edge_dim=env.edge_dim,
        state_dim=env.state_dim, action_dim=env.action_dim,
    )
    algo_r = ref_make_algo(algo=algo_name, env=env_r, **dims(env_r), **ALGO_KW)
    algo_o = our_make_algo(algo=algo_name, env=env_o, **dims(env_o), **ALGO_KW)
    return env_r, env_o, algo_r, algo_o


def _transfer_params(algo_r, algo_o, with_vh: bool):
    """Move the reference's fresh-init params into our train states.

    Deep-copies because both update_inners donate their train-state buffers
    and the remap shares unfused leaves with the reference's param tree.
    """
    from dgppo_fov_tpu.utils.ref_remap import remap_policy_params, remap_value_params

    copy = lambda tree: jtu.tree_map(lambda x: jnp.array(x), tree)
    algo_o.policy_train_state = algo_o.policy_train_state.replace(
        params=copy(remap_policy_params(algo_r.params["policy"]))
    )
    algo_o.Vl_train_state = algo_o.Vl_train_state.replace(
        params=copy(remap_value_params(algo_r.params["Vl"]))
    )
    if with_vh:
        algo_o.Vh_train_state = algo_o.Vh_train_state.replace(
            params=copy(remap_value_params(algo_r.params["Vh"]))
        )
    algo_o.key = algo_r.key


def _collect_converted(env_o, algo_r, key):
    """Reference stochastic rollout + its conversion to our layout."""
    ro_r = algo_r.collect(algo_r.params, jr.split(key, B))
    ro_o = _convert_rollout(env_o, ro_r)
    ro_o = ro_o._replace(
        graph=ro_o.graph.without_env_states(), final_graph=ro_o.final_graph.without_env_states()
    )
    return ro_r, ro_o


def _assert_metrics_close(info_r, info_o, keys):
    for k in keys:
        np.testing.assert_allclose(
            float(info_r[k]), float(info_o[k]), rtol=2e-3, atol=2e-4, err_msg=k
        )


def _assert_params_close(mapped_ref, ours, label):
    flat_r, _ = jtu.tree_flatten_with_path(mapped_ref)
    flat_o, _ = jtu.tree_flatten_with_path(ours)
    assert len(flat_r) == len(flat_o)
    for (path_r, leaf_r), (path_o, leaf_o) in zip(flat_r, flat_o):
        assert jtu.keystr(path_r) == jtu.keystr(path_o)
        np.testing.assert_allclose(
            np.asarray(leaf_r), np.asarray(leaf_o), rtol=5e-3, atol=1e-5,
            err_msg=f"{label} {jtu.keystr(path_r)}",
        )


def _ref_plans(ro_r):
    batch_idx = jnp.array(BATCH_IDX)
    rnn_chunk_ids = jnp.arange(ro_r.dones.shape[1]).reshape(-1, ALGO_KW["rnn_step"])
    return batch_idx, rnn_chunk_ids


def test_informarl_lagr_update_parity(ref):
    """One Lagr update: Vl + Vh(+RNN, global info) fits, Lagrangian-blended
    policy step, and the multiplier dual ascent (informarl_lagr.py:286-309)."""
    from dgppo_fov_tpu.utils.ref_remap import remap_policy_params, remap_value_params

    env_r, env_o, algo_r, algo_o = _build_pair(ref, "informarl_lagr")
    ro_r, ro_o = _collect_converted(env_o, algo_r, jr.PRNGKey(7))
    _transfer_params(algo_r, algo_o, with_vh=True)

    np.testing.assert_array_equal(np.asarray(algo_r.ah_lagr), np.asarray(algo_o.ah_lagr))
    batch_idx, rnn_chunk_ids = _ref_plans(ro_r)

    Vl_r, Vh_r, pol_r, lagr_r, info_r = algo_r.update_inner(
        algo_r.Vl_train_state, algo_r.Vh_train_state, algo_r.policy_train_state,
        algo_r.ah_lagr, ro_r, batch_idx, rnn_chunk_ids,
    )
    Vl_o, Vh_o, pol_o, lagr_o, info_o = algo_o.update_inner(
        algo_o.Vl_train_state, algo_o.Vh_train_state, algo_o.policy_train_state,
        algo_o.ah_lagr, ro_o, jnp.array(BATCH_IDX),
    )

    _assert_metrics_close(info_r, info_o, (
        "Vl/loss", "Vl/grad_norm", "Vh/loss", "Vh/grad_norm", "Vh/max_target", "Vh/min_target",
        "policy/loss", "policy/grad_norm", "policy/clip_frac", "policy/total_variation_dist",
        "policy/lagr_mean",
    ))
    np.testing.assert_allclose(np.asarray(lagr_r), np.asarray(lagr_o), rtol=1e-6, atol=1e-9)
    _assert_params_close(remap_policy_params(pol_r.params), pol_o.params, "policy")
    _assert_params_close(remap_value_params(Vl_r.params), Vl_o.params, "Vl")
    _assert_params_close(remap_value_params(Vh_r.params), Vh_o.params, "Vh")


def test_dgppo_update_parity(ref):
    """One DGPPO update: det-rollout conversion, stateless-Vh paths with the
    policy-carry bootstrap (dgppo.py:219-229), CBF-fused gated advantage
    (dgppo.py:246-259), Vh fit to det-rollout GAE targets (dgppo.py:296-321)."""
    from dgppo_fov_tpu.utils.ref_remap import remap_policy_params, remap_value_params

    env_r, env_o, algo_r, algo_o = _build_pair(ref, "dgppo")
    ro_r, ro_o = _collect_converted(env_o, algo_r, jr.PRNGKey(7))

    # The det rollout is collected ONCE (by the reference) and shared, so the
    # test isolates update math from rollout parity (which has its own tests).
    det_r = algo_r.det_rollout_fn(algo_r.params, jr.split(jr.PRNGKey(11), B))
    det_o = _convert_rollout(env_o, det_r)
    det_o = det_o._replace(
        graph=det_o.graph.without_env_states(), final_graph=det_o.final_graph.without_env_states()
    )

    _transfer_params(algo_r, algo_o, with_vh=True)
    batch_idx, rnn_chunk_ids = _ref_plans(ro_r)
    step = jnp.array(0)

    Vl_r, Vh_r, pol_r, info_r = algo_r.update_inner(
        algo_r.Vl_train_state, algo_r.Vh_train_state, algo_r.policy_train_state,
        ro_r, det_r, batch_idx, rnn_chunk_ids, step,
    )
    Vl_o, Vh_o, pol_o, info_o = algo_o.update_inner(
        algo_o.Vl_train_state, algo_o.Vh_train_state, algo_o.policy_train_state,
        ro_o, det_o, jnp.array(BATCH_IDX), step,
    )

    _assert_metrics_close(info_r, info_o, (
        "Vl/loss", "Vl/grad_norm", "Vh/loss_Vh", "Vh/grad_Vh_norm",
        "policy/loss", "policy/grad_norm", "policy/clip_frac", "policy/total_variation_dist",
        "eval/safe_data",
    ))
    _assert_params_close(remap_policy_params(pol_r.params), pol_o.params, "policy")
    _assert_params_close(remap_value_params(Vl_r.params), Vl_o.params, "Vl")
    _assert_params_close(remap_value_params(Vh_r.params), Vh_o.params, "Vh")


def test_hcbfcrpo_update_parity(ref):
    """One HCBFCRPO update: the CBF path reads the env's analytic cost
    (hcbfcrpo.py:90-93) instead of a trained Vh; otherwise DGPPO's merge."""
    from dgppo_fov_tpu.utils.ref_remap import remap_policy_params, remap_value_params

    env_r, env_o, algo_r, algo_o = _build_pair(ref, "hcbfcrpo")
    ro_r, ro_o = _collect_converted(env_o, algo_r, jr.PRNGKey(7))
    _transfer_params(algo_r, algo_o, with_vh=False)
    batch_idx, rnn_chunk_ids = _ref_plans(ro_r)
    step = jnp.array(0)

    Vl_r, pol_r, info_r = algo_r.update_inner(
        algo_r.Vl_train_state, algo_r.policy_train_state, ro_r, batch_idx, rnn_chunk_ids, step,
    )
    Vl_o, pol_o, info_o = algo_o.update_inner(
        algo_o.Vl_train_state, algo_o.policy_train_state, ro_o, jnp.array(BATCH_IDX), step,
    )

    _assert_metrics_close(info_r, info_o, (
        "Vl/loss", "Vl/grad_norm", "policy/loss", "policy/grad_norm", "policy/clip_frac",
        "policy/total_variation_dist", "eval/safe_data",
    ))
    _assert_params_close(remap_policy_params(pol_r.params), pol_o.params, "policy")
    _assert_params_close(remap_value_params(Vl_r.params), Vl_o.params, "Vl")
