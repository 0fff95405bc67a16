"""Stacked Vl+policy evaluation (algo/stacked.py) must equal the separate
network applies — forward outputs, and the full update step.

The stacked forward computes the same dot products through double-width
kernels (concat / block-diagonal), so outputs match to f32 accumulation
order (~1e-5 relative).
"""
import functools as ft

import jax
import jax.numpy as jnp
import jax.random as jr
import jax.tree_util as jtu
import numpy as np
import pytest

from dgppo_fov_tpu.algo import make_algo
from dgppo_fov_tpu.algo.stacked import StackedVlPolicy, build_stacked
from dgppo_fov_tpu.env import make_env


def _build(env_id, n_agents, num_obs, use_rnn=True, rnn_layers=1, stacked_update=True,
           algo="dgppo", **kw):
    env = make_env(env_id, num_agents=n_agents, num_obs=num_obs, max_step=8)
    algo = make_algo(
        algo=algo, env=env, node_dim=env.node_dim, edge_dim=env.edge_dim,
        state_dim=env.state_dim, action_dim=env.action_dim, n_agents=env.num_agents,
        batch_size=2 * 8, rnn_step=4, seed=0, use_rnn=use_rnn, rnn_layers=rnn_layers,
        train_steps=100, stacked_update=stacked_update, **kw,
    )
    return env, algo


def _random_graph(env, key):
    graph, _ = env.reset(key), None
    return graph


@pytest.mark.parametrize(
    "env_id,n_agents,num_obs",
    [("MPETarget", 3, 2), ("LidarTarget", 3, 2)],  # dense blocks / diag-chunk blocks
)
def test_stacked_forward_equals_separate(env_id, n_agents, num_obs):
    env, algo = _build(env_id, n_agents, num_obs)
    assert algo._stacked is not None, "stacked_update=True must take the stacked path"

    pi_params = algo.policy_train_state.params
    vl_params = algo.Vl_train_state.params
    # Non-zero carries so the GRU path is exercised beyond the first step.
    pi_carry = 0.1 * jr.normal(jr.PRNGKey(1), algo.init_rnn_state.shape)
    vl_carry = 0.1 * jr.normal(jr.PRNGKey(2), algo.init_Vl_rnn_state.shape)

    for seed in range(3):
        graph = _random_graph(env, jr.PRNGKey(seed)).without_env_states()

        dist_sep, pi_carry_sep = algo.policy.dist.apply(pi_params, graph, pi_carry)
        value_sep, vl_carry_sep = algo.Vl.net.apply(vl_params, graph, vl_carry)

        out = algo._stacked.eval_step(pi_params, vl_params, graph, pi_carry, vl_carry)

        np.testing.assert_allclose(np.asarray(out.dist.mean), np.asarray(dist_sep.mean), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.dist.std), np.asarray(dist_sep.std), rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(out.value), np.asarray(value_sep), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.pi_carry), np.asarray(pi_carry_sep), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.vl_carry), np.asarray(vl_carry_sep), rtol=1e-5, atol=1e-6)

        # March the carries forward so later seeds test evolved states.
        pi_carry, vl_carry = pi_carry_sep, vl_carry_sep


def test_stacked_forward_no_rnn():
    env, algo = _build("MPETarget", 3, 2, use_rnn=False)
    assert algo._stacked is not None
    graph = _random_graph(env, jr.PRNGKey(0)).without_env_states()
    pi_params = algo.policy_train_state.params
    vl_params = algo.Vl_train_state.params

    dist_sep, _ = algo.policy.dist.apply(pi_params, graph, algo.init_rnn_state)
    value_sep, _ = algo.Vl.net.apply(vl_params, graph, algo.init_Vl_rnn_state)
    out = algo._stacked.eval_step(pi_params, vl_params, graph, algo.init_rnn_state, algo.init_Vl_rnn_state)
    np.testing.assert_allclose(np.asarray(out.dist.mean), np.asarray(dist_sep.mean), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.value), np.asarray(value_sep), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("algo_name", ["dgppo", "informarl"])
def test_stacked_update_equals_separate_update(algo_name):
    """One full update with stacking ON vs OFF from identical state: every
    updated parameter leaf must agree (same rollout, same plans). The
    separate path is golden-tested leaf-by-leaf against the reference
    (tests/test_reference_parity_update*.py), so this transitively pins
    stacked-vs-reference parity in the suite (VERDICT r3 #4 — previously a
    one-off run documented in algo/stacked.py's docstring)."""
    import numpy as onp

    env, algo_on = _build("MPETarget", 3, 2, algo=algo_name)
    _, algo_off = _build("MPETarget", 3, 2, algo=algo_name, stacked_update=False)  # the default
    assert algo_on._stacked is not None and algo_off._stacked is None

    keys = jr.split(jr.PRNGKey(3), 4)
    rollout = algo_on.collect(algo_on.params, keys)

    onp.random.seed(0)
    info_on = algo_on.update(rollout, step=0)
    onp.random.seed(0)
    info_off = algo_off.update(rollout, step=0)

    for k in ("Vl/loss", "policy/loss", "policy/grad_norm", "policy/clip_frac", "Vl/grad_norm"):
        np.testing.assert_allclose(float(info_on[k]), float(info_off[k]), rtol=1e-4, atol=1e-6, err_msg=k)

    net_names = ("policy_train_state", "Vl_train_state") + (
        ("Vh_train_state",) if algo_name != "informarl" else ()
    )
    for name in net_names:
        p_on = getattr(algo_on, name).params
        p_off = getattr(algo_off, name).params
        for (path, a), (_, b) in zip(
            jtu.tree_flatten_with_path(p_on)[0], jtu.tree_flatten_with_path(p_off)[0]
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
                err_msg=f"{name} {jtu.keystr(path)}",
            )


def test_fallback_configs_use_separate_path():
    # LSTM and mismatched GNN depths must fall back, and still update.
    _, algo_lstm = _build("MPETarget", 3, 2, use_lstm=True)
    assert algo_lstm._stacked is None
    _, algo_depth = _build("MPETarget", 3, 2, actor_gnn_layers=2, Vl_gnn_layers=1)
    assert algo_depth._stacked is None
    keys = jr.split(jr.PRNGKey(0), 4)
    rollout = algo_depth.collect(algo_depth.params, keys)
    info = algo_depth.update(rollout, step=0)
    assert jnp.isfinite(info["policy/loss"])
