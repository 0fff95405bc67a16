"""End-to-end algorithm tests: collect + update for DGPPO/InforMARL variants."""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from dgppo_fov_tpu.algo import make_algo
from dgppo_fov_tpu.env import make_env


def _make(algo_name, n_env=4, max_step=16, num_obs=0):
    env = make_env("MPETarget", num_agents=3, num_obs=num_obs, max_step=max_step)
    algo = make_algo(
        algo=algo_name,
        env=env,
        node_dim=env.node_dim,
        edge_dim=env.edge_dim,
        state_dim=env.state_dim,
        action_dim=env.action_dim,
        n_agents=env.num_agents,
        batch_size=n_env * max_step // 2,
        rnn_step=8,
        seed=0,
        train_steps=100,
    )
    return env, algo


def test_config_mutation_after_first_update_is_loud():
    """update_inner reads hyperparameters off static `self` at trace time, so
    a post-first-update mutation would be silently ignored by the cached
    executable. The freeze guard must turn that into an error (no compile
    needed to test: the guard runs before the jit call)."""
    _, algo = _make("dgppo")
    algo._assert_config_frozen()  # first call: freezes
    algo._assert_config_frozen()  # unchanged: fine
    algo.clip_eps = 0.5
    with pytest.raises(RuntimeError, match="hyperparameters changed"):
        algo._assert_config_frozen()


@pytest.mark.parametrize("algo_name", ["dgppo", "informarl", "informarl_lagr", "hcbfcrpo"])
def test_collect_and_update(algo_name):
    np.random.seed(0)
    n_env, max_step = 4, 16
    env, algo = _make(algo_name, n_env, max_step)

    keys = jr.split(jr.PRNGKey(1), n_env)
    rollout = algo.collect(algo.params, keys)

    assert rollout.rewards.shape == (n_env, max_step)
    assert rollout.costs.shape == (n_env, max_step, 3, env.n_cost)
    assert rollout.actions.shape == (n_env, max_step, 3, env.action_dim)
    assert rollout.log_pis.shape == (n_env, max_step, 3)
    assert np.all(np.isfinite(np.asarray(rollout.rewards)))
    assert np.all(np.isfinite(np.asarray(rollout.log_pis)))

    info = algo.update(rollout, step=0)
    assert np.isfinite(float(info["policy/loss"]))
    assert np.isfinite(float(info["Vl/loss"]))
    assert float(info["policy/has_nan"]) == 0.0
    assert float(info["Vl/has_nan"]) == 0.0


def test_update_changes_params_and_act_deterministic():
    np.random.seed(0)
    n_env, max_step = 4, 16
    env, algo = _make("dgppo", n_env, max_step)
    params_before = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), algo.params)

    keys = jr.split(jr.PRNGKey(2), n_env)
    rollout = algo.collect(algo.params, keys)
    algo.update(rollout, step=0)

    leaves_before = jax.tree_util.tree_leaves(params_before["policy"])
    leaves_after = jax.tree_util.tree_leaves(algo.params["policy"])
    assert any(not np.allclose(b, np.asarray(a)) for b, a in zip(leaves_before, leaves_after))

    # Deterministic act: same graph + state -> same action.
    graph = env.reset(jr.PRNGKey(3))
    a1, _ = algo.act(graph, algo.init_rnn_state)
    a2, _ = algo.act(graph, algo.init_rnn_state)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert np.all(np.abs(np.asarray(a1)) <= 1.0)


def test_save_load_roundtrip(tmp_path):
    np.random.seed(0)
    env, algo = _make("dgppo")
    algo.save(str(tmp_path), 7)
    env2, algo2 = _make("dgppo")
    algo2.load(str(tmp_path), 7)
    for l1, l2 in zip(
        jax.tree_util.tree_leaves(algo.params), jax.tree_util.tree_leaves(algo2.params)
    ):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_update_scans_match_stepwise_eval():
    """scan_eval_action / scan_Vl (the update loop's scanned re-evaluation,
    incl. jax.checkpoint) must agree with a plain step-by-step Python loop
    over eval_action / get_value."""
    np.random.seed(0)
    n_env, max_step = 2, 8
    env, algo = _make("dgppo", n_env, max_step)
    keys = jr.split(jr.PRNGKey(5), n_env)
    rollout = algo.collect(algo.params, keys)
    ro0 = jax.tree_util.tree_map(lambda x: x[0], rollout)

    # Policy: step-by-step eval vs scan_eval_action.
    actor_params = algo.policy_train_state.params
    T_keys = jr.split(jr.PRNGKey(7), max_step)
    rnn = algo.init_rnn_state
    ref_logpis, ref_ent = [], []
    for t in range(max_step):
        g_t = jax.tree_util.tree_map(lambda x: x[t], ro0.graph)
        lp, ent, rnn = algo.policy.eval_action(
            actor_params, g_t, ro0.actions[t], rnn, T_keys[t]
        )
        ref_logpis.append(np.asarray(lp))
        ref_ent.append(np.asarray(ent))
    got_logpis, got_ent, _, _ = algo.scan_eval_action(
        ro0.graph, ro0.actions, algo.init_rnn_state, T_keys, actor_params
    )
    np.testing.assert_allclose(np.asarray(got_logpis), np.stack(ref_logpis), rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_ent), np.stack(ref_ent), rtol=0, atol=1e-5)

    # Vl: step-by-step get_value vs scan_Vl.
    Vl_params = algo.Vl_train_state.params
    rnn = algo.init_Vl_rnn_state
    ref_vl = []
    for t in range(max_step):
        g_t = jax.tree_util.tree_map(lambda x: x[t], ro0.graph)
        v, rnn = algo.Vl.get_value(Vl_params, g_t, rnn)
        ref_vl.append(float(v.squeeze()))
    got_vl, _, _ = algo.scan_Vl(ro0, algo.init_Vl_rnn_state, Vl_params)
    np.testing.assert_allclose(np.asarray(got_vl), np.asarray(ref_vl), rtol=0, atol=1e-5)


@pytest.mark.parametrize("kw", [dict(use_lstm=True), dict(use_rnn=False)])
def test_collect_and_update_rnn_variants(kw):
    """CLI-reachable network variants (--use-lstm, --no-rnn,
    reference train.py use_lstm/no_rnn flags) train end-to-end."""
    np.random.seed(0)
    n_env, max_step = 4, 16
    env = make_env("MPETarget", num_agents=3, num_obs=0, max_step=max_step)
    algo = make_algo(
        algo="dgppo",
        env=env,
        node_dim=env.node_dim,
        edge_dim=env.edge_dim,
        state_dim=env.state_dim,
        action_dim=env.action_dim,
        n_agents=env.num_agents,
        batch_size=n_env * max_step // 2,
        rnn_step=8,
        seed=0,
        train_steps=100,
        **kw,
    )
    rollout = algo.collect(algo.params, jr.split(jr.PRNGKey(1), n_env))
    assert np.all(np.isfinite(np.asarray(rollout.log_pis)))
    info = algo.update(rollout, step=0)
    assert np.isfinite(float(info["policy/loss"]))
    assert float(info["policy/has_nan"]) == 0.0


def test_constraint_path_env_chunking_is_exact():
    """The lax.map env-chunked whole-rollout Vh forward (VH_FWD_ENV_CHUNK,
    added to fit n_env>2048 updates in HBM) must equal the unchunked vmap
    bitwise — same reduction order per env, only the batch walked in pieces."""
    np.random.seed(0)
    n_env, max_step = 8, 16
    env, algo = _make("dgppo", n_env, max_step)

    keys = jr.split(jr.PRNGKey(3), n_env)
    rollout = algo.collect(algo.params, keys)
    from dgppo_fov_tpu.algo.pipeline import strip_env_states

    rollout = strip_env_states(rollout)

    path = lambda: jax.jit(
        lambda ro: algo._constraint_path(ro, algo.params["Vh"], algo.params["policy"])
    )(rollout)
    unchunked = np.asarray(path())  # n_env <= VH_FWD_ENV_CHUNK: plain vmap
    algo.VH_FWD_ENV_CHUNK = 2  # instance override: 4 chunks of 2 envs
    chunked = np.asarray(path())
    assert unchunked.shape[:2] == (n_env, max_step + 1)
    np.testing.assert_array_equal(unchunked, chunked)
    algo.VH_FWD_ENV_CHUNK = 3  # uneven split: 3 chunks of 3 with 1 pad env
    padded = np.asarray(path())
    np.testing.assert_array_equal(unchunked, padded)


def test_update_with_env_chunking_matches_unchunked():
    """One full DGPPO update with the chunked constraint path equals the
    unchunked update leaf-by-leaf."""
    np.random.seed(0)
    n_env, max_step = 8, 16

    def run(chunk):
        np.random.seed(0)
        env, algo = _make("dgppo", n_env, max_step)
        if chunk is not None:
            algo.VH_FWD_ENV_CHUNK = chunk
        rollout = algo.collect(algo.params, jr.split(jr.PRNGKey(4), n_env))
        algo.update(rollout, step=0)
        return jax.tree_util.tree_map(np.asarray, algo.params)

    base, chunked = run(None), run(2)
    jax.tree_util.tree_map(np.testing.assert_array_equal, base, chunked)
