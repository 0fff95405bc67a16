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
