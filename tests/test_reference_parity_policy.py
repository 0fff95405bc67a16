"""Policy/value transfer parity: remap the ACTUAL reference's trained params
into this framework's fused layouts (utils/ref_remap.py) and verify both
frameworks produce the same network outputs on the same environment state.

This closes the loop on the whole model stack: graph features, masked-dense
attention == segment softmax, MLP head, GRU carry, scaled output heads,
TanhNormal mode/log_prob — numerically, against the reference itself.
"""
import os
import sys

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

REF_PATH = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_PATH), reason="reference repo not mounted")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


@pytest.fixture(scope="module")
def pair():
    from ref_oracle.shims import import_reference

    import_reference(REF_PATH)
    from dgppo.algo import make_algo as ref_make_algo
    from dgppo.env import make_env as ref_make_env

    from dgppo_fov_tpu.algo import make_algo as our_make_algo
    from dgppo_fov_tpu.env import make_env as our_make_env

    kw = dict(num_agents=3, num_obs=2, max_step=16)
    env_r = ref_make_env("MPETarget", **kw)
    env_o = our_make_env("MPETarget", **kw)
    akw = dict(
        node_dim=env_r.node_dim,
        edge_dim=env_r.edge_dim,
        state_dim=env_r.state_dim,
        action_dim=env_r.action_dim,
        n_agents=3,
        cost_weight=0.0,
        batch_size=64,
        rnn_step=8,
        seed=0,
        use_rnn=True,
        train_steps=100,
    )
    algo_r = ref_make_algo(algo="dgppo", env=env_r, **akw)
    algo_o = our_make_algo(algo="dgppo", env=env_o, **akw)
    return env_r, env_o, algo_r, algo_o


def test_policy_transfer_action_parity(pair):
    """Reference params remapped into our layout => identical actions."""
    from dgppo_fov_tpu.utils.ref_remap import remap_policy_params

    env_r, env_o, algo_r, algo_o = pair
    our_policy_params = remap_policy_params(algo_r.params["policy"])

    # Same leaf count/shapes as a natively initialized policy.
    ours_native = algo_o.params["policy"]
    leaves_r = jax.tree_util.tree_leaves(our_policy_params)
    leaves_o = jax.tree_util.tree_leaves(ours_native)
    assert len(leaves_r) == len(leaves_o)
    for a, b in zip(leaves_r, leaves_o):
        assert a.shape == b.shape

    rnn_r = jnp.zeros_like(algo_r.init_rnn_state)
    rnn_o = jnp.zeros_like(algo_o.init_rnn_state)

    for seed in (0, 1, 2):
        key = jr.PRNGKey(seed)
        g_r = env_r.reset(key)
        g_o = env_o.reset(key)
        a_r, new_rnn_r = algo_r.policy.get_action(algo_r.params["policy"], g_r, rnn_r)
        a_o, new_rnn_o = algo_o.policy.get_action({"params": our_policy_params["params"]}, g_o, rnn_o)
        np.testing.assert_allclose(np.asarray(a_r), np.asarray(a_o), rtol=1e-5, atol=1e-5)
        # Recurrent: carry forward matches too (shapes differ only by layout).
        np.testing.assert_allclose(
            np.asarray(new_rnn_r).reshape(-1), np.asarray(new_rnn_o).reshape(-1), rtol=1e-5, atol=1e-5
        )
        rnn_r, rnn_o = new_rnn_r, new_rnn_o


def test_policy_transfer_log_prob_parity(pair):
    """eval_action log-probs of a fixed action sequence match after remap."""
    from dgppo_fov_tpu.utils.ref_remap import remap_policy_params

    env_r, env_o, algo_r, algo_o = pair
    our_policy_params = remap_policy_params(algo_r.params["policy"])

    g_r = env_r.reset(jr.PRNGKey(9))
    g_o = env_o.reset(jr.PRNGKey(9))
    action = jnp.array([[0.3, -0.5], [0.95, 0.0], [-0.9995, 0.4]])
    key = jr.PRNGKey(11)

    lp_r, _, _ = algo_r.policy.eval_action(
        algo_r.params["policy"], g_r, action, jnp.zeros_like(algo_r.init_rnn_state), key
    )
    lp_o, _, _ = algo_o.policy.eval_action(
        {"params": our_policy_params["params"]}, g_o, action, jnp.zeros_like(algo_o.init_rnn_state), key
    )
    np.testing.assert_allclose(np.asarray(lp_r), np.asarray(lp_o), rtol=1e-5, atol=1e-5)


def test_value_transfer_parity(pair):
    """Vl (centralized) and Vh (decomposed) outputs match after remap."""
    from dgppo_fov_tpu.utils.ref_remap import remap_value_params

    env_r, env_o, algo_r, algo_o = pair
    g_r = env_r.reset(jr.PRNGKey(4))
    g_o = env_o.reset(jr.PRNGKey(4))

    vl_params = remap_value_params(algo_r.params["Vl"])
    vl_r, _ = algo_r.Vl.get_value(algo_r.params["Vl"], g_r, jnp.zeros_like(algo_r.init_Vl_rnn_state))
    vl_o, _ = algo_o.Vl.get_value(
        {"params": vl_params["params"]}, g_o, jnp.zeros_like(algo_o.init_Vl_rnn_state)
    )
    np.testing.assert_allclose(np.asarray(vl_r), np.asarray(vl_o), rtol=1e-5, atol=1e-5)

    vh_params = remap_value_params(algo_r.params["Vh"])
    vh_r = algo_r.get_Vh(g_r, jnp.zeros_like(algo_r.init_rnn_state), algo_r.params)
    vh_o = algo_o.get_Vh(g_o, jnp.zeros_like(algo_o.init_rnn_state), {"Vh": {"params": vh_params["params"]}})
    np.testing.assert_allclose(np.asarray(vh_r), np.asarray(vh_o), rtol=1e-5, atol=1e-5)


def test_checkpoint_file_migration(pair, tmp_path):
    """Reference save() -> load_reference_checkpoint() round-trip end to end."""
    from dgppo_fov_tpu.utils.ref_remap import load_reference_checkpoint

    env_r, env_o, algo_r, algo_o = pair
    algo_r.save(str(tmp_path), 7)
    migrated = load_reference_checkpoint(os.path.join(str(tmp_path), "7"))
    assert set(migrated.keys()) == {"policy", "Vl", "Vh"}

    g_r = env_r.reset(jr.PRNGKey(21))
    g_o = env_o.reset(jr.PRNGKey(21))
    a_r, _ = algo_r.policy.get_action(algo_r.params["policy"], g_r, jnp.zeros_like(algo_r.init_rnn_state))
    a_o, _ = algo_o.policy.get_action(migrated["policy"], g_o, jnp.zeros_like(algo_o.init_rnn_state))
    np.testing.assert_allclose(np.asarray(a_r), np.asarray(a_o), rtol=1e-5, atol=1e-5)


def test_policy_transfer_action_parity_lstm():
    """Same as test_policy_transfer_action_parity but with use_lstm=True:
    the LSTM cell remap (LSTMCell_N renumbering) and our stacked (c, h)
    carry layout must reproduce the reference's recurrent policy exactly.
    (Deliberately does NOT use the module-scoped GRU `pair` fixture — it
    builds its own use_lstm pair.)"""
    from ref_oracle.shims import import_reference

    import_reference(REF_PATH)
    from dgppo.algo import make_algo as ref_make_algo
    from dgppo.env import make_env as ref_make_env

    from dgppo_fov_tpu.algo import make_algo as our_make_algo
    from dgppo_fov_tpu.env import make_env as our_make_env
    from dgppo_fov_tpu.utils.ref_remap import remap_policy_params

    kw = dict(num_agents=3, num_obs=2, max_step=16)
    env_r = ref_make_env("MPETarget", **kw)
    env_o = our_make_env("MPETarget", **kw)
    akw = dict(
        node_dim=env_r.node_dim,
        edge_dim=env_r.edge_dim,
        state_dim=env_r.state_dim,
        action_dim=env_r.action_dim,
        n_agents=3,
        cost_weight=0.0,
        batch_size=64,
        rnn_step=8,
        seed=0,
        use_rnn=True,
        use_lstm=True,
        train_steps=100,
    )
    algo_r = ref_make_algo(algo="informarl", env=env_r, **akw)
    algo_o = our_make_algo(algo="informarl", env=env_o, **akw)

    our_policy_params = remap_policy_params(algo_r.params["policy"])
    rnn_r = jnp.zeros_like(algo_r.init_rnn_state)
    rnn_o = jnp.zeros_like(algo_o.init_rnn_state)
    assert rnn_o.shape[-2] == 2  # (n_layers, n_agents, n_carries=2, hid)

    for seed in (0, 1):
        key = jr.PRNGKey(seed)
        g_r = env_r.reset(key)
        g_o = env_o.reset(key)
        a_r, new_rnn_r = algo_r.policy.get_action(algo_r.params["policy"], g_r, rnn_r)
        a_o, new_rnn_o = algo_o.policy.get_action({"params": our_policy_params["params"]}, g_o, rnn_o)
        np.testing.assert_allclose(np.asarray(a_r), np.asarray(a_o), rtol=1e-5, atol=1e-5)
        # Layout-sensitive carry check: same flat order, not just same
        # multiset (a (c,h) swap or agent transposition must fail here).
        np.testing.assert_allclose(
            np.asarray(new_rnn_r).reshape(np.asarray(new_rnn_o).shape),
            np.asarray(new_rnn_o),
            rtol=1e-5,
            atol=1e-5,
        )
        rnn_r, rnn_o = new_rnn_r, new_rnn_o
