"""Opt-in bfloat16 compute mode: outputs stay finite and close to f32, and a
full DGPPO update step runs (mixed precision at the apply boundary — see
algo/modules.py `_cast_floats`)."""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np


def _make(compute_dtype):
    from dgppo_fov_tpu.algo import make_algo
    from dgppo_fov_tpu.env import make_env

    env = make_env("MPETarget", num_agents=3, num_obs=0, max_step=8)
    algo = make_algo(
        algo="dgppo",
        env=env,
        node_dim=env.node_dim,
        edge_dim=env.edge_dim,
        state_dim=env.state_dim,
        action_dim=env.action_dim,
        n_agents=3,
        batch_size=16,
        rnn_step=4,
        seed=0,
        train_steps=10,
        compute_dtype=compute_dtype,
    )
    return env, algo


def test_bf16_policy_close_to_f32():
    env32, a32 = _make(None)
    env16, a16 = _make("bfloat16")
    graph = env32.reset(jr.PRNGKey(0)).without_env_states()
    act32, rnn32 = a32.policy.get_action(a32.params["policy"], graph, a32.init_rnn_state)
    act16, rnn16 = a16.policy.get_action(a16.params["policy"], graph, a16.init_rnn_state)
    assert act16.dtype == jnp.float32
    assert rnn16.dtype == jnp.float32
    # Same seed => same f32 master params; bf16 compute should be close.
    np.testing.assert_allclose(np.asarray(act32), np.asarray(act16), atol=3e-2)
    assert np.isfinite(np.asarray(act16)).all()

    vl32, _ = a32.Vl.get_value(a32.params["Vl"], graph, a32.init_Vl_rnn_state)
    vl16, _ = a16.Vl.get_value(a16.params["Vl"], graph, a16.init_Vl_rnn_state)
    assert vl16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(vl32), np.asarray(vl16), atol=3e-2)


def test_bf16_full_update_runs():
    _, algo = _make("bfloat16")
    rollout = algo.collect(algo.params, jr.split(jr.PRNGKey(1), 4))
    info = algo.update(rollout, step=0)
    leaves = jax.tree_util.tree_leaves(info)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in leaves)
    assert float(info["policy/has_nan"]) == 0.0


def test_bf16_mode_is_actually_active():
    """Regression: compute_dtype used to be silently dropped by the
    InforMARLLagr/DGPPO constructors (everything ran f32 while --bf16 /
    BENCH_DTYPE claimed otherwise). The mode must reach all three networks
    and produce bf16-rounded (i.e. different-from-f32) outputs."""
    env32, a32 = _make(None)
    env16, a16 = _make("bfloat16")
    assert a16.policy.compute_dtype == jnp.bfloat16
    assert a16.Vl.compute_dtype == jnp.bfloat16
    assert a16.Vh.compute_dtype == jnp.bfloat16

    graph = env32.reset(jr.PRNGKey(0)).without_env_states()
    act32, _ = a32.policy.get_action(a32.params["policy"], graph, a32.init_rnn_state)
    act16, _ = a16.policy.get_action(a16.params["policy"], graph, a16.init_rnn_state)
    assert np.abs(np.asarray(act32) - np.asarray(act16)).max() > 0.0


def test_collapsed_sigma_update_stays_finite():
    """Regression for the r3 --bf16 death spiral (VERDICT r3 #1): once the
    policy std collapses to the bf16 noise floor, |logp_new - logp_old| runs
    into the hundreds (measured -1079 in logs/MPETarget/dgppo/
    seed0_819110834_QTBY) and exp() overflows — every later update was
    non-finite and apply_if_finite froze the optimizer for 2,500 steps.
    With the PPO_LOG_RATIO_CLAMP rail the same pathological log-ratios must
    yield a finite loss and a live (applied) update."""
    _, algo = _make("bfloat16")
    rollout = algo.collect(algo.params, jr.split(jr.PRNGKey(1), 4))
    # Reproduce the failure's rollout-side state: stored behavior log-probs
    # far below anything the current policy re-computes (diff ~ +1000).
    rollout = rollout._replace(log_pis=jnp.full_like(rollout.log_pis, -1000.0))
    info = algo.update(rollout, step=0)
    assert np.isfinite(float(info["policy/loss"]))
    assert float(info["policy/has_nan"]) == 0.0
    assert float(info["Vl/has_nan"]) == 0.0
    # The optimizer actually applied the step (not skipped by apply_if_finite).
    assert int(algo.policy_train_state.opt_state.notfinite_count) == 0


def test_ppo_ratio_clamp_is_identity_in_range():
    """The clamp must be bitwise-inert for every log-ratio a healthy run
    produces (f32 runs stay within ~±11): value and gradient both identical
    to the raw exp below the ±20 rail."""
    from dgppo_fov_tpu.algo.pipeline import PPO_LOG_RATIO_CLAMP, ppo_ratio

    logp_new = jnp.linspace(-19.0, 19.0, 41)
    logp_old = jnp.zeros_like(logp_new)
    np.testing.assert_array_equal(
        np.asarray(ppo_ratio(logp_new, logp_old)), np.asarray(jnp.exp(logp_new))
    )
    g_clamped = jax.grad(lambda x: ppo_ratio(x, 0.0))(11.0)
    g_raw = jax.grad(lambda x: jnp.exp(x - 0.0))(11.0)
    np.testing.assert_array_equal(np.asarray(g_clamped), np.asarray(g_raw))
    # And finite outside it.
    assert np.isfinite(float(ppo_ratio(jnp.float32(2000.0), jnp.float32(-2000.0))))
    assert PPO_LOG_RATIO_CLAMP == 20.0


def test_gnn_layers_stay_bf16():
    """Regression: the GNN softmax accumulators were f32 literals, silently
    promoting every non-restricted layer's output (and everything after it)
    back to f32 under bf16 mode. All paths must preserve the compute dtype."""
    import jax.tree_util as jtu

    from dgppo_fov_tpu.env import make_env
    from dgppo_fov_tpu.nn.gnn import GraphTransformerGNN

    env = make_env("MPETarget", num_agents=3, num_obs=2, max_step=8)
    graph = env.reset(jr.PRNGKey(0)).without_env_states()
    gnn = GraphTransformerGNN(msg_dim=32, out_dim=64, n_heads=3, n_layers=2)
    params = gnn.init(jr.PRNGKey(3), graph)  # f32 init (orthogonal needs LAPACK)
    params16 = jtu.tree_map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)
    graph16 = graph.replace(
        nodes=graph.nodes.astype(jnp.bfloat16),
        edges=tuple(e.astype(jnp.bfloat16) for e in graph.edges),
    )
    full = gnn.apply(params16, graph16)  # unrestricted path (all nodes)
    restricted = gnn.apply(params16, graph16, node_type=0)  # restricted final layer
    assert full.dtype == jnp.bfloat16
    assert restricted.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(full.astype(jnp.float32)).all())
