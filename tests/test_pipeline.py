"""Unit tests for the composable update-pipeline stages (algo/pipeline.py).

The stages are also covered end-to-end by the golden update-parity tests;
these are fast, shape-level numpy oracles for each stage in isolation, so a
regression localizes to one stage instead of 'update parity broke'.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgppo_fov_tpu.algo.pipeline import (
    CBFTerms,
    discrete_cbf,
    fuse_task_with_cbf,
    minibatch_plan,
    per_agent,
    ppo_clip_objective,
    time_normalized,
)


def test_time_normalized_axes():
    """Normalization is per-environment over time (axis 1), matching the
    reference's axes (informarl.py:334-336): each env row ends up ~N(0,1)
    regardless of the other envs."""
    rng = np.random.default_rng(0)
    adv = jnp.asarray(rng.normal(loc=[[5.0], [-3.0]], scale=[[2.0], [0.5]], size=(2, 64)))
    out = np.asarray(time_normalized(adv))
    np.testing.assert_allclose(out.mean(axis=1), 0.0, atol=1e-6)
    np.testing.assert_allclose(out.std(axis=1), 1.0, atol=1e-3)


def test_per_agent_tiles_team_signal():
    shared = jnp.arange(6.0).reshape(2, 3)
    out = per_agent(shared, n_agents=4)
    assert out.shape == (2, 3, 4)
    np.testing.assert_array_equal(np.asarray(out[..., 0]), np.asarray(shared))
    np.testing.assert_array_equal(np.asarray(out[..., 3]), np.asarray(shared))


def test_discrete_cbf_finite_difference():
    """rate = (Vh' - Vh)/dt + alpha*Vh against a hand-rolled oracle, and the
    condition bookkeeping: violation hinges at rate+eps, all_met ANDs over
    the constraint axis."""
    rng = np.random.default_rng(1)
    vh = rng.normal(size=(2, 5, 3, 4)).astype(np.float32)  # (b, T+1, a, h)
    dt, alpha, eps = 0.1, 10.0, 0.02
    terms = discrete_cbf(jnp.asarray(vh), dt=dt, alpha=alpha, eps=eps)
    want_rate = (vh[:, 1:] - vh[:, :-1]) / dt + alpha * vh[:, :-1]
    np.testing.assert_allclose(np.asarray(terms.rate), want_rate, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(terms.violation), np.maximum(want_rate + eps, 0.0), rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(terms.all_met), (want_rate <= 0).all(axis=-1)
    )


def test_fuse_task_with_cbf_gating_and_sign():
    """DGPPO's merge: task advantage survives only where ALL constraints
    meet the CBF condition; the worst violation is added weighted; the whole
    thing is negated (losses are minimized). reference dgppo.py:250-259."""
    task_adv = jnp.ones((1, 2, 2))
    rate = jnp.asarray(
        np.array([[[[-1.0, -1.0], [0.5, -1.0]], [[-1.0, -1.0], [-1.0, -1.0]]]], np.float32)
    )  # (1, 2, 2, 2): agent 1 at t=0 violates one constraint
    terms = CBFTerms(rate, jnp.maximum(rate + 0.0, 0.0), (rate <= 0).min(axis=-1))
    fused, safe_frac = fuse_task_with_cbf(task_adv, terms, weight=2.0)
    out = np.asarray(fused)
    # safe everywhere except (t=0, agent=1): 3/4 of the data is safe
    assert float(safe_frac) == pytest.approx(0.75)
    assert out[0, 0, 0] == pytest.approx(-1.0)  # -(adv + 0)
    assert out[0, 0, 1] == pytest.approx(-(0.0 + 0.5 * 2.0))  # gated adv, weighted viol
    assert out[0, 1, 0] == pytest.approx(-1.0)


def test_minibatch_plan_consumes_np_random_like_reference():
    """One np.random.shuffle of arange(n_env) (reference informarl.py:268-273)
    — seeded runs must reproduce, whole trajectories only, chunk table
    covers the horizon."""
    from dgppo_fov_tpu.trainer.data import Rollout

    n_env, T, rnn_step, batch = 8, 8, 4, 16
    dones = jnp.zeros((n_env, T))
    rollout = Rollout(
        graph=None, actions=None, rnn_states=None, rewards=None,
        costs=None, dones=dones, log_pis=None, final_graph=None,
    )

    np.random.seed(7)
    mb1 = minibatch_plan(rollout, batch_size=batch, rnn_step=rnn_step)
    np.random.seed(7)
    want = np.arange(n_env)
    np.random.shuffle(want)
    np.testing.assert_array_equal(np.asarray(mb1).reshape(-1), want)
    assert mb1.shape == (n_env * T // batch, batch // T)


def test_ppo_clip_objective_matches_oracle():
    rng = np.random.default_rng(3)
    logp_new = rng.normal(size=(32,)).astype(np.float32)
    logp_old = rng.normal(size=(32,)).astype(np.float32)
    adv = rng.normal(size=(32,)).astype(np.float32)
    eps = 0.25
    loss, metrics = ppo_clip_objective(
        jnp.asarray(logp_new), jnp.asarray(logp_old), jnp.asarray(adv), clip_eps=eps
    )
    ratio = np.exp(logp_new - logp_old)
    want = np.maximum(-ratio * adv, -np.clip(ratio, 1 - eps, 1 + eps) * adv).mean()
    np.testing.assert_allclose(float(loss), want, rtol=1e-6)
    assert 0.0 <= float(metrics["policy/clip_frac"]) <= 1.0
    np.testing.assert_allclose(
        float(metrics["policy/total_variation_dist"]), 0.5 * np.abs(ratio - 1).mean(), rtol=1e-6
    )
