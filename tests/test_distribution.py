"""TanhNormal distribution: log_prob consistency, tails, entropy."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from dgppo_fov_tpu.nn.distribution import TanhNormalDistribution


def test_log_prob_matches_change_of_variables():
    mean = np.array([[0.3, -0.2]])
    std = np.array([[0.5, 0.7]])
    dist = TanhNormalDistribution(jnp.asarray(mean), jnp.asarray(std))
    y = np.array([[0.0997, -0.3799]])

    # Manual float64: N(atanh(y); mean, std) density / |dy/dx|
    x = np.arctanh(y.astype(np.float64))
    lp_norm = -0.5 * ((x - mean) / std) ** 2 - np.log(std) - 0.5 * math.log(2 * math.pi)
    ldj = np.log1p(-np.tanh(x) ** 2)
    expected = (lp_norm - ldj).sum(-1)
    got = dist.log_prob(jnp.asarray(y, dtype=jnp.float32))
    # f32 atanh/tanh roundtrip costs ~2e-4; this is a semantics check.
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-3, atol=2e-3)


def test_log_prob_tails_finite():
    dist = TanhNormalDistribution(jnp.zeros((3, 2)), 0.5 * jnp.ones((3, 2)))
    y = jnp.array([[1.0, -1.0], [0.9999, -0.9999], [0.0, 0.0]])
    lp = dist.log_prob(y)
    assert np.all(np.isfinite(np.asarray(lp)))


def test_sample_and_log_prob_shapes():
    dist = TanhNormalDistribution(jnp.zeros((4, 3)), jnp.ones((4, 3)))
    a = dist.sample(jax.random.PRNGKey(0))
    assert a.shape == (4, 3)
    assert np.all(np.abs(np.asarray(a)) <= 1.0)
    assert dist.log_prob(a).shape == (4,)
    assert dist.mode().shape == (4, 3)
    assert dist.entropy(jax.random.PRNGKey(1)).shape == (4,)


def test_log_prob_integrates_to_one_1d():
    # Monte-Carlo check: E_y[1] under the density via importance on a grid.
    mean = jnp.array([0.2])
    std = jnp.array([0.6])
    dist = TanhNormalDistribution(mean[None], std[None])
    ys = jnp.linspace(-0.9989, 0.9989, 20001)
    lps = jax.vmap(lambda y: dist.log_prob(y[None, None]))(ys).squeeze()
    integral = jnp.trapezoid(jnp.exp(lps), ys)
    assert abs(float(integral) - 1.0) < 5e-3
