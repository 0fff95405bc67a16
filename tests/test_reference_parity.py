"""Cross-framework golden parity tests: run the ACTUAL reference code
(`/root/reference`, under the dependency shims in scripts/ref_oracle/shims.py)
against this framework on identical inputs.

These are the strongest parity checks in the suite: they compare against the
reference implementation itself, not against a re-derivation of its math.

Covered here:
 - reset parity: env.reset(key) consumes PRNG identically => bitwise-equal
   agent/goal/obstacle states (MPETarget, MPESpread, LidarTarget).
 - dynamics parity: same state + same action sequence => same trajectory.
 - reward/cost parity on matched states.
 - Dec-EFOCP GAE: bitwise vs the reference compute_dec_ocp_gae.
 - TanhNormal distribution: log_prob / mode / sample vs the reference
   TanhTransformedDistribution running on the tfp shim.
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
def ref():
    from ref_oracle.shims import import_reference

    return import_reference(REF_PATH)


# ---------------------------------------------------------------------------
# Environment parity
# ---------------------------------------------------------------------------
def _ref_env(ref, env_id, n_agents, n_obs, max_step=16):
    from dgppo.env import make_env

    return make_env(env_id, num_agents=n_agents, num_obs=n_obs, max_step=max_step)


def _our_env(env_id, n_agents, n_obs, max_step=16):
    from dgppo_fov_tpu.env import make_env

    return make_env(env_id, num_agents=n_agents, num_obs=n_obs, max_step=max_step)


@pytest.mark.parametrize("env_id,n_obs", [("MPETarget", 3), ("MPESpread", 2)])
def test_mpe_reset_parity(ref, env_id, n_obs):
    """Same PRNG key => bitwise-identical initial agent/goal/obstacle states."""
    env_r = _ref_env(ref, env_id, 3, n_obs)
    env_o = _our_env(env_id, 3, n_obs)
    for seed in (0, 1, 7):
        key = jr.PRNGKey(seed)
        g_r = env_r.reset(key)
        g_o = env_o.reset(key)
        agents_r = np.asarray(g_r.type_states(type_idx=0, n_type=3))
        agents_o = np.asarray(g_o.type_states(0))
        goals_r = np.asarray(g_r.type_states(type_idx=1, n_type=3))
        goals_o = np.asarray(g_o.type_states(1))
        np.testing.assert_array_equal(agents_r, agents_o)
        np.testing.assert_array_equal(goals_r, goals_o)
        obs_r = np.asarray(g_r.env_states.obs)
        obs_o = np.asarray(g_o.env_states.obs)
        np.testing.assert_array_equal(obs_r, obs_o)


def test_mpe_trajectory_parity(ref):
    """Same reset key + same action sequence => same rewards/costs/states."""
    env_r = _ref_env(ref, "MPETarget", 3, 3)
    env_o = _our_env("MPETarget", 3, 3)
    key = jr.PRNGKey(3)
    g_r = env_r.reset(key)
    g_o = env_o.reset(key)

    akeys = jr.split(jr.PRNGKey(10), 8)
    for t in range(8):
        action = jr.uniform(akeys[t], (3, 2), minval=-1.0, maxval=1.0)
        g_r, rew_r, cost_r, _, _ = env_r.step(g_r, action)
        g_o, rew_o, cost_o, _, _ = env_o.step(g_o, action)
        np.testing.assert_allclose(np.asarray(rew_r), np.asarray(rew_o), rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(cost_r), np.asarray(cost_o), rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(g_r.type_states(type_idx=0, n_type=3)),
            np.asarray(g_o.type_states(0)),
            rtol=1e-6,
            atol=1e-6,
        )


def test_lidar_reset_parity(ref):
    """LidarTarget reset: agent/goal states and obstacle layout match bitwise."""
    env_r = _ref_env(ref, "LidarTarget", 3, 2)
    env_o = _our_env("LidarTarget", 3, 2)
    key = jr.PRNGKey(5)
    g_r = env_r.reset(key)
    g_o = env_o.reset(key)
    np.testing.assert_array_equal(
        np.asarray(g_r.type_states(type_idx=0, n_type=3)), np.asarray(g_o.type_states(0))
    )
    np.testing.assert_array_equal(
        np.asarray(g_r.type_states(type_idx=1, n_type=3)), np.asarray(g_o.type_states(1))
    )


# ---------------------------------------------------------------------------
# GAE kernel parity (bitwise-level, fp32 tolerance)
# ---------------------------------------------------------------------------
def test_gae_parity(ref):
    from dgppo.algo.utils import compute_dec_ocp_gae as ref_gae

    from dgppo_fov_tpu.algo.gae import compute_dec_ocp_gae as our_gae

    rng = np.random.default_rng(0)
    T, a, nh = 16, 3, 2
    hs = rng.normal(size=(T, a, nh)).astype(np.float32)
    l = rng.normal(size=(T,)).astype(np.float32)
    Vh = rng.normal(size=(T + 1, a, nh)).astype(np.float32)
    Vl = rng.normal(size=(T + 1,)).astype(np.float32)

    Qh_r, Ql_r = ref_gae(
        Tah_hs=jnp.asarray(hs),
        T_l=jnp.asarray(np.repeat(l[:, None], a, axis=1)),
        Tp1ah_Vh=jnp.asarray(Vh),
        Tp1_Vl=jnp.asarray(Vl),
        disc_gamma=0.99,
        gae_lambda=0.95,
    )
    Qh_o, Ql_o = our_gae(hs, l, Vh, Vl, disc_gamma=0.99, gae_lambda=0.95)
    Ql_r = np.asarray(Ql_r)
    if Ql_r.ndim == 2:
        Ql_r = Ql_r[:, 0]
    np.testing.assert_allclose(np.asarray(Qh_r), np.asarray(Qh_o), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(Ql_r, np.asarray(Ql_o), rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Distribution parity (reference TanhTransformedDistribution on the tfp shim)
# ---------------------------------------------------------------------------
def test_tanh_normal_parity(ref):
    from dgppo.algo.module.distribution import TanhTransformedDistribution, tfd

    from dgppo_fov_tpu.nn.distribution import TanhNormalDistribution

    means = jnp.array([[0.3, -1.2], [2.5, 0.0]])
    stds = jnp.array([[0.5, 0.1], [1.5, 0.9]])

    ref_dist = tfd.Independent(
        TanhTransformedDistribution(tfd.Normal(loc=means, scale=stds)), reinterpreted_batch_ndims=1
    )
    our_dist = TanhNormalDistribution(means, stds)

    actions = jnp.array([[0.2, -0.8], [0.9995, -0.1]])
    np.testing.assert_allclose(
        np.asarray(ref_dist.log_prob(actions)), np.asarray(our_dist.log_prob(actions)), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(ref_dist.mode()), np.asarray(our_dist.mode()), rtol=1e-6, atol=1e-6)
