"""All-environment golden parity sweep against the ACTUAL reference code
(running under scripts/ref_oracle/shims.py).

For every registered environment: same reset key => bitwise-equal typed
states; same action sequence => matching rewards / costs / agent states.
This exercises, against the reference itself: every env's PRNG consumption
order, dynamics integrator, LiDAR raycasting, margin/clip cost conventions,
VMAS contact physics (reference physax runs on the jax_dataclasses shim),
and graph state layout.
"""
import os
import sys

import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

REF_PATH = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_PATH), reason="reference repo not mounted")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

# (env_id, n_agents, num_obs or None, trajectory rtol)
ENV_CASES = [
    ("MPETarget", 3, 2, 1e-6),
    ("MPESpread", 3, 2, 1e-6),
    ("MPELine", 3, 2, 1e-6),
    ("MPEFormation", 3, 2, 1e-6),
    ("MPECorridor", 3, None, 1e-6),
    ("MPEConnectSpread", 3, 2, 1e-6),
    ("LidarTarget", 3, 2, 1e-5),
    ("LidarSpread", 3, 2, 1e-5),
    ("LidarLine", 3, 2, 1e-5),
    ("LidarBicycleTarget", 3, 2, 1e-5),
    ("LidarOmniTarget", 3, 2, 1e-5),
    ("VMASReverseTransport", 3, None, 1e-4),
    ("VMASWheel", 3, None, 1e-4),
]


@pytest.fixture(scope="module")
def ref():
    from ref_oracle.shims import import_reference

    return import_reference(REF_PATH)


def _make_pair(ref, env_id, n_agents, num_obs):
    from dgppo.env import make_env as ref_make_env

    from dgppo_fov_tpu.env import make_env as our_make_env

    kw = {} if num_obs is None else {"num_obs": num_obs}
    return (
        ref_make_env(env_id, num_agents=n_agents, max_step=16, **kw),
        our_make_env(env_id, num_agents=n_agents, max_step=16, **kw),
    )


@pytest.mark.parametrize("env_id,n_agents,num_obs,rtol", ENV_CASES)
def test_env_parity(ref, env_id, n_agents, num_obs, rtol):
    env_r, env_o = _make_pair(ref, env_id, n_agents, num_obs)
    assert env_r.action_dim == env_o.action_dim
    assert env_r.n_cost == env_o.n_cost

    key = jr.PRNGKey(0)
    g_r = env_r.reset(key)
    g_o = env_o.reset(key)

    # Typed-state parity at reset (agents always type 0).
    agents_r = np.asarray(g_r.type_states(type_idx=0, n_type=n_agents))
    agents_o = np.asarray(g_o.type_states(0))
    np.testing.assert_allclose(agents_r, agents_o, rtol=0, atol=0, err_msg=f"{env_id} reset agents")

    akeys = jr.split(jr.PRNGKey(42), 4)
    for t in range(4):
        action = jr.uniform(akeys[t], (n_agents, env_r.action_dim), minval=-1.0, maxval=1.0)
        g_r, rew_r, cost_r, _, _ = env_r.step(g_r, action)
        g_o, rew_o, cost_o, _, _ = env_o.step(g_o, action)
        np.testing.assert_allclose(
            np.asarray(rew_r), np.asarray(rew_o), rtol=rtol, atol=rtol, err_msg=f"{env_id} reward t={t}"
        )
        np.testing.assert_allclose(
            np.asarray(cost_r), np.asarray(cost_o), rtol=rtol, atol=rtol, err_msg=f"{env_id} cost t={t}"
        )
        np.testing.assert_allclose(
            np.asarray(g_r.type_states(type_idx=0, n_type=n_agents)),
            np.asarray(g_o.type_states(0)),
            rtol=rtol,
            atol=rtol,
            err_msg=f"{env_id} agent states t={t}",
        )


def test_omni_phantom_origin_cost_parity(ref):
    """Regression for the reference's padded-count quirk in LidarOmniTarget's
    obstacle cost: its get_cost gathers top_k*N + 1 type-2 states (node
    count minus agents/goals, i.e. INCLUDING the padding node), and the
    zeros-buffer scatter leaves a phantom point at the origin in the
    min-distance. Drive both envs with many random-action steps (enough to
    enter the regime where every real hit is farther than the origin) and
    require cost parity throughout."""
    env_r, env_o = _make_pair(ref, "LidarOmniTarget", 3, 2)
    worst = 0.0
    for seed in (0, 1, 2):
        key = jr.PRNGKey(seed)
        g_r = env_r.reset(key)
        g_o = env_o.reset(key)
        np.testing.assert_allclose(
            np.asarray(env_r.get_cost(g_r)), np.asarray(env_o.get_cost(g_o)), rtol=0, atol=1e-5
        )
        akey = jr.PRNGKey(100 + seed)
        for _ in range(16):
            akey, k = jr.split(akey)
            action = jr.uniform(k, (3, env_o.action_dim), minval=-1.0, maxval=1.0)
            g_r, _, c_r, _, _ = env_r.step(g_r, action)
            g_o, _, c_o, _, _ = env_o.step(g_o, action)
            diff = float(np.max(np.abs(np.asarray(c_r) - np.asarray(c_o))))
            worst = max(worst, diff)
            np.testing.assert_allclose(
                np.asarray(c_r), np.asarray(c_o), rtol=0, atol=1e-5
            )
    assert worst < 1e-5
