"""The --std-dev-min sigma-floor option (PARITY.md "sigma-floor" analysis).

The reference's std parametrization `softplus(x + c) + 1e-5`
(reference algo/module/policy.py:70-71) has a vanishing-entropy-gradient
basin: once softplus(x) falls below the additive floor, dH/dx ~ e^x/floor
-> 0, so the entropy bonus can no longer pull a collapsed policy back (two
observed 20k-step runs pinned there terminally). These tests pin:

1. the basin exists at the reference floor and disappears at 1e-2 (the
   quantitative claim in PARITY.md), and
2. std_dev_min plumbs from make_algo through every algorithm class to the
   policy module (and the stacked evaluator), with the default leaving the
   reference parametrization bit-identical.
"""
import math

import jax
import jax.numpy as jnp
import jax.random as jr
import pytest

from dgppo_fov_tpu.algo import make_algo
from dgppo_fov_tpu.env import make_env

STD_INIT_SHIFT = math.log(math.exp(0.5) - 1.0)  # softplus_inv(0.5)


def _entropy_grad_at(x: float, floor: float) -> float:
    """d/dx of the Normal entropy through std = softplus(x + c) + floor."""

    def ent(xv):
        std = jax.nn.softplus(xv + STD_INIT_SHIFT) + floor
        return 0.5 * jnp.log(2 * jnp.pi * jnp.e * std**2)

    return float(jax.grad(ent)(jnp.float32(x)))


def _entropy_at(x: float, floor: float) -> float:
    std = jax.nn.softplus(jnp.float32(x) + STD_INIT_SHIFT) + floor
    return float(0.5 * jnp.log(2 * jnp.pi * jnp.e * std**2))


def test_reference_floor_has_vanishing_entropy_gradient():
    """Diagnosis: why the collapsed runs could not climb back out."""
    # Healthy region: gradient ~1 regardless of floor.
    assert _entropy_grad_at(0.0, 1e-5) == pytest.approx(
        _entropy_grad_at(0.0, 1e-2), rel=0.05
    )
    # Past the event horizon (x < ~-15, where softplus(x) << floor) the
    # entropy-bonus gradient decays like e^x — numerically dead, so PPO's
    # garbage gradients can hold the policy at the floor indefinitely.
    assert _entropy_grad_at(-20.0, 1e-5) < 1e-3
    assert _entropy_grad_at(-30.0, 1e-5) < 1e-7


def test_raised_floor_bounds_the_collapse():
    """Mitigation mechanism: a raised floor does NOT enlarge dH/dx (sigma is
    larger, so it's actually smaller); it bounds the pathology itself."""
    # 1. Collapse depth is bounded: min per-dim entropy -3.2 at floor 1e-2
    #    vs -10.6 at the reference 1e-5 (the observed -22 two-dim plateau).
    assert _entropy_at(-50.0, 1e-2) > -4.0
    assert _entropy_at(-50.0, 1e-5) < -10.0
    # 2. Log-prob curvature is bounded: |dlogpi/dmu| = |a-mu|/sigma^2 <=
    #    |a-mu|/floor^2 — the term that produced the 1e5-4e6 grad norms
    #    pinning the collapsed runs. Floor 1e-2 cuts it by 1e6.
    def logp(mu, floor):
        std = jax.nn.softplus(jnp.float32(-50.0) + STD_INIT_SHIFT) + floor
        return -0.5 * ((0.5 - mu) / std) ** 2 - jnp.log(std)

    g_ref = abs(float(jax.grad(logp)(jnp.float32(0.0), 1e-5)))
    g_flr = abs(float(jax.grad(logp)(jnp.float32(0.0), 1e-2)))
    assert g_ref > 1e9  # 0.5 / 1e-10
    assert g_flr < 1e4  # 0.5 / 1e-4
    assert g_ref / g_flr > 1e5


def _mk(algo_name, **kw):
    env = make_env("MPETarget", num_agents=2, num_obs=1, max_step=8)
    return make_algo(
        algo=algo_name, env=env, node_dim=env.node_dim, edge_dim=env.edge_dim,
        state_dim=env.state_dim, action_dim=env.action_dim, n_agents=env.num_agents,
        batch_size=16, rnn_step=4, seed=0, train_steps=100, **kw,
    )


@pytest.mark.parametrize("algo_name", ["informarl", "informarl_lagr", "dgppo", "hcbfcrpo"])
def test_std_dev_min_plumbs_to_policy_and_config(algo_name):
    algo = _mk(algo_name, std_dev_min=1e-2)
    assert algo.std_dev_min == 1e-2
    assert algo.policy.dist.std_dev_min == 1e-2
    assert algo.config["std_dev_min"] == 1e-2  # config.yaml round-trip surface
    default = _mk(algo_name)
    assert default.policy.dist.std_dev_min == 1e-5  # reference value


def test_std_dev_min_reaches_stacked_evaluator():
    algo = _mk("dgppo", stacked_update=True, std_dev_min=1e-2)
    assert algo._stacked is not None
    assert algo._stacked.std_dev_min == 1e-2


def test_default_floor_distribution_unchanged():
    """Same params, same graph: explicit 1e-5 ≡ omitted (bit-identical)."""
    a = _mk("dgppo")
    b = _mk("dgppo", std_dev_min=1e-5)
    env = make_env("MPETarget", num_agents=2, num_obs=1, max_step=8)
    g = env.reset(jr.PRNGKey(0))
    act_a, _ = a.act(g, a.init_rnn_state)
    act_b, _ = b.act(g, b.init_rnn_state)
    assert bool(jnp.all(act_a == act_b))
