#!/usr/bin/env python
"""Training-level bound on PARITY.md divergence #1 (entropy estimator keying).

Runs short DGPPO trainings at the default coef_ent=1e-2 in three
configurations and compares deterministic-eval metrics:

  A. per-step entropy keys (this framework's default)
  B. trace-fixed entropy key (the reference's semantics, entropy_fixed_key)
  A'. per-step keys with a different algo seed (seed-to-seed yardstick)

If |A - B| is within |A - A'|, the estimator divergence is bounded by
ordinary run-to-run variance. CPU, ~minutes.

Usage: python scripts/exp_entropy_modes.py [N_UPDATES]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.random as jr
import numpy as np

from dgppo_fov_tpu.algo import make_algo
from dgppo_fov_tpu.env import make_env

N_UPDATES = int(sys.argv[1]) if len(sys.argv) > 1 else 30
N_ENV, T, N_EVAL = 16, 32, 16


def run(seed: int, fixed_key):
    env = make_env("MPETarget", num_agents=3, num_obs=2, max_step=T)
    algo = make_algo(
        algo="dgppo", env=env, node_dim=env.node_dim, edge_dim=env.edge_dim,
        state_dim=env.state_dim, action_dim=env.action_dim, n_agents=env.num_agents,
        batch_size=N_ENV * T // 2, rnn_step=16, seed=seed, train_steps=N_UPDATES,
        coef_ent=1e-2,
    )
    algo.entropy_fixed_key = fixed_key
    np.random.seed(seed)
    collect_key = jr.PRNGKey(seed)
    for step in range(N_UPDATES):
        collect_key, k = jr.split(collect_key)
        rollout = algo.collect(algo.params, jr.split(k, N_ENV))
        algo.update(rollout, step)

    # Deterministic eval with FIXED keys shared by every configuration.
    from dgppo_fov_tpu.trainer.rollout import test_rollout

    import functools as ft
    import jax.numpy as jnp

    def one(key):
        ro = test_rollout(env, ft.partial(algo.act, params=algo.params), algo.init_rnn_state, key)
        return ro.rewards.sum(), jnp.maximum(ro.costs, 0.0).max()

    rew, cost = jax.jit(jax.vmap(one))(jr.split(jr.PRNGKey(999), N_EVAL))
    return float(rew.mean()), float(cost.mean())


def main():
    a = run(seed=0, fixed_key=None)
    b = run(seed=0, fixed_key=7321)
    a2 = run(seed=1, fixed_key=None)
    print(f"A  per-step keys, seed 0:   reward {a[0]:+.4f}  max-cost {a[1]:.4f}")
    print(f"B  trace-fixed key, seed 0: reward {b[0]:+.4f}  max-cost {b[1]:.4f}")
    print(f"A' per-step keys, seed 1:   reward {a2[0]:+.4f}  max-cost {a2[1]:.4f}")
    print(f"|A-B| reward {abs(a[0]-b[0]):.4f} vs seed-to-seed |A-A'| {abs(a[0]-a2[0]):.4f}")
    print(f"|A-B| cost   {abs(a[1]-b[1]):.4f} vs seed-to-seed |A-A'| {abs(a[1]-a2[1]):.4f}")


if __name__ == "__main__":
    main()
