#!/usr/bin/env python
"""Run the reference (under shims) and our framework side by side on the same
config and print step-matched eval metrics — the learning-dynamics oracle.

Usage:
  python scripts/ref_oracle/compare_learning.py --which ref|ours --steps 100 \
      --env MPETarget --algo dgppo -n 3 --obs 3 [--n-env 32] [--batch 4096]

Writes one JSON line per eval to stdout; run both and diff the curves.
CPU-only (the reference assumes a fp32 default backend; keeps both identical).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import jax.random as jr  # noqa: E402
import numpy as np  # noqa: E402


def evaluate(env, act_fn, init_rnn_state, keys, is_ref: bool):
    """Deterministic eval: mean total reward, mean max-cost, unsafe fraction."""
    if is_ref:
        from dgppo.trainer.utils import test_rollout as ref_test_rollout

        def one(key):
            return ref_test_rollout(env, act_fn, init_rnn_state, key)

        rollout = jax.jit(jax.vmap(one))(keys)
    else:
        from dgppo_fov_tpu.trainer.rollout import test_rollout

        def one(key):
            return test_rollout(env, act_fn, init_rnn_state, key)

        rollout = jax.jit(jax.vmap(one))(keys)
    rewards = np.asarray(rollout.rewards)  # (b, T)
    costs = np.asarray(rollout.costs)  # (b, T, a, nh)
    unsafe = (costs.max(axis=(1, 3)) >= 0.0).mean()
    return float(rewards.sum(axis=1).mean()), float(costs.max(axis=(1, 2, 3)).mean()), float(unsafe)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--which", choices=["ref", "ours"], required=True)
    p.add_argument("--env", default="MPETarget")
    p.add_argument("--algo", default="dgppo")
    p.add_argument("-n", "--num-agents", type=int, default=3)
    p.add_argument("--obs", type=int, default=3)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--n-env", type=int, default=32)
    p.add_argument("--n-env-test", type=int, default=16)
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--eval-interval", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-step", type=int, default=128)
    args = p.parse_args()

    if args.which == "ref":
        sys.path.insert(0, "scripts")
        from ref_oracle.shims import import_reference

        import_reference()
        from dgppo.algo import make_algo
        from dgppo.env import make_env
    else:
        from dgppo_fov_tpu.algo import make_algo
        from dgppo_fov_tpu.env import make_env

    env = make_env(args.env, num_agents=args.num_agents, num_obs=args.obs, max_step=args.max_step)
    algo = make_algo(
        algo=args.algo,
        env=env,
        node_dim=env.node_dim,
        edge_dim=env.edge_dim,
        state_dim=env.state_dim,
        action_dim=env.action_dim,
        n_agents=env.num_agents,
        cost_weight=0.0,
        batch_size=args.batch,
        rnn_step=16,
        seed=args.seed,
        use_rnn=True,
        train_steps=args.steps,
    )

    test_keys = jr.split(jr.PRNGKey(args.seed), 1000)[: args.n_env_test]
    t0 = time.time()
    for step in range(args.steps + 1):
        if step % args.eval_interval == 0:
            reward, cost, unsafe = evaluate(env, algo.act, algo.init_rnn_state, test_keys, args.which == "ref")
            print(
                json.dumps(
                    {
                        "which": args.which,
                        "step": step,
                        "reward": round(reward, 4),
                        "cost": round(cost, 4),
                        "unsafe_frac": round(unsafe, 4),
                        "wall_s": round(time.time() - t0, 1),
                    }
                ),
                flush=True,
            )
        keys = jr.split(jr.fold_in(jr.PRNGKey(args.seed), step), args.n_env)
        rollout = algo.collect(algo.params, keys)
        algo.update(rollout, step)


if __name__ == "__main__":
    main()
