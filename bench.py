#!/usr/bin/env python
"""Benchmark: DGPPO env-steps/s/chip on batched rollout collection.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
BASELINE.json targets: >=50x CPU env-steps/s on one chip at 2048 envs.

Env vars:
  BENCH_ENV       environment id        (default MPETarget)
  BENCH_N_ENV     parallel envs         (default 2048)
  BENCH_MAX_STEP  horizon               (default 128)
  BENCH_N_AGENTS  agents                (default 3)
  BENCH_MODE      rollout | update      (default rollout)
  BENCH_CPU_BASELINE  steps/s reference (default: measured on this image)
"""
import json
import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")

import jax

# BENCH_PLATFORM=cpu forces the CPU backend (for measuring CPU baselines;
# env vars alone don't stick on this image — sitecustomize prepends an
# experimental TPU platform).
if os.environ.get("BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

import jax.random as jr


def build(env_id: str, n_env: int, max_step: int, n_agents: int):
    from dgppo_fov_tpu.algo import make_algo
    from dgppo_fov_tpu.env import make_env

    env = make_env(env_id, num_agents=n_agents, max_step=max_step)
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
        compute_dtype=os.environ.get("BENCH_DTYPE") or None,
    )
    return env, algo


def time_rollout(env, algo, n_env: int, iters: int = None) -> float:
    """Returns env steps/s for the jitted vmapped collect."""
    if iters is None:
        iters = int(os.environ.get("BENCH_ITERS", 3))
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


def time_update(env, algo, n_env: int, iters: int = 3) -> float:
    """Returns PPO updates/s (full DGPPO update incl. det rollout + GAE)."""
    import numpy as np

    np.random.seed(0)
    keys = jr.split(jr.PRNGKey(0), n_env)
    rollout = algo.collect(algo.params, keys)
    jax.block_until_ready(rollout.rewards)
    info = algo.update(rollout, step=0)  # compile
    jax.block_until_ready(info["policy/loss"])

    t0 = time.perf_counter()
    for i in range(iters):
        info = algo.update(rollout, step=i + 1)
        jax.block_until_ready(info["policy/loss"])
    dt = (time.perf_counter() - t0) / iters
    return 1.0 / dt


def main():
    env_id = os.environ.get("BENCH_ENV", "MPETarget")
    n_env = int(os.environ.get("BENCH_N_ENV", 2048))
    max_step = int(os.environ.get("BENCH_MAX_STEP", 128))
    n_agents = int(os.environ.get("BENCH_N_AGENTS", 3))
    mode = os.environ.get("BENCH_MODE", "rollout")

    env, algo = build(env_id, n_env, max_step, n_agents)
    n_chips = max(1, len(jax.devices()))

    if mode == "update":
        updates_per_s = time_update(env, algo, n_env)
        print(
            json.dumps(
                {
                    "metric": f"ppo_updates_per_s@{env_id}:{n_env}env",
                    "value": round(updates_per_s, 4),
                    "unit": "updates/s",
                    "vs_baseline": round(updates_per_s, 4),
                }
            )
        )
        return

    steps_per_s = time_rollout(env, algo, n_env)
    per_chip = steps_per_s / n_chips

    # Per-(env, n_agents) CPU baselines measured on this image (single CPU
    # device, same jitted vmapped rollout, 2048 envs x 128 steps). The >=50x
    # target compares TPU vs CPU on the SAME workload (BASELINE.md).
    CPU_BASELINES = {
        ("MPETarget", 3): 16254.0,
        ("MPESpread", 3): 16359.5,
        ("MPESpread", 5): 5138.7,
        ("MPELine", 3): 9625.3,
        ("MPELine", 5): 9414.4,
        ("LidarSpread", 3): 7989.3,
        ("LidarTarget", 3): 7989.3,
        ("LidarLine", 3): 7989.3,
        ("LidarBicycleTarget", 5): 4458.8,
        ("LidarOmniTarget", 3): 7139.8,
        ("VMASReverseTransport", 3): 39748.1,
        ("VMASWheel", 3): 48240.9,
    }
    if (env_id, n_agents) in CPU_BASELINES:
        default_baseline = CPU_BASELINES[(env_id, n_agents)]
    else:
        fallback = next(((e, n, v) for (e, n), v in CPU_BASELINES.items() if e == env_id), None)
        if fallback is None:
            default_baseline = 16254.0
            print(f"# no CPU baseline for {env_id}; using MPETarget n=3", file=sys.stderr)
        else:
            default_baseline = fallback[2]
            print(
                f"# no CPU baseline for {env_id} n={n_agents}; falling back to n={fallback[1]} "
                f"(vs_baseline is approximate — set BENCH_CPU_BASELINE to override)",
                file=sys.stderr,
            )
    cpu_baseline = float(os.environ.get("BENCH_CPU_BASELINE", default_baseline))
    vs_baseline = per_chip / cpu_baseline

    print(
        json.dumps(
            {
                "metric": f"env_steps_per_s_per_chip@{env_id}:{n_env}env",
                "value": round(per_chip, 1),
                "unit": "steps/s/chip",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
