#!/usr/bin/env python
"""HBM capacity probe: how many parallel envs fit on the 15.75 GB chip, and
does steps/s/chip improve past the 2048-env bench default?

Sweeps BOTH phases at growing env counts until OOM:
 - rollout collect (the BENCH headline) at 2048 / 4096 / 8192 / 16384
 - full DGPPO update at 2048 / 4096 / 8192 (batch_size = n_env*T/2, i.e.
   2 minibatches per update, matching the bench shape)

Run on a QUIET chip: python scripts/exp_hbm_capacity.py [rollout|update|both]
Prints one line per configuration; OOM is caught and reported as the ceiling.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")

import jax
import jax.random as jr

from dgppo_fov_tpu.algo import make_algo
from dgppo_fov_tpu.env import make_env

T = 128
MODE = sys.argv[1] if len(sys.argv) > 1 else "both"


def build(n_env):
    env = make_env("MPETarget", num_agents=3, max_step=T)
    # Minibatch size is capped at the bench default (1024 envs x T =
    # 131072 transitions): scaling n_env past 2048 adds MORE minibatches
    # per update, not bigger gradient passes — the standard way to scale
    # PPO batch, and the only one that fits HBM (a 2048-env gradient pass
    # plus the whole-rollout Vh forwards exceeds 15.75 GB).
    algo = make_algo(
        algo="dgppo", env=env, node_dim=env.node_dim, edge_dim=env.edge_dim,
        state_dim=env.state_dim, action_dim=env.action_dim, n_agents=env.num_agents,
        batch_size=min(n_env, 2048) * T // 2, rnn_step=16, seed=0, train_steps=100,
    )
    return env, algo


def is_oom(e: Exception) -> bool:
    s = str(e)
    # On the axon platform an HBM-infeasible program fails inside the REMOTE
    # compile helper; the client-side exception is a generic HTTP 500 and the
    # "Ran out of memory in memory space hbm / program 22.73G" detail only
    # reaches the terminal's stderr. Measured at update n_env=4096 (2026-08).
    return (
        "RESOURCE_EXHAUSTED" in s
        or "out of memory" in s.lower()
        or "OOM" in s
        or "remote_compile" in s
    )


def probe_rollout(n_env) -> None:
    env, algo = build(n_env)
    try:
        t = time.perf_counter()
        ro = algo.collect(algo.params, jr.split(jr.PRNGKey(0), n_env))
        jax.block_until_ready(ro.rewards)
        compile_s = time.perf_counter() - t
        times = []
        for i in range(2):
            t = time.perf_counter()
            ro = algo.collect(algo.params, jr.split(jr.PRNGKey(i + 1), n_env))
            jax.block_until_ready(ro.rewards)
            times.append(time.perf_counter() - t)
        rate = n_env * T / (sum(times) / len(times))
        print(f"rollout n_env={n_env:6d}: {rate:12.0f} steps/s/chip "
              f"(iter {sum(times)/len(times):.3f}s, compile {compile_s:.0f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        if is_oom(e):
            print(f"rollout n_env={n_env:6d}: OOM — ceiling reached", flush=True)
        else:
            raise


def probe_update(n_env) -> None:
    import numpy as np

    np.random.seed(0)
    env, algo = build(n_env)
    try:
        ro = algo.collect(algo.params, jr.split(jr.PRNGKey(0), n_env))
        jax.block_until_ready(ro.rewards)
        t = time.perf_counter()
        info = algo.update(ro, step=0)
        jax.block_until_ready(info["policy/loss"])
        compile_s = time.perf_counter() - t
        times = []
        for i in range(2):
            t = time.perf_counter()
            info = algo.update(ro, step=i + 1)
            jax.block_until_ready(info["policy/loss"])
            times.append(time.perf_counter() - t)
        dt = sum(times) / len(times)
        print(f"update  n_env={n_env:6d}: {1.0/dt:8.3f} updates/s  "
              f"({n_env*T/dt:12.0f} transitions/s, iter {dt:.2f}s, compile {compile_s:.0f}s)",
              flush=True)
    except Exception as e:  # noqa: BLE001
        if is_oom(e):
            print(f"update  n_env={n_env:6d}: OOM — ceiling reached", flush=True)
            print(f"  detail: {str(e)[:600]}", flush=True)
        else:
            raise


def main():
    print(f"devices: {jax.devices()}", flush=True)
    sizes = [int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2 else None
    if MODE in ("rollout", "both"):
        for n in sizes or (2048, 4096, 8192, 16384):
            probe_rollout(n)
    if MODE in ("update", "both"):
        for n in sizes or (2048, 4096, 8192):
            probe_update(n)


if __name__ == "__main__":
    main()
