#!/usr/bin/env python
"""Scaling-efficiency benchmark: rollout throughput at 1 chip vs N chips.

BASELINE.md target: >=80% efficiency at 2 hosts. On real multi-chip hardware
this measures true ICI scaling; on a single host it can be exercised with
virtual CPU devices (JAX_NUM_CPU_DEVICES) to validate the mechanism (virtual
devices share cores, so efficiency numbers there are not meaningful).

Usage:
  python scripts/scaling_bench.py [--n-env 2048] [--env MPETarget]
  # multi-host: launch one process per host with jax.distributed env vars set.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# SCALE_CPU_DEVICES=N forces a virtual N-device CPU backend (mechanism
# validation; virtual devices share cores so efficiency numbers there are
# not meaningful). Must run before backend init — env vars alone don't
# stick on this image (sitecustomize prepends an experimental TPU platform).
if os.environ.get("SCALE_CPU_DEVICES"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", int(os.environ["SCALE_CPU_DEVICES"]))

import jax.random as jr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="MPETarget")
    ap.add_argument("--n-env", type=int, default=2048)
    ap.add_argument("--max-step", type=int, default=128)
    ap.add_argument("--n-agents", type=int, default=3)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from bench import build
    from dgppo_fov_tpu.parallel.mesh import init_distributed, make_mesh, replicate, shard_batch

    init_distributed()
    devices = jax.devices()
    results = {}

    for n_dev in sorted({1, len(devices)}):
        mesh = make_mesh(devices[:n_dev]) if n_dev > 1 else None
        env, algo = build(args.env, args.n_env, args.max_step, args.n_agents)
        if mesh is not None:
            algo.policy_train_state = replicate(algo.policy_train_state, mesh)
            algo.Vl_train_state = replicate(algo.Vl_train_state, mesh)
            if hasattr(algo, "Vh_train_state"):
                algo.Vh_train_state = replicate(algo.Vh_train_state, mesh)

        keys = jr.split(jr.PRNGKey(0), args.n_env)
        keys = shard_batch(keys, mesh)
        r = algo.collect(algo.params, keys)
        jax.block_until_ready(r.rewards)
        t0 = time.perf_counter()
        for i in range(args.iters):
            keys_i = shard_batch(jr.split(jr.PRNGKey(i + 1), args.n_env), mesh)
            r = algo.collect(algo.params, keys_i)
            jax.block_until_ready(r.rewards)
        dt = (time.perf_counter() - t0) / args.iters
        sps = args.n_env * args.max_step / dt
        results[n_dev] = sps
        print(f"devices={n_dev}: {sps:,.0f} env steps/s")

    if len(results) > 1:
        n = max(results)
        eff = results[n] / (results[1] * n)
        print(json.dumps({"metric": f"scaling_efficiency@{n}dev", "value": round(eff, 4),
                          "unit": "fraction", "vs_baseline": round(eff / 0.8, 3)}))


if __name__ == "__main__":
    main()
