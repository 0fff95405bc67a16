#!/usr/bin/env python
"""Multi-process (simulated multi-host) validation worker.

Launches as one of N processes that together form a jax.distributed cluster
on the CPU backend (2 virtual devices per process), builds the 1-D env mesh
spanning all processes' devices, and runs ONE sharded DGPPO collect + update
with host-local batch feeding — the exact code path a real multi-host TPU
launch uses (parallel/mesh.py). Prints one JSON line with the global rollout
reward sum and a post-update parameter checksum; every process must print
identical values, and they must match an unsharded single-process run
(tests/test_multichip.py::test_two_process_distributed_matches_single).

Usage (run N times concurrently, pid = 0..N-1):
  python scripts/multihost_cpu_check.py <pid> <nproc> <coordinator_port> [out_dir]

With `out_dir`, each process additionally dumps its full post-update param
tree to <out_dir>/params_<pid>.npz so the caller can assert leaf-by-leaf
cross-process equality (not just a scalar checksum).
"""
import json
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
out_dir = sys.argv[4] if len(sys.argv) > 4 else None

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax.random as jr  # noqa: E402

from dgppo_fov_tpu.algo import make_algo  # noqa: E402
from dgppo_fov_tpu.env import make_env  # noqa: E402
from dgppo_fov_tpu.parallel.mesh import make_mesh, replicate, shard_batch  # noqa: E402


def main():
    np.random.seed(0)  # minibatch shuffle order (matches the in-process oracle)
    env = make_env("MPETarget", num_agents=3, max_step=8)
    algo = make_algo(
        algo="dgppo",
        env=env,
        node_dim=env.node_dim,
        edge_dim=env.edge_dim,
        state_dim=env.state_dim,
        action_dim=env.action_dim,
        n_agents=3,
        batch_size=16,
        rnn_step=4,
        seed=0,
        train_steps=10,
    )
    mesh = make_mesh()
    algo.policy_train_state = replicate(algo.policy_train_state, mesh)
    algo.Vl_train_state = replicate(algo.Vl_train_state, mesh)
    algo.Vh_train_state = replicate(algo.Vh_train_state, mesh)

    keys = jr.split(jr.PRNGKey(0), 8)  # global batch: 8 envs over all devices
    rollout = algo.collect(algo.params, shard_batch(keys, mesh))
    reward_sum = float(jax.device_get(rollout.rewards.sum()))

    algo.update(rollout, step=0)
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(algo.params)[0]
    checksum = float(sum(jax.device_get(abs(l).sum()) for _, l in leaves_with_paths))
    if out_dir:
        # Full post-update param tree, keyed by pytree path, for leaf-by-leaf
        # cross-process determinism assertions in the caller.
        np.savez(
            os.path.join(out_dir, f"params_{pid}.npz"),
            **{jax.tree_util.keystr(kp): np.asarray(jax.device_get(l))
               for kp, l in leaves_with_paths},
        )
    print(json.dumps({"pid": pid, "reward_sum": reward_sum, "param_checksum": checksum}), flush=True)


if __name__ == "__main__":
    main()
