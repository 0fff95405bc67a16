#!/usr/bin/env python
"""Experiment: does unrolling the 16-step TBPTT scans speed up the update?

The committed per-stage profile (COVERAGE.md) shows the three minibatch
sub-updates (~316 ms each) dominate the 1.89 s update, at ~3% MXU
utilization — the work is 16 sequential scan steps of small ops, so the
hypothesis is per-step loop overhead. `lax.scan(..., unroll=k)` removes
loop structure and lets XLA fuse across steps while keeping the working
set local (unlike the measured-slower full trunk hoisting).

Scope: only the two TBPTT scans in informarl.py (scan_Vl /
scan_eval_action) via a module-local `lax` shim — the rollout scans and
the GAE scan are untouched.

Usage: python scripts/exp_tbptt_unroll.py [UNROLL] [N_ENV] [T]
"""
import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.random as jr
import numpy as np
from jax import lax as real_lax

UNROLL = int(sys.argv[1]) if len(sys.argv) > 1 else 4
N_ENV = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
T = int(sys.argv[3]) if len(sys.argv) > 3 else 128
T0 = time.time()


def log(msg):
    print(f"[exp {time.time()-T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


class _LaxShim:
    """lax passthrough whose `scan` defaults to unroll=UNROLL."""

    def __getattr__(self, name):
        return getattr(real_lax, name)

    @staticmethod
    def scan(f, init, xs=None, length=None, **kw):
        kw.setdefault("unroll", UNROLL)
        return real_lax.scan(f, init, xs, length=length, **kw)


import dgppo_fov_tpu.algo.informarl as informarl_mod

if UNROLL != 1:
    informarl_mod.lax = _LaxShim()
log(f"TBPTT scan unroll = {UNROLL}")

from dgppo_fov_tpu.algo import make_algo
from dgppo_fov_tpu.env import make_env

np.random.seed(0)
env = make_env("MPETarget", num_agents=3, max_step=T)
algo = make_algo(
    "dgppo", env=env, node_dim=env.node_dim, edge_dim=env.edge_dim,
    state_dim=env.state_dim, action_dim=env.action_dim, n_agents=env.num_agents,
    batch_size=N_ENV * T // 2, rnn_step=16, seed=0, train_steps=100,
)
log("algo built; collecting")
rollout = algo.collect(algo.params, jr.split(jr.PRNGKey(0), N_ENV))
jax.block_until_ready(rollout.rewards)
log("collected; first update (compile)")

t = time.time()
info = algo.update(rollout, step=0)
jax.block_until_ready(info["policy/loss"])
log(f"compile+first update: {time.time()-t:.1f}s")

times = []
for i in range(3):
    t = time.time()
    info = algo.update(rollout, step=i + 1)
    jax.block_until_ready(info["policy/loss"])
    times.append(time.time() - t)
    log(f"iter {i+1}: {times[-1]:.3f}s")

best = min(times)
log(f"RESULT unroll={UNROLL}: best {best:.3f}s -> {1/best:.3f} updates/s")
print(f'{{"unroll": {UNROLL}, "update_s": {best:.4f}, "updates_per_s": {1/best:.4f}}}')
