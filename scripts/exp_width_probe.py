#!/usr/bin/env python
"""Probe: is the TBPTT sub-update width-bound or op-overhead-bound?

COVERAGE.md parks one update-throughput lever: stacking the Vl and policy
GNNs' 64-wide matmuls into 128-wide ones (they read the SAME minibatch
graphs). Stacking only pays if doubling the width is much cheaper than 2x.
This probe times `update_policy` (the representative ~316 ms sub-update at
bench shapes) with the policy GNN at out_dim 64 (default) vs 128 — the same
marginal matmul width a 2-network stack adds.

Run on the quiet TPU chip: python scripts/exp_width_probe.py [N_ENV] [T]
"""
import functools as ft
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")

import jax
import jax.numpy as jnp
import jax.random as jr
import jax.tree_util as jtu
import optax
from flax.training.train_state import TrainState

from dgppo_fov_tpu.algo import make_algo
from dgppo_fov_tpu.algo.modules import PPOPolicy
from dgppo_fov_tpu.env import make_env

N_ENV = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
T = int(sys.argv[2]) if len(sys.argv) > 2 else 128


def timed(name, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1e3:9.1f} ms", flush=True)
    return dt


def main():
    env = make_env("MPETarget", num_agents=3, max_step=T)
    algo = make_algo(
        algo="dgppo",
        env=env,
        node_dim=env.node_dim,
        edge_dim=env.edge_dim,
        state_dim=env.state_dim,
        action_dim=env.action_dim,
        n_agents=env.num_agents,
        batch_size=N_ENV * T // 2,
        rnn_step=16,
        seed=0,
        train_steps=100,
    )
    keys = jr.split(jr.PRNGKey(0), N_ENV)
    rollout = algo.collect(algo.params, keys)
    jax.block_until_ready(rollout.rewards)
    rollout = rollout._replace(
        graph=rollout.graph.without_env_states(),
        final_graph=rollout.final_graph.without_env_states(),
    )
    bs_envs = max(1, algo.batch_size // T)
    mb = jtu.tree_map(lambda x: x[:bs_envs], rollout)
    adv = jnp.zeros(mb.actions.shape[:3])

    def build_variant(gnn_out_dim: int):
        # Same wiring as InforMARL.__init__ but with the probed widths; the
        # GRU carry shape is width-independent (features=64), so the rollout's
        # rnn_states chunk into valid zero carries for every variant.
        policy = PPOPolicy(
            node_dim=env.node_dim,
            edge_dim=env.edge_dim,
            n_agents=env.num_agents,
            action_dim=env.action_dim,
            use_rnn=True,
            rnn_layers=1,
            gnn_layers=2,
            gnn_out_dim=gnn_out_dim,
        )
        params = policy.init(jr.PRNGKey(1), algo.nominal_graph, algo.init_rnn_state)
        ts = TrainState.create(
            apply_fn=policy.sample_action,
            params=params,
            tx=optax.apply_if_finite(optax.adam(3e-4), 1_000_000),
        )
        return policy, ts

    results = {}
    for label, out_dim in {
        "baseline (out=64)": (64),
        "wide (out=128)": (128),
        "wider (out=256)": (256),
    }.items():
        policy, ts = build_variant(out_dim)
        algo.policy = policy  # update_policy reads self.policy.eval_action

        @jax.jit
        def upd(ts, ro, a):
            return algo.update_policy(ts, ro, a)

        results[label] = timed(f"update_policy {label}", upd, ts, mb, adv)

    base = results["baseline (out=64)"]
    for label, dt in results.items():
        print(f"{label}: {dt / base:.2f}x baseline")
    print(
        "verdict: stacking has headroom if the wide variants are well under "
        "2.0x (marginal width ~free => two nets for the price of ~one)."
    )


if __name__ == "__main__":
    main()
