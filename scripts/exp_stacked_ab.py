#!/usr/bin/env python
"""A/B the stacked joint Vl+policy sub-update against the two separate
sub-updates at bench shapes, each jitted and timed in isolation.

Run on the quiet TPU chip: python scripts/exp_stacked_ab.py [N_ENV] [T]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")

import jax
import jax.numpy as jnp
import jax.random as jr
import jax.tree_util as jtu

from dgppo_fov_tpu.algo import make_algo
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
        algo="dgppo", env=env, node_dim=env.node_dim, edge_dim=env.edge_dim,
        state_dim=env.state_dim, action_dim=env.action_dim, n_agents=env.num_agents,
        batch_size=N_ENV * T // 2, rnn_step=16, seed=0, train_steps=100,
        # Without this algo._stacked is None and update_Vl_and_policy (the
        # joint path timed below) would crash; the separate sub-updates are
        # unaffected by the flag.
        stacked_update=True,
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
    targets = jnp.zeros(mb.rewards.shape)
    # Vl carries along the minibatch (zeros are fine for timing).
    carries = jnp.zeros((bs_envs, T) + algo.init_Vl_rnn_state.shape)

    upd_vl = jax.jit(lambda ts, ro, tg, ca: algo.update_Vl(ts, ro, tg, ca))
    upd_pi = jax.jit(lambda ts, ro, a: algo.update_policy(ts, ro, a))
    upd_joint = jax.jit(
        lambda vts, pts, ro, tg, ca, a: algo.update_Vl_and_policy(vts, pts, ro, tg, ca, a)
    )

    t_vl = timed("update_Vl (separate)", upd_vl, algo.Vl_train_state, mb, targets, carries)
    t_pi = timed("update_policy (separate)", upd_pi, algo.policy_train_state, mb, adv)
    t_joint = timed(
        "update_Vl_and_policy (stacked)", upd_joint,
        algo.Vl_train_state, algo.policy_train_state, mb, targets, carries, adv,
    )
    print(f"separate pair: {1e3 * (t_vl + t_pi):.1f} ms; stacked: {1e3 * t_joint:.1f} ms "
          f"({t_joint / (t_vl + t_pi):.2f}x)")


if __name__ == "__main__":
    main()
