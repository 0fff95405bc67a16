#!/usr/bin/env python
"""Stage-by-stage wall-time profile of the DGPPO update at bench shapes.

Times each jitted stage of update_inner separately (det rollout, Vl scan,
Vh batch eval, Dec-EFOCP GAE, Vl/policy/Vh sub-updates) to locate the hot
spot. Run on the TPU chip:  python scripts/profile_update.py [N_ENV] [T]
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

from dgppo_fov_tpu.algo import make_algo
from dgppo_fov_tpu.algo.gae import compute_dec_ocp_gae
from dgppo_fov_tpu.env import make_env

N_ENV = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
T = int(sys.argv[2]) if len(sys.argv) > 2 else 128


def timed(name, fn, *args, iters=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt*1e3:9.1f} ms")
    return out, dt


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

    rollout, t_collect = timed("collect (stochastic)", algo.collect, algo.params, keys)
    _, t_det = timed("det rollout", algo.det_rollout_fn, algo.params, keys)

    rollout = rollout._replace(
        graph=rollout.graph.without_env_states(), final_graph=rollout.final_graph.without_env_states()
    )

    Vl_params = algo.Vl_train_state.params

    @jax.jit
    def vl_scan(ro):
        return jax.vmap(
            ft.partial(algo.scan_Vl, init_Vl_rnn_state=algo.init_Vl_rnn_state, Vl_params=Vl_params)
        )(ro)

    (bT_Vl, bT_Vl_rnn, _), t_vl = timed("Vl scan over T (RNN)", vl_scan, rollout)

    @jax.jit
    def vh_eval(ro):
        return jax.vmap(jax.vmap(ft.partial(algo.get_Vh, params=algo.params)))(ro.graph, ro.rnn_states)

    bTah_Vh, t_vh = timed("Vh eval (b,T) batch", vh_eval, rollout)

    bTp1ah_Vh = jnp.concatenate([bTah_Vh, bTah_Vh[:, -1:]], axis=1)
    bTp1_Vl = jnp.concatenate([bT_Vl, bT_Vl[:, -1:]], axis=1)

    @jax.jit
    def gae(costs, rews, Vh, Vl):
        return jax.vmap(
            ft.partial(compute_dec_ocp_gae, disc_gamma=algo.gamma, gae_lambda=algo.gae_lambda)
        )(costs, -rews, Vh, Vl)

    _, t_gae = timed("Dec-EFOCP GAE (T^2)", gae, rollout.costs, rollout.rewards, bTp1ah_Vh, bTp1_Vl)

    # Sub-updates at one minibatch of the bench size.
    bs_envs = max(1, algo.batch_size // T)
    mb = jtu.tree_map(lambda x: x[:bs_envs], rollout)
    @jax.jit
    def upd_vl(ts, ro, targets, rnn_states):
        return algo.update_Vl(ts, ro, targets, rnn_states)

    _, t_uvl = timed("update_Vl (1 minibatch)", upd_vl, algo.Vl_train_state, mb, bT_Vl[:bs_envs], bT_Vl_rnn[:bs_envs])

    bTa_A = jnp.zeros(rollout.actions.shape[:3])

    @jax.jit
    def upd_pi(ts, ro, adv):
        return algo.update_policy(ts, ro, adv)

    _, t_upi = timed("update_policy (1 minibatch)", upd_pi, algo.policy_train_state, mb, bTa_A[:bs_envs])

    _, t_full = timed("FULL algo.update", algo.update, rollout, 0, iters=2)

    total_stages = t_det + t_vl + t_vh + t_gae + 2 * (t_uvl + t_upi)
    print(f"{'sum of stages (approx)':28s} {total_stages*1e3:9.1f} ms")
    print(f"n_env={N_ENV} T={T} batch_size={algo.batch_size} minibatches={N_ENV*T//algo.batch_size}")


if __name__ == "__main__":
    main()
