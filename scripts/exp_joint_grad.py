#!/usr/bin/env python
"""Experiment: fused vs sequential minibatch gradient computation.

The DGPPO update's per-minibatch sweep runs three independent gradient
steps (Vl, Vh, policy) back-to-back inside one jit. The three losses read
DISJOINT param trees over the SAME minibatch data, so

    grad(loss_Vl + loss_Vh + loss_pi, (pVl, pVh, pPi))

equals the three separate grads exactly. The committed profile table
(COVERAGE.md) shows the full update is ~2x the SUM of the three
sub-updates — i.e. XLA is not overlapping them. This measures whether one
joint backward region recovers that overlap on the live chip.

Usage: python scripts/exp_joint_grad.py  [N_ENV] [T]
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

import functools as ft

import jax.numpy as jnp
import jax.random as jr
import numpy as np

from dgppo_fov_tpu.algo import make_algo
from dgppo_fov_tpu.algo.pipeline import (
    discrete_cbf, efocp_targets, fuse_task_with_cbf, minibatch_plan, per_agent,
    strip_env_states, take_envs, time_normalized,
)
from dgppo_fov_tpu.env import make_env

N_ENV = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
T = int(sys.argv[2]) if len(sys.argv) > 2 else 128
BATCH = N_ENV * T // 2  # 2 minibatches, like the committed profile


def log(msg):
    print(f"[exp {time.time()-T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


T0 = time.time()
env = make_env("MPETarget", num_agents=3, max_step=T)
algo = make_algo(
    "dgppo", env=env, node_dim=env.node_dim, edge_dim=env.edge_dim,
    state_dim=env.state_dim, action_dim=env.action_dim, n_agents=env.num_agents,
    batch_size=BATCH, seed=0,
)
log("algo built; collecting")
rollout = algo.collect(algo.params, jr.split(jr.PRNGKey(1), N_ENV))
jax.block_until_ready(rollout.rewards)
log("collected")

det_rollout = algo.det_rollout_fn(algo.params, jr.split(jr.PRNGKey(2), N_ENV))
rollout = strip_env_states(rollout)
det_rollout = strip_env_states(det_rollout)
minibatches = minibatch_plan(rollout, BATCH, algo.rnn_step)


def shared_stages(vl_state, vh_state, pi_state, rollout, det_rollout):
    vl = algo._unroll_Vl(rollout, vl_state.params)
    vh_path = algo._constraint_path(rollout, vh_state.params, pi_state.params)
    _, vl_targets = efocp_targets(
        rollout.costs, -rollout.rewards, vh_path, vl.with_bootstrap, algo.gamma, algo.gae_lambda)
    task_adv = per_agent(time_normalized(vl_targets - vl.per_step), algo.n_agents)
    cbf = discrete_cbf(vh_path, algo._env.dt, algo.alpha, algo.cbf_eps)
    adv, _ = fuse_task_with_cbf(task_adv, cbf, algo.cbf_weight)
    det_vh_path = algo._constraint_path(det_rollout, vh_state.params, pi_state.params)
    det_vh_targets, _ = efocp_targets(
        det_rollout.costs, -det_rollout.rewards, det_vh_path, vl.with_bootstrap,
        algo.gamma, algo.gae_lambda)
    return vl, vl_targets, adv, det_vh_targets


@ft.partial(jax.jit, donate_argnums=(0, 1, 2))
def sweep_sequential(vl_state, vh_state, pi_state, rollout, det_rollout, minibatches):
    vl, vl_targets, adv, det_vh_targets = shared_stages(vl_state, vh_state, pi_state, rollout, det_rollout)

    def body(carry, env_idx):
        vl_s, vh_s, pi_s = carry
        batch = take_envs(rollout, env_idx)
        vl_s, _ = algo.update_Vl(vl_s, batch, vl_targets[env_idx], vl.carries[env_idx])
        vh_s, _ = algo.update_Vh(vh_s, take_envs(det_rollout, env_idx), det_vh_targets[env_idx])
        pi_s, _ = algo.update_policy(pi_s, batch, adv[env_idx])
        return (vl_s, vh_s, pi_s), 0.0

    (vl_state, vh_state, pi_state), _ = jax.lax.scan(body, (vl_state, vh_state, pi_state), minibatches)
    return vl_state, vh_state, pi_state


@ft.partial(jax.jit, donate_argnums=(0, 1, 2))
def sweep_joint(vl_state, vh_state, pi_state, rollout, det_rollout, minibatches):
    vl, vl_targets, adv, det_vh_targets = shared_stages(vl_state, vh_state, pi_state, rollout, det_rollout)

    def body(carry, env_idx):
        vl_s, vh_s, pi_s = carry
        batch = take_envs(rollout, env_idx)
        det_batch = take_envs(det_rollout, env_idx)

        # Build the three loss closures inline (mirrors update_Vl/update_Vh/
        # update_policy bodies without the fit() call).
        from dgppo_fov_tpu.algo.pipeline import (
            fresh_chunk_carries, ppo_clip_objective, take_chunks)
        import optax

        chunked = take_chunks(batch, algo.rnn_step)
        chunk_targets = take_chunks(vl_targets[env_idx], algo.rnn_step)
        carry0 = fresh_chunk_carries(vl.carries[env_idx], algo.rnn_step)

        def loss_vl(params):
            preds, _, _ = jax.vmap(jax.vmap(ft.partial(algo.scan_Vl, Vl_params=params)))(chunked, carry0)
            return optax.l2_loss(preds, chunk_targets).mean()

        det_chunked = take_chunks(det_batch, algo.rnn_step)
        det_chunk_targets = take_chunks(det_vh_targets[env_idx], algo.rnn_step)

        def loss_vh(params):
            read_vh = ft.partial(algo.get_Vh, params={"Vh": params})
            preds = jax.vmap(jax.vmap(jax.vmap(read_vh)))(det_chunked.graph, det_chunked.rnn_states)
            return optax.l2_loss(preds, det_chunk_targets).mean()

        graphs = take_chunks(batch.graph, algo.rnn_step)
        actions = take_chunks(batch.actions, algo.rnn_step)
        logp_old = take_chunks(batch.log_pis, algo.rnn_step)
        chunk_adv = take_chunks(adv[env_idx], algo.rnn_step)
        pcarry0 = fresh_chunk_carries(batch.rnn_states, algo.rnn_step)
        chunk_keys = take_chunks(algo._entropy_keys(batch, pi_s.step), algo.rnn_step)

        def loss_pi(params):
            logp_new, entropy, _, _ = jax.vmap(
                jax.vmap(ft.partial(algo.scan_eval_action, actor_params=params))
            )(graphs, actions, pcarry0, chunk_keys)
            clip_loss, _ = ppo_clip_objective(logp_new, logp_old, chunk_adv, algo.clip_eps)
            return clip_loss - algo.coef_ent * entropy.mean()

        def joint(ptuple):
            return loss_vl(ptuple[0]) + loss_vh(ptuple[1]) + loss_pi(ptuple[2])

        grads = jax.grad(joint)((vl_s.params, vh_s.params, pi_s.params))
        from dgppo_fov_tpu.trainer.utils import compute_norm_and_clip
        g_vl, _ = compute_norm_and_clip(grads[0], algo.max_grad_norm)
        g_vh, _ = compute_norm_and_clip(grads[1], algo.max_grad_norm)
        g_pi, _ = compute_norm_and_clip(grads[2], algo.max_grad_norm)
        return (vl_s.apply_gradients(grads=g_vl), vh_s.apply_gradients(grads=g_vh),
                pi_s.apply_gradients(grads=g_pi)), 0.0

    (vl_state, vh_state, pi_state), _ = jax.lax.scan(body, (vl_state, vh_state, pi_state), minibatches)
    return vl_state, vh_state, pi_state


def time_variant(name, fn):
    states = (algo.Vl_train_state, algo.Vh_train_state, algo.policy_train_state)
    # jit donation consumes states; re-create per iteration from host copies
    import jax.tree_util as jtu
    times = []
    for i in range(4):
        s = jtu.tree_map(lambda x: jnp.array(x), states)
        t0 = time.time()
        out = fn(*s, rollout, det_rollout, minibatches)
        jax.block_until_ready(out)
        dt = time.time() - t0
        times.append(dt)
        log(f"{name} iter {i}: {dt:.3f}s")
    return min(times[1:])


seq = time_variant("sequential", sweep_sequential)
joint = time_variant("joint", sweep_joint)
log(f"RESULT sequential={seq:.3f}s joint={joint:.3f}s speedup={seq/joint:.3f}x")
print(f'{{"sequential_s": {seq:.4f}, "joint_s": {joint:.4f}, "speedup": {seq/joint:.4f}}}')
