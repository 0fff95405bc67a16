"""Training loop: eval / save / collect / update.

Behavioral parity reference: /root/reference/dgppo/trainer/trainer.py:18-141.
Metric names and semantics match exactly (eval/reward, eval/reward_final,
eval/cost, eval/unsafe_frac; trainer.py:108-119). Fixed test keys are
`jr.split(PRNGKey(seed), 1000)[:n_env_test]` (trainer.py:98-100).

TPU additions: optional device mesh — eval/collect PRNG keys are sharded over
the mesh's env axis so XLA partitions the embarrassingly-parallel rollouts
across chips (GSPMD); update-side collectives are inserted automatically.
Per-phase wall-clock timing and steps/s/chip are recorded every eval.
"""
import functools as ft
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

from ..parallel.mesh import shard_batch
from .data import Rollout
from .logger import MetricsLogger
from .rollout import test_rollout
from .utils import EntropyCollapseMonitor, params_delta_norm, snapshot_params


class Trainer:
    def __init__(
        self,
        env,
        env_test,
        algo,
        gamma: float,
        n_env_train: int,
        n_env_test: int,
        log_dir: Optional[str],
        seed: int,
        params: dict,
        save_log: bool = True,
        mesh=None,
        use_wandb: bool = True,
        full_checkpoint: bool = True,
        profile_dir: Optional[str] = None,
    ):
        self.env = env
        self.env_test = env_test
        self.algo = algo
        self.gamma = gamma
        self.n_env_train = n_env_train
        self.n_env_test = n_env_test
        self.log_dir = log_dir
        self.seed = seed
        self.mesh = mesh

        assert "run_name" in params and "training_steps" in params
        assert params.get("eval_interval", 1) > 0 and params.get("save_interval", 1) > 0
        assert params.get("eval_epi", 1) >= 1
        self.params = params

        self.save_log = save_log and log_dir is not None
        if self.save_log:
            os.makedirs(log_dir, exist_ok=True)
            self.model_dir = os.path.join(log_dir, "models")
            os.makedirs(self.model_dir, exist_ok=True)

        self.logger = MetricsLogger(
            log_dir if self.save_log else None,
            run_name=params["run_name"],
            group=env.__class__.__name__,
            use_wandb=use_wandb,
            save_log=self.save_log,
        )

        self.steps = params["training_steps"]
        # Same defaults the asserts above validate against — a params dict
        # without these keys is legal, not a KeyError.
        self.eval_interval = params.get("eval_interval", 1)
        self.eval_epi = params.get("eval_epi", 1)
        self.save_interval = params.get("save_interval", 1)
        # Full-checkpoint retention (VERDICT r4 #5): keep the newest N plus
        # every K-th step; params-only models/<step> pickles are never pruned.
        self.ckpt_keep_last = params.get("ckpt_keep_last", 5)
        self.ckpt_keep_every = params.get("ckpt_keep_every", 1000)

        self.update_steps = 0
        self.key = jr.PRNGKey(seed)
        self.full_checkpoint = full_checkpoint
        self.profile_dir = profile_dir

    def train(self, start_step: int = 0):
        """Run training from `start_step` (pass the step returned by
        load_checkpoint to resume: the loop counter drives the cost/CBF
        weight schedules and the per-step collect keys, so a resumed run
        continues the schedule phase and the PRNG stream instead of
        replaying from 0)."""
        start_time = time.time()
        init_rnn_state = self.algo.init_rnn_state
        self.update_steps = start_step

        def test_fn_single(params, key):
            act_fn = ft.partial(self.algo.act, params=params)
            return test_rollout(self.env_test, act_fn, init_rnn_state, key)

        test_fn = jax.jit(lambda params, keys: jax.vmap(ft.partial(test_fn_single, params))(keys))

        # All eval reductions in ONE jitted program returning scalars, pulled
        # with ONE device_get: on this image the TPU sits behind a network
        # tunnel, so every separate float(x) is a blocking round-trip —
        # six of them cost more than the eval rollout itself (measured r3:
        # 0.73 s/step wall vs 0.15 s device time; see COVERAGE.md).
        @jax.jit
        def eval_metrics(test_rollouts: Rollout) -> dict:
            total_reward = test_rollouts.rewards.sum(axis=-1)
            return {
                "eval/reward": total_reward.mean(),
                "eval/reward_min": total_reward.min(),
                "eval/reward_max": total_reward.max(),
                "eval/reward_final": test_rollouts.rewards[:, -1].mean(),
                "eval/cost": jnp.maximum(test_rollouts.costs, 0.0)
                .max(axis=-1)
                .max(axis=-1)
                .sum(axis=-1)
                .mean(),
                "eval/unsafe_frac": (
                    test_rollouts.costs.max(axis=-1).max(axis=-2) >= 1e-6
                ).mean(),
            }

        test_key = jr.PRNGKey(self.seed)
        assert self.n_env_test <= 1_000
        test_keys = jr.split(test_key, 1_000)[: self.n_env_test]
        test_keys = shard_batch(test_keys, self.mesh)

        # Per-chip throughput: devices actually used, not all visible ones.
        n_chips = self.mesh.devices.size if self.mesh is not None else 1
        collapse_monitor = EntropyCollapseMonitor(self.algo.action_dim)
        env_steps_per_iter = self.n_env_train * self.env.max_episode_steps

        from tqdm import tqdm

        # Parity affordance (reference trainer.py:102); disable=None lets
        # tqdm auto-silence itself when stderr is not a TTY (batch jobs).
        for step in tqdm(range(start_step, self.steps + 1), initial=start_step,
                         total=self.steps + 1, disable=None, dynamic_ncols=True):
            if step % self.eval_interval == 0:
                eval_t0 = time.time()
                test_rollouts: Rollout = test_fn(self.algo.params, test_keys)
                # All reductions in jnp BEFORE any host fetch: on a multi-host
                # mesh the rollout arrays span non-addressable devices, so
                # only fully-reduced (replicated) scalars may cross to numpy.
                em = jax.device_get(eval_metrics(test_rollouts))
                reward_min = float(em.pop("eval/reward_min"))
                reward_max = float(em.pop("eval/reward_max"))
                eval_info = {k: float(v) for k, v in em.items()}
                eval_info["time/eval_s"] = time.time() - eval_t0
                elapsed = time.time() - start_time
                print(
                    f"step: {step:3}, time: {elapsed:5.0f}s, reward: {eval_info['eval/reward']:9.4f}, "
                    f"min/max reward: {reward_min:7.2f}/{reward_max:7.2f}, cost: {eval_info['eval/cost']:8.4f}, "
                    f"unsafe_frac: {eval_info['eval/unsafe_frac']:6.2f}",
                    flush=True,
                )
                self.logger.log(eval_info, step=self.update_steps)

            if self.save_log and step % self.save_interval == 0:
                self.algo.save(self.model_dir, step)
                if self.full_checkpoint:
                    from .checkpoint import prune_checkpoints, save_checkpoint

                    ckpt_dir = os.path.join(self.log_dir, "ckpt")
                    save_checkpoint(self.algo, ckpt_dir, step)
                    prune_checkpoints(
                        ckpt_dir,
                        keep_last=self.ckpt_keep_last,
                        keep_every=self.ckpt_keep_every,
                    )

            # jax.profiler trace of one train iteration (SURVEY.md §5:
            # tracing/profiling — absent in the reference). Offset from
            # start_step so resumed / very short runs still get a trace
            # (step 2 never occurs when resuming past it).
            profile_at = min(start_step + 2, self.steps)
            if self.profile_dir is not None and step == profile_at:
                jax.profiler.start_trace(self.profile_dir)

            collect_t0 = time.time()
            # Step-keyed (not sequentially split) so a resumed run at step S
            # continues the same stream the original run would have used.
            # Folded through a domain tag first: fold_in(key, s) equals
            # split(key, 1000)[s], so folding the raw seed key would alias
            # the collect stream with the fixed eval keys above (training
            # resets would reuse eval reset keys step for step).
            key_x0 = jr.split(jr.fold_in(jr.fold_in(self.key, 0x636F6C), step), self.n_env_train)
            key_x0 = shard_batch(key_x0, self.mesh)
            rollouts = self.algo.collect(self.algo.params, key_x0)
            jax.block_until_ready(rollouts.rewards)
            collect_s = time.time() - collect_t0

            update_t0 = time.time()
            prev_params = snapshot_params(self.algo.params)
            update_info = self.algo.update(rollouts, step)

            # Optimizer-liveness (no reference counterpart): a dead optimizer
            # (apply_if_finite skipping every minibatch) shows as
            # params_delta_norm == 0 / a climbing notfinite counter, instead
            # of hours of frozen eval lines. Dispatched async here, fetched
            # with the update metrics below.
            liveness = {
                "opt/params_delta_norm": params_delta_norm(prev_params, self.algo.params)
            }
            for name, ts in getattr(self.algo, "train_states", {}).items():
                cnt = getattr(ts.opt_state, "notfinite_count", None)
                if cnt is not None:
                    liveness[f"opt/notfinite_{name}"] = cnt

            # ONE batched blocking fetch for every per-step scalar (each
            # separate float() is a tunnel round-trip on this image; ~25 of
            # them were 0.4 s/step in r3). This also serves as the device
            # sync for update_s — without it, async dispatch would make
            # update_s measure enqueue time, overstating updates/s.
            fetched = jax.device_get(dict(update_info) | liveness)
            update_info = {k: float(v) for k, v in fetched.items()}
            update_s = time.time() - update_t0

            if self.profile_dir is not None and step == profile_at:
                jax.profiler.stop_trace()

            update_info = update_info | {
                "time/collect_s": collect_s,
                "time/update_s": update_s,
                "perf/env_steps_per_s_per_chip": env_steps_per_iter / max(collect_s, 1e-9) / n_chips,
                "perf/updates_per_s": 1.0 / max(update_s, 1e-9),
            }
            if "policy/entropy" in update_info:
                warning = collapse_monitor.check(update_info["policy/entropy"])
                if warning is not None:
                    print(f"WARNING step {step}: {warning}", flush=True)

            self.logger.log(update_info, step=self.update_steps)
            self.update_steps += 1

        self.logger.close()
