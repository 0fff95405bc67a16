"""HCBFCRPO: DGPPO with a hand-crafted CBF (Vh = env.get_cost, no Vh training).

Behavioral parity reference: /root/reference/dgppo/algo/hcbfcrpo.py:21-205
(math only — the pipeline decomposition is `algo/pipeline.py`'s). The whole
delta vs DGPPO: the constraint value is the env's analytic cost function, so
there is no Vh net to fit and no deterministic rollout to fit it on.
"""
import functools as ft
from typing import Optional

import jax
import jax.numpy as jnp
import jax.random as jr
from flax.training.train_state import TrainState

from ..graph import BlockGraph
from ..trainer.data import Rollout
from ..utils.typing import Array, Params
from .dgppo import DGPPO
from .pipeline import (
    discrete_cbf,
    efocp_targets,
    fuse_task_with_cbf,
    minibatch_plan,
    per_agent,
    scan_minibatches,
    strip_env_states,
    take_envs,
    time_normalized,
)


class HCBFCRPO(DGPPO):
    def get_Vh(self, graph: BlockGraph, rnn_state: Array, params: Optional[Params] = None) -> Array:
        # Hand-crafted CBF: the env's cost function directly (hcbfcrpo.py:90-93).
        return self._env.get_cost(graph)

    def update(self, rollout: Rollout, step: int) -> dict:
        self._assert_config_frozen()
        _, self.key = jr.split(self.key)
        rollout = strip_env_states(rollout)

        info = {}
        for _ in range(self.epoch_ppo):
            minibatches = minibatch_plan(rollout, self.batch_size, self.rnn_step)
            self.Vl_train_state, self.policy_train_state, info = self.update_inner(
                self.Vl_train_state, self.policy_train_state, rollout, minibatches, jnp.array(step)
            )
        return info

    # Donation: see DGPPO.update_inner.
    @ft.partial(jax.jit, static_argnums=(0,), donate_argnames=("Vl_train_state", "policy_train_state"))
    def update_inner(
        self,
        Vl_train_state: TrainState,
        policy_train_state: TrainState,
        rollout: Rollout,
        minibatches: Array,
        step: Array,
    ):
        vl = self._unroll_Vl(rollout, Vl_train_state.params)
        # get_Vh ignores its params here (analytic CBF), so _constraint_path
        # needs no critic weights.
        vh_path = self._constraint_path(rollout, None, policy_train_state.params)

        _, vl_targets = efocp_targets(
            rollout.costs, -rollout.rewards, vh_path, vl.with_bootstrap, self.gamma, self.gae_lambda
        )
        task_adv = per_agent(time_normalized(vl_targets - vl.per_step), self.n_agents)

        cbf = discrete_cbf(vh_path, self._env.dt, self.alpha, self.cbf_eps)
        adv, safe_frac = fuse_task_with_cbf(task_adv, cbf, self._cbf_weight_at(step))

        def sweep(carry, env_idx):
            vl_state, pi_state = carry
            batch = take_envs(rollout, env_idx)
            vl_state, pi_state, fit_info = self._fit_vl_policy(
                vl_state, pi_state, batch, vl_targets[env_idx], vl.carries[env_idx], adv[env_idx]
            )
            return (vl_state, pi_state), fit_info

        (Vl_train_state, policy_train_state), info = scan_minibatches(
            sweep, (Vl_train_state, policy_train_state), minibatches
        )
        return Vl_train_state, policy_train_state, info | {"eval/safe_data": safe_frac}
