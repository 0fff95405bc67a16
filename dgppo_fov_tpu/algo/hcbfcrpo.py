"""HCBFCRPO: DGPPO with a hand-crafted CBF (Vh = env.get_cost, no Vh training).

Behavioral parity reference: /root/reference/dgppo/algo/hcbfcrpo.py:21-205.
"""
import functools as ft
from typing import Optional

import jax
import jax.numpy as jnp
import jax.random as jr
import jax.tree_util as jtu
import numpy as np
from flax.training.train_state import TrainState
from jax import lax

from ..graph import BlockGraph
from ..trainer.data import Rollout
from ..utils.typing import Array, Params
from .dgppo import DGPPO
from .gae import compute_dec_ocp_gae


class HCBFCRPO(DGPPO):
    def get_Vh(self, graph: BlockGraph, rnn_state: Array, params: Optional[Params] = None) -> Array:
        # Hand-crafted CBF: the env's cost function directly (hcbfcrpo.py:90-93).
        return self._env.get_cost(graph)

    def update(self, rollout: Rollout, step: int) -> dict:
        key, self.key = jr.split(self.key)
        rollout = rollout._replace(
            graph=rollout.graph.without_env_states(), final_graph=rollout.final_graph.without_env_states()
        )

        update_info = {}
        assert rollout.dones.shape[0] * rollout.dones.shape[1] >= self.batch_size
        for _ in range(self.epoch_ppo):
            idx = np.arange(rollout.dones.shape[0])
            np.random.shuffle(idx)
            rnn_chunk_ids = jnp.arange(rollout.dones.shape[1])
            rnn_chunk_ids = jnp.array(jnp.array_split(rnn_chunk_ids, rollout.dones.shape[1] // self.rnn_step))
            batch_idx = jnp.array(jnp.array_split(idx, idx.shape[0] // (self.batch_size // rollout.dones.shape[1])))
            self.Vl_train_state, self.policy_train_state, update_info = self.update_inner(
                self.Vl_train_state, self.policy_train_state, rollout, batch_idx, rnn_chunk_ids, jnp.array(step)
            )
        return update_info

    # Donation: see DGPPO.update_inner.
    @ft.partial(jax.jit, static_argnums=(0,), donate_argnames=("Vl_train_state", "policy_train_state"))
    def update_inner(
        self,
        Vl_train_state: TrainState,
        policy_train_state: TrainState,
        rollout: Rollout,
        batch_idx: Array,
        rnn_chunk_ids: Array,
        step: Array,
    ):
        b, T, a, _ = rollout.actions.shape

        bT_Vl, bT_Vl_rnn_states, final_Vl_rnn_states = jax.vmap(
            ft.partial(self.scan_Vl, init_Vl_rnn_state=self.init_Vl_rnn_state, Vl_params=Vl_train_state.params)
        )(rollout)

        def final_Vl_fn(graph, rnn_state):
            Vl, _ = self.Vl.get_value(Vl_train_state.params, graph, rnn_state)
            return Vl.squeeze(0).squeeze(0)

        b_final_Vl = jax.vmap(final_Vl_fn)(rollout.final_graph, final_Vl_rnn_states)
        bTp1_Vl = jnp.concatenate([bT_Vl, b_final_Vl[:, None]], axis=1)

        bTah_Vh = jax.vmap(jax.vmap(ft.partial(self.get_Vh, params={"Vh": None})))(
            rollout.graph, rollout.rnn_states
        )

        def final_Vh_fn(graph, rnn_state):
            _, final_rnn_state = self.act(graph, rnn_state[-1], {"policy": policy_train_state.params})
            return self.get_Vh(graph, final_rnn_state, {"Vh": None})

        final_Vh = jax.vmap(final_Vh_fn)(rollout.final_graph, rollout.rnn_states)
        bTp1ah_Vh = jnp.concatenate([bTah_Vh, final_Vh[:, None]], axis=1)

        bTah_Qh, bT_Ql = jax.vmap(
            ft.partial(compute_dec_ocp_gae, disc_gamma=self.gamma, gae_lambda=self.gae_lambda)
        )(rollout.costs, -rollout.rewards, bTp1ah_Vh, bTp1_Vl)
        del bTah_Qh

        bT_Al = bT_Ql - bT_Vl
        bT_Al = (bT_Al - bT_Al.mean(axis=1, keepdims=True)) / (bT_Al.std(axis=1, keepdims=True) + 1e-8)
        bTa_Al = jnp.repeat(bT_Al[:, :, None], self.n_agents, axis=-1)

        bTah_cbf_deriv = (bTp1ah_Vh[:, 1:] - bTah_Vh) / self._env.dt + self.alpha * bTah_Vh
        bTah_Acbf = jnp.maximum(bTah_cbf_deriv + self.cbf_eps, 0)

        bTa_is_safe = (bTah_cbf_deriv <= 0).min(axis=-1)
        safe_data = bTa_is_safe.mean()
        bTa_A = jnp.where(bTa_is_safe, bTa_Al, jnp.zeros_like(bTa_Al))
        if self.cbf_schedule:
            bTa_A += bTah_Acbf.max(axis=-1) * self.cbf_schedule_fn(step)
        else:
            bTa_A += bTah_Acbf.max(axis=-1) * self.cbf_weight
        bTa_A = -bTa_A

        def update_fn(carry, idx):
            Vl_model, policy_model = carry
            rollout_batch = jtu.tree_map(lambda x: x[idx], rollout)
            Vl_model, Vl_info = self.update_Vl(Vl_model, rollout_batch, bT_Ql[idx], bT_Vl_rnn_states[idx], rnn_chunk_ids)
            policy_model, policy_info = self.update_policy(policy_model, rollout_batch, bTa_A[idx], rnn_chunk_ids)
            return (Vl_model, policy_model), (Vl_info | policy_info)

        (Vl_train_state, policy_train_state), info = lax.scan(
            update_fn, (Vl_train_state, policy_train_state), batch_idx
        )
        info = jtu.tree_map(lambda x: x[-1], info) | {"eval/safe_data": safe_data}
        return Vl_train_state, policy_train_state, info
