"""DGPPO — Discrete GCBF Proximal Policy Optimization (the paper algorithm).

Behavioral parity reference: /root/reference/dgppo/algo/dgppo.py:25-321.
Deltas vs InforMARLLagr:
 - Vh critic uses *local info only*, no RNN (use_lstm=False, decompose=True,
   use_global_info=False; dgppo.py:83-95)
 - a second *deterministic-policy* rollout per update fits Vh
   (dgppo.py:107-117, 139-141, 282-283, 296-321)
 - discrete-CBF advantage: cbf_deriv = (Vh_{t+1} - Vh_t)/dt + alpha*Vh_t,
   Acbf = max(cbf_deriv + cbf_eps, 0) (dgppo.py:246-247)
 - merged advantage: task advantage only where all constraints satisfy the
   discrete CBF condition, plus max_h(Acbf) * cbf_weight(step)
   (dgppo.py:250-259); cbf weight x2 at 50%/75% when cbf_schedule
   (dgppo.py:73-80)
"""
import functools as ft
from typing import Optional

import jax
import jax.numpy as jnp
import jax.random as jr
import jax.tree_util as jtu
import numpy as np
import optax
from flax.training.train_state import TrainState
from jax import lax

from ..graph import BlockGraph
from ..trainer.data import Rollout
from ..trainer.rollout import test_rollout as det_rollout_fn
from ..trainer.utils import compute_norm_and_clip, has_any_nan_or_inf
from ..utils.typing import Array, Params
from .gae import compute_dec_ocp_gae
from .informarl_lagr import InforMARLLagr
from .modules import ValueNet


class DGPPO(InforMARLLagr):
    def __init__(
        self,
        env,
        node_dim: int,
        edge_dim: int,
        state_dim: int,
        action_dim: int,
        n_agents: int,
        actor_gnn_layers: int = 2,
        Vl_gnn_layers: int = 2,
        Vh_gnn_layers: int = 1,
        gamma: float = 0.99,
        lr_actor: float = 3e-4,
        lr_Vl: float = 1e-3,
        lr_Vh: float = 1e-3,
        batch_size: int = 8192,
        epoch_ppo: int = 1,
        clip_eps: float = 0.25,
        gae_lambda: float = 0.95,
        coef_ent: float = 1e-2,
        max_grad_norm: float = 2.0,
        seed: int = 0,
        use_rnn: bool = True,
        rnn_layers: int = 1,
        rnn_step: int = 16,
        use_lstm: bool = False,
        alpha: float = 10.0,
        cbf_eps: float = 1e-2,
        cbf_weight: float = 1.0,
        train_steps: int = 100_000,
        cbf_schedule: bool = True,
        compute_dtype=None,
        **kwargs,
    ):
        super().__init__(
            env, node_dim, edge_dim, state_dim, action_dim, n_agents, actor_gnn_layers, Vl_gnn_layers,
            Vh_gnn_layers, gamma, lr_actor, lr_Vl, lr_Vh, batch_size, epoch_ppo, clip_eps, gae_lambda,
            coef_ent, max_grad_norm, seed, use_rnn, rnn_layers, rnn_step, use_lstm,
            compute_dtype=compute_dtype,
        )

        self.alpha = alpha
        self.cbf_eps = cbf_eps
        self.cbf_weight = cbf_weight
        self.cbf_schedule = cbf_schedule

        if self.cbf_schedule:
            self.cbf_schedule_fn = optax.piecewise_constant_schedule(
                init_value=cbf_weight,
                boundaries_and_scales={int(train_steps * 0.5): 2, int(train_steps * 0.75): 2},
            )

        # Local-information-only Vh critic, no RNN carry (dgppo.py:83-95).
        self.Vh = ValueNet(
            node_dim=node_dim,
            edge_dim=edge_dim,
            n_agents=n_agents,
            n_out=env.n_cost,
            use_rnn=use_rnn,
            gnn_layers=Vh_gnn_layers,
            gnn_out_dim=64,
            use_lstm=False,
            decompose=True,
            use_global_info=False,
            n_heads=3,
            compute_dtype=self.compute_dtype,
        )
        Vh_key, self.key = jr.split(self.key)
        Vh_params = self.Vh.init(Vh_key, self.nominal_graph, self.init_rnn_state)
        self.Vh_optim = optax.apply_if_finite(optax.adam(learning_rate=lr_Vh), 1_000_000)
        self.Vh_train_state = TrainState.create(apply_fn=self.Vh.get_value, params=Vh_params, tx=self.Vh_optim)

        # Deterministic-policy rollout collector (dgppo.py:107-117).
        def det_rollout_single(cur_params, cur_key):
            return det_rollout_fn(self._env, ft.partial(self.act, params=cur_params), self.init_rnn_state, cur_key)

        def det_rollout_batch(cur_params, cur_keys):
            return jax.vmap(ft.partial(det_rollout_single, cur_params))(cur_keys)

        self.det_rollout_fn = jax.jit(det_rollout_batch)

    @property
    def config(self) -> dict:
        return super().config | {
            "alpha": self.alpha,
            "cbf_eps": self.cbf_eps,
            "cbf_weight": self.cbf_weight,
            "cbf_schedule": self.cbf_schedule,
        }

    def get_Vh(self, graph: BlockGraph, rnn_state: Array, params: Optional[Params] = None) -> Array:
        if params is None:
            params = self.params
        Vh, _ = self.Vh.get_value(params["Vh"], graph, rnn_state)
        return Vh

    def update(self, rollout: Rollout, step: int) -> dict:
        key, self.key = jr.split(self.key)

        # Deterministic rollout for Vh fitting (dgppo.py:139-141).
        b_key = jr.split(key, rollout.dones.shape[0])
        det_rollout = self.det_rollout_fn(self.params, b_key)

        rollout = rollout._replace(
            graph=rollout.graph.without_env_states(), final_graph=rollout.final_graph.without_env_states()
        )
        det_rollout = det_rollout._replace(
            graph=det_rollout.graph.without_env_states(), final_graph=det_rollout.final_graph.without_env_states()
        )

        update_info = {}
        assert rollout.dones.shape[0] * rollout.dones.shape[1] >= self.batch_size
        for _ in range(self.epoch_ppo):
            idx = np.arange(rollout.dones.shape[0])
            np.random.shuffle(idx)
            rnn_chunk_ids = jnp.arange(rollout.dones.shape[1])
            rnn_chunk_ids = jnp.array(jnp.array_split(rnn_chunk_ids, rollout.dones.shape[1] // self.rnn_step))
            batch_idx = jnp.array(jnp.array_split(idx, idx.shape[0] // (self.batch_size // rollout.dones.shape[1])))
            (
                self.Vl_train_state,
                self.Vh_train_state,
                self.policy_train_state,
                update_info,
            ) = self.update_inner(
                self.Vl_train_state,
                self.Vh_train_state,
                self.policy_train_state,
                rollout,
                det_rollout,
                batch_idx,
                rnn_chunk_ids,
                jnp.array(step),
            )
        return update_info

    # Donating the train states lets XLA update params/opt-state in place —
    # they are immediately reassigned from the outputs at the call site
    # (matters on the 15.75G-HBM chip at 2048-env batches).
    @ft.partial(
        jax.jit,
        static_argnums=(0,),
        donate_argnames=("Vl_train_state", "Vh_train_state", "policy_train_state"),
    )
    def update_inner(
        self,
        Vl_train_state: TrainState,
        Vh_train_state: TrainState,
        policy_train_state: TrainState,
        rollout: Rollout,
        det_rollout: Rollout,
        batch_idx: Array,
        rnn_chunk_ids: Array,
        step: Array,
    ):
        b, T, a, _ = rollout.actions.shape

        # Vl over the stochastic rollout.
        bT_Vl, bT_Vl_rnn_states, final_Vl_rnn_states = jax.vmap(
            ft.partial(self.scan_Vl, init_Vl_rnn_state=self.init_Vl_rnn_state, Vl_params=Vl_train_state.params)
        )(rollout)

        def final_Vl_fn(graph, rnn_state):
            Vl, _ = self.Vl.get_value(Vl_train_state.params, graph, rnn_state)
            return Vl.squeeze(0).squeeze(0)

        b_final_Vl = jax.vmap(final_Vl_fn)(rollout.final_graph, final_Vl_rnn_states)
        bTp1_Vl = jnp.concatenate([bT_Vl, b_final_Vl[:, None]], axis=1)

        # Vh per step (no RNN carry in the net config; rnn_states are passed
        # through unchanged — dgppo.py:219-229).
        bTah_Vh = jax.vmap(jax.vmap(ft.partial(self.get_Vh, params={"Vh": Vh_train_state.params})))(
            rollout.graph, rollout.rnn_states
        )

        def final_Vh_fn(graph, rnn_state):
            _, final_rnn_state = self.act(graph, rnn_state[-1], {"policy": policy_train_state.params})
            return self.get_Vh(graph, final_rnn_state, {"Vh": Vh_train_state.params})

        final_Vh = jax.vmap(final_Vh_fn)(rollout.final_graph, rollout.rnn_states)
        bTp1ah_Vh = jnp.concatenate([bTah_Vh, final_Vh[:, None]], axis=1)

        # Dec-EFOCP GAE (dgppo.py:231-237).
        bTah_Qh, bT_Ql = jax.vmap(
            ft.partial(compute_dec_ocp_gae, disc_gamma=self.gamma, gae_lambda=self.gae_lambda)
        )(rollout.costs, -rollout.rewards, bTp1ah_Vh, bTp1_Vl)
        del bTah_Qh

        # Task advantage, normalized per env over time.
        bT_Al = bT_Ql - bT_Vl
        bT_Al = (bT_Al - bT_Al.mean(axis=1, keepdims=True)) / (bT_Al.std(axis=1, keepdims=True) + 1e-8)
        bTa_Al = jnp.repeat(bT_Al[:, :, None], self.n_agents, axis=-1)

        # Discrete-CBF safety advantage (dgppo.py:246-247).
        bTah_cbf_deriv = (bTp1ah_Vh[:, 1:] - bTah_Vh) / self._env.dt + self.alpha * bTah_Vh
        bTah_Acbf = jnp.maximum(bTah_cbf_deriv + self.cbf_eps, 0)

        # Merge (dgppo.py:250-259).
        bTa_is_safe = (bTah_cbf_deriv <= 0).min(axis=-1)
        safe_data = bTa_is_safe.mean()
        bTa_A = jnp.where(bTa_is_safe, bTa_Al, jnp.zeros_like(bTa_Al))
        if self.cbf_schedule:
            bTa_A += bTah_Acbf.max(axis=-1) * self.cbf_schedule_fn(step)
        else:
            bTa_A += bTah_Acbf.max(axis=-1) * self.cbf_weight
        bTa_A = -bTa_A

        # Vh targets from the deterministic rollout (dgppo.py:261-273).
        bTah_Vh_det = jax.vmap(jax.vmap(ft.partial(self.get_Vh, params={"Vh": Vh_train_state.params})))(
            det_rollout.graph, det_rollout.rnn_states
        )
        final_Vh_det = jax.vmap(final_Vh_fn)(det_rollout.final_graph, det_rollout.rnn_states)
        bTp1ah_Vh_det = jnp.concatenate([bTah_Vh_det, final_Vh_det[:, None]], axis=1)
        bTah_Qh_det, _ = jax.vmap(
            ft.partial(compute_dec_ocp_gae, disc_gamma=self.gamma, gae_lambda=self.gae_lambda)
        )(det_rollout.costs, -det_rollout.rewards, bTp1ah_Vh_det, bTp1_Vl)

        def update_fn(carry, idx):
            Vl_model, Vh_model, policy_model = carry
            rollout_batch = jtu.tree_map(lambda x: x[idx], rollout)
            det_rollout_batch = jtu.tree_map(lambda x: x[idx], det_rollout)
            Vl_model, Vl_info = self.update_Vl(Vl_model, rollout_batch, bT_Ql[idx], bT_Vl_rnn_states[idx], rnn_chunk_ids)
            Vh_model, Vh_info = self.update_Vh(
                Vh_model, det_rollout_batch, bTah_Qh_det[idx], rnn_chunk_ids
            )
            policy_model, policy_info = self.update_policy(policy_model, rollout_batch, bTa_A[idx], rnn_chunk_ids)
            return (Vl_model, Vh_model, policy_model), (Vl_info | Vh_info | policy_info)

        (Vl_train_state, Vh_train_state, policy_train_state), info = lax.scan(
            update_fn, (Vl_train_state, Vh_train_state, policy_train_state), batch_idx
        )
        info = jtu.tree_map(lambda x: x[-1], info) | {"eval/safe_data": safe_data}
        return Vl_train_state, Vh_train_state, policy_train_state, info

    def update_Vh(self, Vh_train_state, det_rollout: Rollout, bTah_Qh_det, rnn_chunk_ids):
        """L2 fit of Vh to deterministic-rollout GAE targets (dgppo.py:296-321).

        The Vh replay reads the DET rollout's stored rnn_states (the policy's
        carries along the det trajectory, dgppo.py:219-229). The reference's
        update_Vh takes an extra rnn-states argument it never reads
        (reference dgppo.py:296-321 — the stochastic rollout's carries were
        passed next to det graphs); that dead parameter is dropped here.
        """
        bcT_rollout = jtu.tree_map(lambda x: x[:, rnn_chunk_ids], det_rollout)
        bcTah_Qh_det = bTah_Qh_det[:, rnn_chunk_ids]

        def get_loss(params):
            bcTah_Vh_det = jax.vmap(jax.vmap(jax.vmap(ft.partial(self.get_Vh, params={"Vh": params}))))(
                bcT_rollout.graph, bcT_rollout.rnn_states
            )
            loss_Vh = optax.l2_loss(bcTah_Vh_det, bcTah_Qh_det).mean()
            return loss_Vh, {"Vh/loss_Vh": loss_Vh}

        grad_Vh, Vh_info = jax.grad(get_loss, has_aux=True)(Vh_train_state.params)
        grad_has_nan = has_any_nan_or_inf(grad_Vh).astype(jnp.float32)
        grad_Vh, grad_norm = compute_norm_and_clip(grad_Vh, self.max_grad_norm)
        Vh_train_state = Vh_train_state.apply_gradients(grads=grad_Vh)
        return Vh_train_state, Vh_info | {"Vh/grad_Vh_norm": grad_norm, "Vh/grad_Vh_has_nan": grad_has_nan}
