"""InforMARL-Lagrangian: MAPPO with per-(agent,constraint) Lagrange multipliers.

Behavioral parity reference: /root/reference/dgppo/algo/informarl_lagr.py:25-327.
Deltas vs InforMARL:
 - decomposed Vh critic with global info (informarl_lagr.py:70-82)
 - GAE on clip(costs, min=0) (informarl_lagr.py:209-214)
 - advantage = -Al_norm - mean(lagr * Ah_norm) (informarl_lagr.py:216-231)
 - multiplier ascent lagr <- relu(lagr - lr * delta), with
   delta = -mean(Vh*(1-gamma) + ratio*Ah) (informarl_lagr.py:286-309)
"""
import functools as ft
import os
import pickle

import jax
import jax.numpy as jnp
import jax.random as jr
import jax.tree_util as jtu
import numpy as np
import optax
from flax.training.train_state import TrainState
from jax import lax

from ..trainer.data import Rollout
from ..trainer.utils import compute_norm_and_clip, has_any_nan_or_inf
from ..utils.typing import Array, Params
from .gae import compute_dec_ocp_gae
from .informarl import InforMARL
from .modules import ValueNet


class InforMARLLagr(InforMARL):
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
        lagr_init: float = 0.78,
        lr_lagr: float = 1e-7,
        compute_dtype=None,
        **kwargs,
    ):
        super().__init__(
            env, node_dim, edge_dim, state_dim, action_dim, n_agents, 0.0, actor_gnn_layers, Vl_gnn_layers,
            gamma, lr_actor, lr_Vl, batch_size, epoch_ppo, clip_eps, gae_lambda, coef_ent, max_grad_norm,
            seed, use_rnn, rnn_layers, rnn_step, use_lstm,
            compute_dtype=compute_dtype,
        )

        self.lr_Vh = lr_Vh
        self.Vh_gnn_layers = Vh_gnn_layers
        self.lagr_init = lagr_init
        self.lr_lagr = lr_lagr

        self.Vh = ValueNet(
            node_dim=node_dim,
            edge_dim=edge_dim,
            n_agents=n_agents,
            n_out=env.n_cost,
            use_rnn=use_rnn,
            rnn_layers=rnn_layers,
            gnn_layers=Vh_gnn_layers,
            gnn_out_dim=64,
            use_lstm=use_lstm,
            decompose=True,
            use_global_info=True,
            compute_dtype=self.compute_dtype,
        )
        rnn_state_key, self.key = jr.split(self.key)
        self.init_Vh_rnn_state = self.Vh.init_rnn_state(rnn_state_key, n_slots=n_agents)

        Vh_key, self.key = jr.split(self.key)
        Vh_params = self.Vh.init(Vh_key, self.nominal_graph, self.init_Vh_rnn_state)
        self.Vh_optim = optax.apply_if_finite(optax.adam(learning_rate=lr_Vh), 1_000_000)
        self.Vh_train_state = TrainState.create(apply_fn=self.Vh.get_value, params=Vh_params, tx=self.Vh_optim)

        self.ah_lagr = jnp.ones((n_agents, env.n_cost)) * self.lagr_init

    @property
    def config(self) -> dict:
        return super().config | {
            "lr_Vh": self.lr_Vh,
            "Vh_gnn_layers": self.Vh_gnn_layers,
            "lagr_init": self.lagr_init,
            "lr_lagr": self.lr_lagr,
        }

    @property
    def params(self) -> Params:
        return {
            "policy": self.policy_train_state.params,
            "Vl": self.Vl_train_state.params,
            "Vh": self.Vh_train_state.params,
        }

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
            (
                self.Vl_train_state,
                self.Vh_train_state,
                self.policy_train_state,
                self.ah_lagr,
                update_info,
            ) = self.update_inner(
                self.Vl_train_state,
                self.Vh_train_state,
                self.policy_train_state,
                self.ah_lagr,
                rollout,
                batch_idx,
                rnn_chunk_ids,
            )
        return update_info

    def scan_Vh(self, rollout: Rollout, init_rnn_state: Array, Vh_params: Params):
        # Per-step scan on purpose — see the trunk-hoisting negative result
        # documented on InforMARL.scan_Vl. jax.checkpoint like the sibling
        # scans: update_Vh differentiates through this, and recomputing the
        # per-step critic beats storing all T GNN residuals (scan_Vl note).
        @jax.checkpoint
        def body(rnn_state, graph):
            Vh, new_rnn_state = self.Vh.get_value(Vh_params, graph, rnn_state)
            return new_rnn_state, (Vh, rnn_state)

        final_rnn_state, (Tah_Vh, T_rnn_states) = lax.scan(body, init_rnn_state, rollout.graph)
        return Tah_Vh, T_rnn_states, final_rnn_state

    # Donation: see DGPPO.update_inner.
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
        ah_lagr: Array,
        rollout: Rollout,
        batch_idx: Array,
        rnn_chunk_ids: Array,
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

        bTah_Vh, bT_Vh_rnn_states, final_Vh_rnn_states = jax.vmap(
            ft.partial(self.scan_Vh, init_rnn_state=self.init_Vh_rnn_state, Vh_params=Vh_train_state.params)
        )(rollout)

        def final_Vh_fn(graph, rnn_state):
            Vh, _ = self.Vh.get_value(Vh_train_state.params, graph, rnn_state)
            return Vh

        bah_final_Vh = jax.vmap(final_Vh_fn)(rollout.final_graph, final_Vh_rnn_states)
        bTp1ah_Vh = jnp.concatenate([bTah_Vh, bah_final_Vh[:, None]], axis=1)

        bTah_Qh, bT_Ql = jax.vmap(
            ft.partial(compute_dec_ocp_gae, disc_gamma=self.gamma, gae_lambda=self.gae_lambda)
        )(jnp.clip(rollout.costs, min=0), -rollout.rewards, bTp1ah_Vh, bTp1_Vl)

        bT_Al = bT_Ql - bT_Vl
        bT_Al = (bT_Al - bT_Al.mean(axis=1, keepdims=True)) / (bT_Al.std(axis=1, keepdims=True) + 1e-8)
        bTa_Al = -jnp.repeat(bT_Al[:, :, None], self.n_agents, axis=-1)

        bTah_Ah = bTah_Qh - bTah_Vh
        bTah_Ah = (bTah_Ah - bTah_Ah.mean(axis=1, keepdims=True)) / (bTah_Ah.std(axis=1, keepdims=True) + 1e-8)

        bTa_A = bTa_Al - (bTah_Ah * ah_lagr[None, None]).mean(axis=-1)

        def update_fn(carry, idx):
            Vl_model, Vh_model, policy_model, lagr = carry
            rollout_batch = jtu.tree_map(lambda x: x[idx], rollout)
            Vl_model, Vl_info = self.update_Vl(Vl_model, rollout_batch, bT_Ql[idx], bT_Vl_rnn_states[idx], rnn_chunk_ids)
            Vh_model, Vh_info = self.update_Vh(Vh_model, rollout_batch, bTah_Qh[idx], bT_Vh_rnn_states[idx], rnn_chunk_ids)
            policy_model, policy_info = self.update_policy(policy_model, rollout_batch, bTa_A[idx], rnn_chunk_ids)
            lagr, lagr_info = self.update_lagr(lagr, policy_model, rollout_batch, bTah_Vh[idx], bTah_Ah[idx])
            return (Vl_model, Vh_model, policy_model, lagr), (Vl_info | Vh_info | policy_info | lagr_info)

        (Vl_train_state, Vh_train_state, policy_train_state, ah_lagr), info = lax.scan(
            update_fn, (Vl_train_state, Vh_train_state, policy_train_state, ah_lagr), batch_idx
        )
        info = jtu.tree_map(lambda x: x[-1], info)
        return Vl_train_state, Vh_train_state, policy_train_state, ah_lagr, info

    def update_Vh(self, Vh_train_state, rollout: Rollout, bTah_Qh, bT_rnn_states, rnn_chunk_ids):
        bcT_rollout = jtu.tree_map(lambda x: x[:, rnn_chunk_ids], rollout)
        bcTah_Qh = bTah_Qh[:, rnn_chunk_ids]
        bc_rnn_state_inits = jnp.zeros_like(bT_rnn_states[:, rnn_chunk_ids[:, 0]])

        def get_loss(params):
            bcTah_Vh, _, _ = jax.vmap(jax.vmap(ft.partial(self.scan_Vh, Vh_params=params)))(
                bcT_rollout, bc_rnn_state_inits
            )
            return optax.l2_loss(bcTah_Vh, bcTah_Qh).mean()

        loss, grad = jax.value_and_grad(get_loss)(Vh_train_state.params)
        critic_has_nan = has_any_nan_or_inf(grad).astype(jnp.float32)
        grad, grad_norm = compute_norm_and_clip(grad, self.max_grad_norm)
        Vh_train_state = Vh_train_state.apply_gradients(grads=grad)
        return Vh_train_state, {
            "Vh/loss": loss,
            "Vh/grad_norm": grad_norm,
            "Vh/has_nan": critic_has_nan,
            "Vh/max_target": jnp.max(bcTah_Qh),
            "Vh/min_target": jnp.min(bcTah_Qh),
        }

    def update_lagr(self, ah_lagr: Array, policy_train_state, rollout: Rollout, bTah_Vh, bTah_Ah):
        b_rnn_state_inits = jnp.zeros_like(rollout.rnn_states[:, 0])

        action_key = jr.fold_in(self.key, policy_train_state.step)
        bT_action_keys = jr.split(action_key, rollout.actions.shape[0] * rollout.actions.shape[1]).reshape(
            rollout.actions.shape[:2] + (2,)
        )

        bTa_log_pis, _, _, _ = jax.vmap(
            ft.partial(self.scan_eval_action, actor_params=policy_train_state.params)
        )(rollout.graph, rollout.actions, b_rnn_state_inits, bT_action_keys)

        bTa_ratio = jnp.exp(bTa_log_pis - rollout.log_pis)
        ah_delta = -(bTah_Vh * (1 - self.gamma) + bTa_ratio[:, :, :, None] * bTah_Ah).mean(axis=(0, 1))
        ah_lagr = jax.nn.relu(ah_lagr - ah_delta * self.lr_lagr)
        return ah_lagr, {"policy/lagr_mean": ah_lagr.mean()}

    def save(self, save_dir: str, step: int):
        model_dir = os.path.join(save_dir, str(step))
        os.makedirs(model_dir, exist_ok=True)
        with open(os.path.join(model_dir, "actor.pkl"), "wb") as f:
            pickle.dump(self.policy_train_state.params, f)
        with open(os.path.join(model_dir, "Vl.pkl"), "wb") as f:
            pickle.dump(self.Vl_train_state.params, f)
        with open(os.path.join(model_dir, "Vh.pkl"), "wb") as f:
            pickle.dump(self.Vh_train_state.params, f)

    def load(self, load_dir: str, step: int):
        path = os.path.join(load_dir, str(step))
        self.policy_train_state = self.policy_train_state.replace(params=self._load_pkl(path, "actor.pkl"))
        self.Vl_train_state = self.Vl_train_state.replace(params=self._load_pkl(path, "Vl.pkl"))
        self.Vh_train_state = self.Vh_train_state.replace(params=self._load_pkl(path, "Vh.pkl"))
