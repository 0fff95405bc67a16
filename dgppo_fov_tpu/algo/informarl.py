"""InforMARL: MAPPO with a GNN encoder (baseline PPO algorithm).

Behavioral parity reference: /root/reference/dgppo/algo/informarl.py:28-472.
Structure preserved exactly:
 - jit-vmapped rollout collector (informarl.py:177-186,254-256)
 - update: host-side env shuffle into minibatches of whole trajectories
   (informarl.py:268-273)
 - update_inner (jit, donates train states): scan Vl over T, bootstrap final
   value, GAE with cost folded into the loss via cost_weight schedule
   (informarl.py:324-331), per-env advantage normalization over time
   (informarl.py:334-336), lax.scan over minibatches of {update_Vl,
   update_policy}
 - update_policy re-evaluates log-probs by scanning the RNN in chunks with
   zero initial state (truncated-BPTT, informarl.py:405-438); PPO clip loss +
   entropy bonus
 - update_Vl: L2 to GAE targets (informarl.py:357-385)
 - gradient global-norm clip + NaN counters + optax.apply_if_finite(1e6)
"""
import functools as ft
import os
import pickle
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import jax.random as jr
import jax.tree_util as jtu
import numpy as np
import optax
from flax.training.train_state import TrainState
from jax import lax

from ..graph import nominal_graph
from ..trainer.data import Rollout
from ..trainer.rollout import rollout as rollout_fn
from ..trainer.utils import compute_norm_and_clip, has_any_nan_or_inf
from ..utils.typing import Action, Array, Params, PRNGKey
from .base import Algorithm
from .gae import compute_dec_ocp_gae
from .modules import PPOPolicy, ValueNet


class InforMARL(Algorithm):
    def __init__(
        self,
        env,
        node_dim: int,
        edge_dim: int,
        state_dim: int,
        action_dim: int,
        n_agents: int,
        cost_weight: float = 0.0,
        actor_gnn_layers: int = 2,
        Vl_gnn_layers: int = 2,
        gamma: float = 0.99,
        lr_actor: float = 3e-4,
        lr_Vl: float = 1e-3,
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
        cost_schedule: bool = False,
        train_steps: int = 100_000,
        compute_dtype=None,
        **kwargs,
    ):
        super().__init__(env=env, node_dim=node_dim, edge_dim=edge_dim, action_dim=action_dim, n_agents=n_agents)

        self.cost_weight = cost_weight
        self.actor_gnn_layers = actor_gnn_layers
        self.Vl_gnn_layers = Vl_gnn_layers
        self.gamma = gamma
        self.lr_actor = lr_actor
        self.lr_Vl = lr_Vl
        self.batch_size = batch_size
        self.epoch_ppo = epoch_ppo
        self.clip_eps = clip_eps
        self.gae_lambda = gae_lambda
        self.coef_ent = coef_ent
        self.max_grad_norm = max_grad_norm
        self.seed = seed
        self.use_rnn = use_rnn
        self.rnn_layers = rnn_layers
        self.rnn_step = rnn_step
        self.use_lstm = use_lstm
        self.cost_schedule = cost_schedule
        self.compute_dtype = compute_dtype

        self.nominal_graph = nominal_graph(env.graph_spec)

        # ---- policy -------------------------------------------------------
        self.policy = PPOPolicy(
            node_dim=node_dim,
            edge_dim=edge_dim,
            n_agents=n_agents,
            action_dim=action_dim,
            use_rnn=use_rnn,
            rnn_layers=rnn_layers,
            gnn_layers=actor_gnn_layers,
            gnn_out_dim=64,
            use_lstm=use_lstm,
            compute_dtype=compute_dtype,
        )

        key = jr.PRNGKey(seed)
        rnn_state_key, key = jr.split(key)
        self.init_rnn_state = self.policy.init_rnn_state(rnn_state_key)

        policy_key, key = jr.split(key)
        policy_params = self.policy.init(policy_key, self.nominal_graph, self.init_rnn_state)
        self.policy_optim = optax.apply_if_finite(optax.adam(learning_rate=lr_actor), 1_000_000)
        self.policy_train_state = TrainState.create(
            apply_fn=self.policy.sample_action, params=policy_params, tx=self.policy_optim
        )

        # ---- centralized Vl critic -----------------------------------------
        self.Vl = ValueNet(
            node_dim=node_dim,
            edge_dim=edge_dim,
            n_agents=n_agents,
            use_rnn=use_rnn,
            rnn_layers=rnn_layers,
            gnn_layers=Vl_gnn_layers,
            gnn_out_dim=64,
            use_lstm=use_lstm,
            decompose=False,
            compute_dtype=compute_dtype,
        )
        rnn_state_key, key = jr.split(key)
        self.init_Vl_rnn_state = self.Vl.init_rnn_state(rnn_state_key, n_slots=1)

        Vl_key, key = jr.split(key)
        Vl_params = self.Vl.init(Vl_key, self.nominal_graph, self.init_Vl_rnn_state)
        self.Vl_optim = optax.apply_if_finite(optax.adam(learning_rate=lr_Vl), 1_000_000)
        self.Vl_train_state = TrainState.create(apply_fn=self.Vl.get_value, params=Vl_params, tx=self.Vl_optim)

        self.key = key

        # ---- jitted rollout collector ---------------------------------------
        def rollout_fn_single(cur_params, cur_key):
            return rollout_fn(self._env, ft.partial(self.step, params=cur_params), self.init_rnn_state, cur_key)

        def rollout_fn_batch(cur_params, cur_keys):
            return jax.vmap(ft.partial(rollout_fn_single, cur_params))(cur_keys)

        self.rollout_fn = jax.jit(rollout_fn_batch)

        # ---- cost weight schedule -------------------------------------------
        if self.cost_schedule:
            self.cost_schedule_fn = optax.piecewise_constant_schedule(
                init_value=cost_weight,
                boundaries_and_scales={int(train_steps * 0.5): 5, int(train_steps * 0.75): 5},
            )
        else:
            self.cost_schedule_fn = optax.constant_schedule(cost_weight)

    # ------------------------------------------------------------------------
    @property
    def config(self) -> dict:
        return {
            "cost_weight": self.cost_weight,
            "actor_gnn_layers": self.actor_gnn_layers,
            "Vl_gnn_layers": self.Vl_gnn_layers,
            "gamma": self.gamma,
            "lr_actor": self.lr_actor,
            "lr_Vl": self.lr_Vl,
            "batch_size": self.batch_size,
            "epoch_ppo": self.epoch_ppo,
            "clip_eps": self.clip_eps,
            "gae_lambda": self.gae_lambda,
            "coef_ent": self.coef_ent,
            "max_grad_norm": self.max_grad_norm,
            "seed": self.seed,
            "use_rnn": self.use_rnn,
            "rnn_layers": self.rnn_layers,
            "rnn_step": self.rnn_step,
            "use_lstm": self.use_lstm,
            "cost_schedule": self.cost_schedule,
        }

    @property
    def params(self) -> Params:
        return {"policy": self.policy_train_state.params, "Vl": self.Vl_train_state.params}

    def act(self, graph, rnn_state, params: Optional[Params] = None) -> Tuple[Action, Array]:
        if params is None:
            params = self.params
        action, rnn_state = self.policy.get_action(params["policy"], graph, rnn_state)
        return action, rnn_state

    def step(self, graph, rnn_state, key: PRNGKey, params: Optional[Params] = None) -> Tuple[Action, Array, Array]:
        if params is None:
            params = self.params
        action, log_pi, rnn_state = self.policy.sample_action(params["policy"], graph, rnn_state, key)
        return action, log_pi, rnn_state

    def collect(self, params: Params, b_key: PRNGKey) -> Rollout:
        return self.rollout_fn(params, b_key)

    # ------------------------------------------------------------------------
    def update(self, rollout: Rollout, step: int) -> dict:
        key, self.key = jr.split(self.key)

        # Strip env_states before entering jit (informarl.py:261-264).
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
            Vl_train_state, policy_train_state, update_info = self.update_inner(
                self.Vl_train_state, self.policy_train_state, rollout, batch_idx, rnn_chunk_ids, jnp.array(step)
            )
            self.Vl_train_state = Vl_train_state
            self.policy_train_state = policy_train_state
        return update_info

    def scan_Vl(self, rollout: Rollout, init_Vl_rnn_state: Array, Vl_params: Params):
        # Per-step scan of the FULL critic (GNN + head + GRU) on purpose.
        # Measured alternative (2026-08, one v5-class chip, 15.75G HBM,
        # 2048 envs x T=128): hoisting the carry-independent GNN trunk out of
        # the scan and batching it over all T was 20% SLOWER end-to-end
        # (0.42 vs 0.53 updates/s) — the batched trunk streams (b*T)-sized
        # activations through HBM while the scan keeps a 2048-graph working
        # set local; without remat the batched variant OOMs outright (16.2G,
        # 56x padding expansion on the small-feature tensors). Keep the scan.
        #
        # jax.checkpoint: recompute the per-step critic in the backward pass
        # instead of storing scan residuals — the model is small enough that
        # recompute beats the HBM traffic (measured 1.5x on update_Vl @2048 envs).
        @jax.checkpoint
        def body(rnn_state, graph):
            value, new_rnn_state = self.Vl.get_value(Vl_params, graph, rnn_state)
            return new_rnn_state, (value, rnn_state)

        final_rnn_state, (T11_Vl, T_rnn_states) = lax.scan(body, init_Vl_rnn_state, rollout.graph)
        return T11_Vl.squeeze(1).squeeze(1), T_rnn_states, final_rnn_state

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

        # GAE with cost folded into the loss (informarl.py:324-331).
        cost_weight = self.cost_schedule_fn(step)
        bTp1ah_Vh = jnp.broadcast_to(
            bTp1_Vl[:, :, None, None], (b, T + 1, self.n_agents, rollout.costs.shape[-1])
        )
        bT_l = -rollout.rewards + cost_weight * jnp.maximum(rollout.costs, 0.0).sum(axis=-1).sum(axis=-1)
        bTah_Qh, bT_Ql = jax.vmap(
            ft.partial(compute_dec_ocp_gae, disc_gamma=self.gamma, gae_lambda=self.gae_lambda)
        )(rollout.costs, bT_l, bTp1ah_Vh, bTp1_Vl)
        del bTah_Qh

        bT_Al = bT_Ql - bT_Vl
        bT_Al = (bT_Al - bT_Al.mean(axis=1, keepdims=True)) / (bT_Al.std(axis=1, keepdims=True) + 1e-8)
        bTa_A = -jnp.repeat(bT_Al[:, :, None], self.n_agents, axis=-1)

        def update_fn(carry, idx):
            Vl_model, policy_model = carry
            rollout_batch = jtu.tree_map(lambda x: x[idx], rollout)
            Vl_model, Vl_info = self.update_Vl(Vl_model, rollout_batch, bT_Ql[idx], bT_Vl_rnn_states[idx], rnn_chunk_ids)
            policy_model, policy_info = self.update_policy(policy_model, rollout_batch, bTa_A[idx], rnn_chunk_ids)
            return (Vl_model, policy_model), (Vl_info | policy_info)

        (Vl_train_state, policy_train_state), info = lax.scan(
            update_fn, (Vl_train_state, policy_train_state), batch_idx
        )
        info = jtu.tree_map(lambda x: x[-1], info)
        return Vl_train_state, policy_train_state, info

    # ------------------------------------------------------------------------
    def update_Vl(self, Vl_train_state, rollout: Rollout, bT_targets, bT_rnn_states, rnn_chunk_ids):
        bcT_rollout = jtu.tree_map(lambda x: x[:, rnn_chunk_ids], rollout)
        bcT_targets = bT_targets[:, rnn_chunk_ids]
        # Zero initial RNN state per chunk (truncated BPTT, informarl.py:367).
        bc_rnn_state_inits = jnp.zeros_like(bT_rnn_states[:, rnn_chunk_ids[:, 0]])

        def get_loss(params):
            bcT_Vl, _, _ = jax.vmap(jax.vmap(ft.partial(self.scan_Vl, Vl_params=params)))(
                bcT_rollout, bc_rnn_state_inits
            )
            return optax.l2_loss(bcT_Vl, bcT_targets).mean()

        loss, grad = jax.value_and_grad(get_loss)(Vl_train_state.params)
        critic_has_nan = has_any_nan_or_inf(grad).astype(jnp.float32)
        grad, grad_norm = compute_norm_and_clip(grad, self.max_grad_norm)
        Vl_train_state = Vl_train_state.apply_gradients(grads=grad)
        return Vl_train_state, {
            "Vl/loss": loss,
            "Vl/grad_norm": grad_norm,
            "Vl/has_nan": critic_has_nan,
            "Vl/max_target": jnp.max(bT_targets),
            "Vl/min_target": jnp.min(bT_targets),
        }

    def scan_eval_action(self, T_graphs, Ta_actions, init_rnn_state, T_action_keys, actor_params):
        # Per-step scan of the full policy on purpose — see the measured
        # trunk-hoisting negative result documented on scan_Vl.
        # jax.checkpoint: measured 1.5x on update_policy @2048 envs.
        @jax.checkpoint
        def body(rnn_state, inp):
            graph, action, key = inp
            log_pi, entropy, new_rnn_state = self.policy.eval_action(actor_params, graph, action, rnn_state, key)
            return new_rnn_state, (log_pi, entropy, rnn_state)

        final_rnn_state, (Ta_log_pis, Ta_entropies, T_rnn_states) = lax.scan(
            body, init_rnn_state, (T_graphs, Ta_actions, T_action_keys)
        )
        return Ta_log_pis, Ta_entropies, T_rnn_states, final_rnn_state

    def update_policy(self, policy_train_state, rollout: Rollout, bTa_A, rnn_chunk_ids):
        bcT_graph = jtu.tree_map(lambda x: x[:, rnn_chunk_ids], rollout.graph)
        bcTa_action = rollout.actions[:, rnn_chunk_ids]
        bcTa_log_pis_old = rollout.log_pis[:, rnn_chunk_ids]
        bcTa_A = bTa_A[:, rnn_chunk_ids]
        bc_rnn_state_inits = jnp.zeros_like(rollout.rnn_states[:, rnn_chunk_ids[:, 0]])

        action_key = jr.fold_in(self.key, policy_train_state.step)
        action_keys = jr.split(action_key, rollout.actions.shape[0] * rollout.actions.shape[1]).reshape(
            rollout.actions.shape[:2] + (2,)
        )
        bcT_action_keys = action_keys[:, rnn_chunk_ids]

        def get_loss(params):
            bcTa_log_pis, bcTa_entropy, _, _ = jax.vmap(
                jax.vmap(ft.partial(self.scan_eval_action, actor_params=params))
            )(bcT_graph, bcTa_action, bc_rnn_state_inits, bcT_action_keys)

            bcTa_ratio = jnp.exp(bcTa_log_pis - bcTa_log_pis_old)
            loss_policy1 = -bcTa_ratio * bcTa_A
            loss_policy2 = -jnp.clip(bcTa_ratio, 1.0 - self.clip_eps, 1.0 + self.clip_eps) * bcTa_A
            clip_frac = jnp.mean(loss_policy2 > loss_policy1)
            loss_policy = jnp.maximum(loss_policy1, loss_policy2).mean()
            total_entropy = bcTa_entropy.mean()
            policy_loss = loss_policy - self.coef_ent * total_entropy
            tv_dist = 0.5 * jnp.mean(jnp.abs(bcTa_ratio - 1.0))
            return policy_loss, {
                "policy/clip_frac": clip_frac,
                "policy/entropy": total_entropy,
                "policy/total_variation_dist": tv_dist,
            }

        (loss, info), grad = jax.value_and_grad(get_loss, has_aux=True)(policy_train_state.params)
        policy_has_nan = has_any_nan_or_inf(grad).astype(jnp.float32)
        grad, grad_norm = compute_norm_and_clip(grad, self.max_grad_norm)
        policy_train_state = policy_train_state.apply_gradients(grads=grad)

        info = {
            "policy/loss": loss,
            "policy/grad_norm": grad_norm,
            "policy/has_nan": policy_has_nan,
            "policy/log_pi_min": rollout.log_pis.min(),
        } | info
        return policy_train_state, info

    # ------------------------------------------------------------------------
    def save(self, save_dir: str, step: int):
        model_dir = os.path.join(save_dir, str(step))
        os.makedirs(model_dir, exist_ok=True)
        with open(os.path.join(model_dir, "actor.pkl"), "wb") as f:
            pickle.dump(self.policy_train_state.params, f)
        with open(os.path.join(model_dir, "Vl.pkl"), "wb") as f:
            pickle.dump(self.Vl_train_state.params, f)

    @staticmethod
    def _load_pkl(path: str, name: str):
        from ..utils.ref_remap import looks_like_reference_params

        with open(os.path.join(path, name), "rb") as f:
            params = pickle.load(f)
        if looks_like_reference_params(params):
            raise ValueError(
                f"{os.path.join(path, name)} uses the ORIGINAL reference's param "
                "layout. Evaluate it with `test.py --load-reference`, or remap it "
                "with dgppo_fov_tpu.utils.ref_remap.load_reference_checkpoint()."
            )
        return params

    def load(self, load_dir: str, step: int):
        path = os.path.join(load_dir, str(step))
        self.policy_train_state = self.policy_train_state.replace(params=self._load_pkl(path, "actor.pkl"))
        self.Vl_train_state = self.Vl_train_state.replace(params=self._load_pkl(path, "Vl.pkl"))
