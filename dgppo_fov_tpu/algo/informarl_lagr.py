"""InforMARL-Lagrangian: MAPPO with per-(agent,constraint) Lagrange multipliers.

Behavioral parity reference: /root/reference/dgppo/algo/informarl_lagr.py:25-327
(math and metric semantics only — the pipeline decomposition is
`algo/pipeline.py`'s). Deltas vs InforMARL:
 - decomposed Vh critic with global info (informarl_lagr.py:70-82)
 - GAE on clip(costs, min=0) (informarl_lagr.py:209-214)
 - advantage = -Al_norm - mean(lagr * Ah_norm) (informarl_lagr.py:216-231)
 - multiplier ascent lagr <- relu(lagr - lr * slack), with
   slack = -mean(Vh*(1-gamma) + ratio*Ah) (informarl_lagr.py:286-309)
"""
import functools as ft

import jax
import jax.numpy as jnp
import jax.random as jr
import optax
from flax.training.train_state import TrainState
from jax import lax

from ..trainer.data import Rollout
from ..utils.typing import Array, Params
from .informarl import InforMARL
from .modules import ValueNet
from .pipeline import (
    ValuePath,
    efocp_targets,
    fit,
    fresh_chunk_carries,
    minibatch_plan,
    per_agent,
    ppo_ratio,
    scan_minibatches,
    strip_env_states,
    take_chunks,
    take_envs,
    time_normalized,
    unroll_value,
)


class InforMARLLagr(InforMARL):
    config_keys = InforMARL.config_keys + ("lr_Vh", "Vh_gnn_layers", "lagr_init", "lr_lagr")

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
        std_dev_min: float = 1e-5,
        compute_dtype=None,
        stacked_update: bool = False,
        **kwargs,
    ):
        super().__init__(
            env, node_dim, edge_dim, state_dim, action_dim, n_agents, 0.0, actor_gnn_layers, Vl_gnn_layers,
            gamma, lr_actor, lr_Vl, batch_size, epoch_ppo, clip_eps, gae_lambda, coef_ent, max_grad_norm,
            seed, use_rnn, rnn_layers, rnn_step, use_lstm,
            std_dev_min=std_dev_min, compute_dtype=compute_dtype, stacked_update=stacked_update,
        )

        self._store_hyperparameters(locals(), ("lr_Vh", "Vh_gnn_layers", "lagr_init", "lr_lagr"))

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
    def params(self) -> Params:
        return {
            "policy": self.policy_train_state.params,
            "Vl": self.Vl_train_state.params,
            "Vh": self.Vh_train_state.params,
        }

    @property
    def train_states(self) -> dict:
        return {
            "policy": self.policy_train_state,
            "Vl": self.Vl_train_state,
            "Vh": self.Vh_train_state,
        }

    def update(self, rollout: Rollout, step: int) -> dict:
        self._assert_config_frozen()
        _, self.key = jr.split(self.key)
        rollout = strip_env_states(rollout)

        info = {}
        for _ in range(self.epoch_ppo):
            minibatches = minibatch_plan(rollout, self.batch_size, self.rnn_step)
            (
                self.Vl_train_state,
                self.Vh_train_state,
                self.policy_train_state,
                self.ah_lagr,
                info,
            ) = self.update_inner(
                self.Vl_train_state,
                self.Vh_train_state,
                self.policy_train_state,
                self.ah_lagr,
                rollout,
                minibatches,
            )
        return info

    def scan_Vh(self, rollout: Rollout, init_rnn_state: Array, Vh_params: Params):
        # Per-step scan on purpose — see the trunk-hoisting negative result
        # documented on InforMARL.scan_Vl. jax.checkpoint like the sibling
        # scans: update_Vh differentiates through this, and recomputing the
        # per-step critic beats storing all T GNN residuals (scan_Vl note).
        @jax.checkpoint
        def body(rnn_state, graph):
            Vh, new_rnn_state = self.Vh.get_value(Vh_params, graph, rnn_state)
            return new_rnn_state, (Vh, rnn_state)

        final_rnn_state, (values, carries) = lax.scan(body, init_rnn_state, rollout.graph)
        return values, carries, final_rnn_state

    def _unroll_Vh(self, rollout: Rollout, params: Params) -> ValuePath:
        """Recurrent Vh along the batched trajectory, with bootstrap."""
        scan = ft.partial(self.scan_Vh, init_rnn_state=self.init_Vh_rnn_state, Vh_params=params)

        def bootstrap(graph, carry):
            Vh, _ = self.Vh.get_value(params, graph, carry)
            return Vh

        return unroll_value(scan, bootstrap, rollout)

    # Donating the train states lets XLA update params/opt-state in place —
    # they are immediately reassigned from the outputs at the call site.
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
        minibatches: Array,
    ):
        vl = self._unroll_Vl(rollout, Vl_train_state.params)
        vh = self._unroll_Vh(rollout, Vh_train_state.params)

        # Targets: GAE over non-negative costs (informarl_lagr.py:209-214).
        vh_targets, vl_targets = efocp_targets(
            jnp.clip(rollout.costs, min=0), -rollout.rewards,
            vh.with_bootstrap, vl.with_bootstrap, self.gamma, self.gae_lambda,
        )

        task_adv = -per_agent(time_normalized(vl_targets - vl.per_step), self.n_agents)
        constraint_adv = time_normalized(vh_targets - vh.per_step)
        # Lagrangian blend (informarl_lagr.py:216-231).
        adv = task_adv - (constraint_adv * ah_lagr[None, None]).mean(axis=-1)

        def sweep(carry, env_idx):
            vl_state, vh_state, pi_state, lagr = carry
            batch = take_envs(rollout, env_idx)
            vh_state, vh_info = self.update_Vh(
                vh_state, batch, vh_targets[env_idx], vh.carries[env_idx]
            )
            vl_state, pi_state, fit_info = self._fit_vl_policy(
                vl_state, pi_state, batch, vl_targets[env_idx], vl.carries[env_idx], adv[env_idx]
            )
            lagr, lagr_info = self.update_lagr(
                lagr, pi_state, batch, vh.per_step[env_idx], constraint_adv[env_idx]
            )
            return (vl_state, vh_state, pi_state, lagr), fit_info | vh_info | lagr_info

        (Vl_train_state, Vh_train_state, policy_train_state, ah_lagr), info = scan_minibatches(
            sweep, (Vl_train_state, Vh_train_state, policy_train_state, ah_lagr), minibatches
        )
        return Vl_train_state, Vh_train_state, policy_train_state, ah_lagr, info

    def update_Vh(self, Vh_train_state, rollout: Rollout, targets, carries):
        chunked = take_chunks(rollout, self.rnn_step)
        chunk_targets = take_chunks(targets, self.rnn_step)
        carry0 = fresh_chunk_carries(carries, self.rnn_step)

        def l2_to_targets(params):
            preds, _, _ = jax.vmap(jax.vmap(ft.partial(self.scan_Vh, Vh_params=params)))(chunked, carry0)
            return optax.l2_loss(preds, chunk_targets).mean()

        return fit(
            Vh_train_state, l2_to_targets, self.max_grad_norm, "Vh",
            extra_metrics={"Vh/max_target": jnp.max(chunk_targets), "Vh/min_target": jnp.min(chunk_targets)},
        )

    def update_lagr(self, ah_lagr: Array, policy_train_state, rollout: Rollout, vh_steps, constraint_adv):
        """Dual ascent on the per-(agent,constraint) multipliers
        (informarl_lagr.py:286-309): slack mixes the stationary constraint
        value with the importance-weighted constraint advantage; a relu keeps
        the multipliers non-negative."""
        carry0 = jnp.zeros_like(rollout.rnn_states[:, 0])
        entropy_keys = self._entropy_keys(rollout, policy_train_state.step)

        logp_new, _, _, _ = jax.vmap(
            ft.partial(self.scan_eval_action, actor_params=policy_train_state.params)
        )(rollout.graph, rollout.actions, carry0, entropy_keys)

        ratio = ppo_ratio(logp_new, rollout.log_pis)
        slack = -(vh_steps * (1 - self.gamma) + ratio[..., None] * constraint_adv).mean(axis=(0, 1))
        ah_lagr = jax.nn.relu(ah_lagr - slack * self.lr_lagr)
        return ah_lagr, {"policy/lagr_mean": ah_lagr.mean()}

    CKPT_NETS = InforMARL.CKPT_NETS + (("Vh", "Vh_train_state"),)
