"""DGPPO — Discrete GCBF Proximal Policy Optimization (the paper algorithm).

Behavioral parity reference: /root/reference/dgppo/algo/dgppo.py:25-321
(math and metric semantics only — the pipeline decomposition is
`algo/pipeline.py`'s). Deltas vs InforMARLLagr:
 - Vh critic uses *local info only*, no RNN (use_lstm=False, decompose=True,
   use_global_info=False; dgppo.py:83-95)
 - a second *deterministic-policy* rollout per update fits Vh
   (dgppo.py:107-117, 139-141, 282-283, 296-321)
 - discrete-CBF advantage (pipeline.discrete_cbf; dgppo.py:246-247) merged
   with the task advantage via the safe-data gate (pipeline.fuse_task_with_cbf;
   dgppo.py:250-259); cbf weight x2 at 50%/75% when cbf_schedule
   (dgppo.py:73-80)
"""
import functools as ft
from typing import Optional

import jax
import jax.numpy as jnp
import jax.random as jr
import optax
from flax.training.train_state import TrainState

from ..graph import BlockGraph
from ..trainer.data import Rollout
from ..trainer.rollout import test_rollout as det_rollout_fn
from ..utils.tree import lax_chunk_vmap
from ..utils.typing import Array, Params
from .informarl_lagr import InforMARLLagr
from .modules import ValueNet
from .pipeline import (
    discrete_cbf,
    efocp_targets,
    fit,
    fuse_task_with_cbf,
    minibatch_plan,
    per_agent,
    scan_minibatches,
    strip_env_states,
    take_chunks,
    take_envs,
    time_normalized,
)


class DGPPO(InforMARLLagr):
    config_keys = InforMARLLagr.config_keys + ("alpha", "cbf_eps", "cbf_weight", "cbf_schedule")

    # Env-axis chunk bound for the whole-rollout Vh forwards in
    # _constraint_path (tests override it to exercise the chunked path at
    # tiny shapes). Like every algorithm hyperparameter, it is read at
    # update_inner TRACE time (jit is keyed on static self): set it before
    # the first update; later mutation is silently ignored by the cached
    # executable. Measured on the 15.75 GB v5e chip (T=128): unchunked,
    # n_env=4096 needs 22.7 GB (OOM); chunked at 2048 it misses by 27 MB;
    # chunked at 1024 it fits, and the 2048-env headline update is
    # perf-neutral chunked vs not (0.535 vs 0.534 updates/s).
    VH_FWD_ENV_CHUNK = 1024

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
        std_dev_min: float = 1e-5,
        compute_dtype=None,
        stacked_update: bool = False,
        **kwargs,
    ):
        super().__init__(
            env, node_dim, edge_dim, state_dim, action_dim, n_agents, actor_gnn_layers, Vl_gnn_layers,
            Vh_gnn_layers, gamma, lr_actor, lr_Vl, lr_Vh, batch_size, epoch_ppo, clip_eps, gae_lambda,
            coef_ent, max_grad_norm, seed, use_rnn, rnn_layers, rnn_step, use_lstm,
            std_dev_min=std_dev_min, compute_dtype=compute_dtype, stacked_update=stacked_update,
        )

        self._store_hyperparameters(locals(), ("alpha", "cbf_eps", "cbf_weight", "cbf_schedule"))

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

    def get_Vh(self, graph: BlockGraph, rnn_state: Array, params: Optional[Params] = None) -> Array:
        if params is None:
            params = self.params
        Vh, _ = self.Vh.get_value(params["Vh"], graph, rnn_state)
        return Vh

    def _cbf_weight_at(self, step):
        return self.cbf_schedule_fn(step) if self.cbf_schedule else self.cbf_weight

    def _constraint_path(self, rollout: Rollout, vh_params, policy_params) -> Array:
        """Vh along a batched rollout: the critic is stateless (the stored
        policy carry is merely passed through), so every step evaluates in
        parallel; the bootstrap advances the policy carry once at the final
        graph before reading Vh there (dgppo.py:219-229). Returns the
        (b, T+1, a, h) path."""
        read_vh = ft.partial(self.get_Vh, params={"Vh": vh_params})
        # Whole-rollout forward: chunk the env axis past VH_FWD_ENV_CHUNK so
        # the per-step edge activations ([b, T, edges, 3*dim]) stay under
        # HBM — at n_env=4096, T=128 the unchunked temp alone is 10.1 GB.
        # <= VH_FWD_ENV_CHUNK envs compiles to the identical unchunked HLO;
        # the chunked path is bitwise-equal and measured perf-neutral at the
        # 2048-env headline shape (tests/test_algo_dgppo.py).
        vh_steps = lax_chunk_vmap(
            jax.vmap(read_vh), (rollout.graph, rollout.rnn_states), self.VH_FWD_ENV_CHUNK
        )

        def bootstrap(graph, carries):
            _, last_carry = self.act(graph, carries[-1], {"policy": policy_params})
            return read_vh(graph, last_carry)

        vh_final = jax.vmap(bootstrap)(rollout.final_graph, rollout.rnn_states)
        return jnp.concatenate([vh_steps, vh_final[:, None]], axis=1)

    def update(self, rollout: Rollout, step: int) -> dict:
        self._assert_config_frozen()
        key, self.key = jr.split(self.key)

        # Deterministic rollout for Vh fitting (dgppo.py:139-141).
        det_rollout = self.det_rollout_fn(self.params, jr.split(key, rollout.dones.shape[0]))

        rollout = strip_env_states(rollout)
        det_rollout = strip_env_states(det_rollout)

        info = {}
        for _ in range(self.epoch_ppo):
            minibatches = minibatch_plan(rollout, self.batch_size, self.rnn_step)
            (
                self.Vl_train_state,
                self.Vh_train_state,
                self.policy_train_state,
                info,
            ) = self.update_inner(
                self.Vl_train_state,
                self.Vh_train_state,
                self.policy_train_state,
                rollout,
                det_rollout,
                minibatches,
                jnp.array(step),
            )
        return info

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
        minibatches: Array,
        step: Array,
    ):
        vl = self._unroll_Vl(rollout, Vl_train_state.params)
        vh_path = self._constraint_path(rollout, Vh_train_state.params, policy_train_state.params)

        # Task targets via Dec-EFOCP GAE (dgppo.py:231-237).
        _, vl_targets = efocp_targets(
            rollout.costs, -rollout.rewards, vh_path, vl.with_bootstrap, self.gamma, self.gae_lambda
        )
        task_adv = per_agent(time_normalized(vl_targets - vl.per_step), self.n_agents)

        # Safety terms and the gated merge (dgppo.py:246-259).
        cbf = discrete_cbf(vh_path, self._env.dt, self.alpha, self.cbf_eps)
        adv, safe_frac = fuse_task_with_cbf(task_adv, cbf, self._cbf_weight_at(step))

        # Vh targets come from the deterministic rollout (dgppo.py:261-273).
        # The task-value bootstrap row passed to the GAE is the STOCHASTIC
        # rollout's — the reference passes it unchanged; kept for parity.
        det_vh_path = self._constraint_path(det_rollout, Vh_train_state.params, policy_train_state.params)
        det_vh_targets, _ = efocp_targets(
            det_rollout.costs, -det_rollout.rewards, det_vh_path, vl.with_bootstrap,
            self.gamma, self.gae_lambda,
        )

        def sweep(carry, env_idx):
            vl_state, vh_state, pi_state = carry
            batch = take_envs(rollout, env_idx)
            vh_state, vh_info = self.update_Vh(
                vh_state, take_envs(det_rollout, env_idx), det_vh_targets[env_idx]
            )
            vl_state, pi_state, fit_info = self._fit_vl_policy(
                vl_state, pi_state, batch, vl_targets[env_idx], vl.carries[env_idx], adv[env_idx]
            )
            return (vl_state, vh_state, pi_state), fit_info | vh_info

        (Vl_train_state, Vh_train_state, policy_train_state), info = scan_minibatches(
            sweep, (Vl_train_state, Vh_train_state, policy_train_state), minibatches
        )
        return Vl_train_state, Vh_train_state, policy_train_state, info | {"eval/safe_data": safe_frac}

    def update_Vh(self, Vh_train_state, det_batch: Rollout, det_targets):
        """L2 fit of Vh to deterministic-rollout GAE targets (dgppo.py:296-321).

        The replay reads the DET rollout's stored rnn_states (the policy's
        carries along the det trajectory, dgppo.py:219-229). The reference's
        update_Vh takes an extra rnn-states argument it never reads
        (reference dgppo.py:296-321 — the stochastic rollout's carries were
        passed next to det graphs); that dead parameter is dropped here.
        """
        chunked = take_chunks(det_batch, self.rnn_step)
        chunk_targets = take_chunks(det_targets, self.rnn_step)

        def l2_to_det_targets(params):
            read_vh = ft.partial(self.get_Vh, params={"Vh": params})
            preds = jax.vmap(jax.vmap(jax.vmap(read_vh)))(chunked.graph, chunked.rnn_states)
            return optax.l2_loss(preds, chunk_targets).mean()

        return fit(
            Vh_train_state, l2_to_det_targets, self.max_grad_norm, "Vh",
            loss_key="Vh/loss_Vh", norm_key="Vh/grad_Vh_norm", nan_key="Vh/grad_Vh_has_nan",
        )
