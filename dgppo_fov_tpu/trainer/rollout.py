"""Single-env rollout collection via lax.scan.

Behavioral parity reference: /root/reference/dgppo/trainer/utils.py:22-86
(`rollout` / `test_rollout`). PRNG usage matches: split(key, 3) -> (key_x0,
key_z0, key) for the stochastic rollout, split(key) -> (key_x0, key) for the
deterministic one; per-step actor keys are split(key, max_episode_steps).

The final carry graph is returned once as `final_graph` instead of stacking
next_graph per step (see trainer/data.py for the rationale).
"""
from typing import Callable

import jax
import jax.numpy as jnp

from ..utils.typing import Array, PRNGKey
from .data import Rollout


def rollout(env, actor: Callable, init_rnn_state: Array, key: PRNGKey) -> Rollout:
    """Stochastic rollout; actor: (graph, rnn_state, key) -> (a, log_pi, rnn)."""
    key_x0, key_z0, key = jax.random.split(key, 3)
    del key_z0
    init_graph = env.reset(key_x0)

    def body(carry, key_):
        graph, rnn_state = carry
        action, log_pi, new_rnn_state = actor(graph, rnn_state, key_)
        next_graph, reward, cost, done, info = env.step(graph, action)
        return (next_graph, new_rnn_state), (graph, action, rnn_state, reward, cost, done, log_pi)

    keys = jax.random.split(key, env.max_episode_steps)
    (final_graph, _), outs = jax.lax.scan(body, (init_graph, init_rnn_state), keys, length=env.max_episode_steps)
    return Rollout(*outs, final_graph)


def test_rollout(env, actor: Callable, init_rnn_state: Array, key: PRNGKey, stochastic: bool = False) -> Rollout:
    """Deterministic (or stochastic) eval rollout; log_pis are zeros."""
    key_x0, key = jax.random.split(key)
    init_graph = env.reset(key_x0)

    def body(carry, key_):
        graph, rnn_state = carry
        if not stochastic:
            action, rnn_state = actor(graph, rnn_state)
        else:
            action, rnn_state = actor(graph, rnn_state, key_)
        next_graph, reward, cost, done, info = env.step(graph, action)
        log_pi = jnp.zeros(action.shape[0])
        return (next_graph, rnn_state), (graph, action, rnn_state, reward, cost, done, log_pi)

    keys = jax.random.split(key, env.max_episode_steps)
    (final_graph, _), outs = jax.lax.scan(body, (init_graph, init_rnn_state), keys, length=env.max_episode_steps)
    return Rollout(*outs, final_graph)
