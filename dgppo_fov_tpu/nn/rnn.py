"""Multi-layer GRU/LSTM wrapper vmapped over agents.

Behavioral parity reference: /root/reference/dgppo/nn/rnn.py:10-30.
Carry layout (n_layers, n_agents, n_carries, hid): GRU n_carries=1,
LSTM n_carries=2 (stacked (c, h) in that flax order).
"""
from typing import Type, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.typing import Array


class RNN(nn.Module):
    rnn_cls: Union[Type[nn.GRUCell], Type[nn.LSTMCell], object]
    rnn_layers: int

    @nn.compact
    def __call__(self, x: Array, rnn_state: Array):
        """x: (n_agents, feat); rnn_state: (n_layers, n_agents, n_carries, hid)."""
        new_states = []
        for i in range(self.rnn_layers):
            cell = self.rnn_cls()
            if isinstance(cell, nn.GRUCell):
                carry_i, x = jax.vmap(cell)(rnn_state[i, :, 0, :], x)
                carry_i = jnp.expand_dims(carry_i, axis=1)
            elif isinstance(cell, nn.LSTMCell):
                carry = (rnn_state[i, :, 0, :], rnn_state[i, :, 1, :])
                carry_i, x = jax.vmap(cell)(carry, x)
                carry_i = jnp.stack(carry_i, axis=1)
            else:
                raise ValueError(f"Unsupported RNN cell type: {cell}")
            new_states.append(carry_i)
        return x, jnp.stack(new_states)
