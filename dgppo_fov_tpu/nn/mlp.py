"""MLP with orthogonal init and pre-activation LayerNorm.

Behavioral parity reference: /root/reference/dgppo/nn/mlp.py:6-30 and
nn/utils.py:20-48 (orthogonal default init, scaled final layer, LayerNorm
applied *before* the activation).
"""
from typing import Callable, Optional, Sequence

import flax.linen as nn

from ..utils.typing import Array

default_nn_init = nn.initializers.orthogonal


def scaled_init(initializer: nn.initializers.Initializer, scale: float) -> nn.initializers.Initializer:
    def init(*args, **kwargs):
        return scale * initializer(*args, **kwargs)

    return init


class MLP(nn.Module):
    hid_sizes: Sequence[int]
    act: Callable[[Array], Array] = nn.relu
    act_final: bool = True
    use_layernorm: bool = True
    scale_final: Optional[float] = None
    dropout_rate: Optional[float] = None

    @nn.compact
    def __call__(self, x: Array, apply_dropout: bool = False) -> Array:
        n = len(self.hid_sizes)
        for i, hid in enumerate(self.hid_sizes):
            last = i == n - 1
            kinit = default_nn_init()
            if last and self.scale_final is not None:
                kinit = scaled_init(default_nn_init(), self.scale_final)
            x = nn.Dense(hid, kernel_init=kinit)(x)
            if not (last and not self.act_final):
                if self.dropout_rate is not None and self.dropout_rate > 0:
                    x = nn.Dropout(rate=self.dropout_rate, deterministic=not apply_dropout)(x)
                if self.use_layernorm:
                    x = nn.LayerNorm()(x)
                x = self.act(x)
        return x
