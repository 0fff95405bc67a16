"""FIFO replay buffer.

Behavioral parity reference: /root/reference/dgppo/trainer/buffer.py:11-54 —
defined there but unused by any algorithm (all are on-policy); kept for API
completeness. Numpy-backed host-side storage with uniform sampling.
"""
from typing import Optional

import numpy as np

from ..utils.tree import jax2np, tree_index


class ReplayBuffer:
    def __init__(self, size: int, seed: int = 0):
        self._size = size
        self._buffer = None
        self._ptr = 0
        self._len = 0
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return self._len

    @property
    def size(self) -> int:
        return self._size

    def append(self, item) -> None:
        """Append one pytree item (host-side)."""
        item = jax2np(item)
        if self._buffer is None:
            import jax.tree_util as jtu

            self._buffer = jtu.tree_map(
                lambda x: np.zeros((self._size,) + np.asarray(x).shape, np.asarray(x).dtype), item
            )
        import jax.tree_util as jtu

        def put(buf, x):
            buf[self._ptr] = x
            return buf

        self._buffer = jtu.tree_map(put, self._buffer, item)
        self._ptr = (self._ptr + 1) % self._size
        self._len = min(self._len + 1, self._size)

    def sample(self, batch_size: int, rng: Optional[np.random.Generator] = None):
        assert self._len > 0, "buffer is empty"
        rng = rng or self._rng
        idx = rng.integers(0, self._len, size=batch_size)
        return tree_index(self._buffer, idx)
