"""Rollout container.

Behavioral parity reference: /root/reference/dgppo/trainer/data.py:8-32.
Batched shape convention: (b, T, ...).
"""
from typing import NamedTuple, Optional

from ..graph import BlockGraph
from ..utils.typing import Action, Array, Cost, Done, Reward


class Rollout(NamedTuple):
    graph: BlockGraph
    actions: Action
    rnn_states: Array
    rewards: Reward
    costs: Cost
    dones: Done
    log_pis: Optional[Array]
    next_graph: BlockGraph

    @property
    def length(self) -> int:
        return self.rewards.shape[0]

    @property
    def time_horizon(self) -> int:
        return self.rewards.shape[1]

    @property
    def n_data(self) -> int:
        return self.length * self.time_horizon
