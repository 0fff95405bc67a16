"""Rollout container.

Behavioral parity reference: /root/reference/dgppo/trainer/data.py:8-32, with
one TPU-motivated difference: the reference stores `next_graph` per step
(trainer/utils.py:50-56) even though every consumer only reads the *final*
next graph (e.g. informarl.py:319 `tree_index(rollout.next_graph, -1)`), and
next_graph[t] == graph[t+1] anyway. Storing both doubles the HBM writes of
every rollout step. We store the trajectory graphs once plus a single
`final_graph` (the graph after the last step), halving graph bandwidth on the
hot rollout loop with identical information content.

Batched shape convention: (b, T, ...); final_graph is (b, ...).
"""
from typing import NamedTuple, Optional

from ..graph import BlockGraph
from ..utils.typing import Action, Array, Cost, Done, Reward


class Rollout(NamedTuple):
    graph: BlockGraph  # (b, T, ...)
    actions: Action  # (b, T, a, nu)
    rnn_states: Array  # (b, T, ...)
    rewards: Reward  # (b, T)
    costs: Cost  # (b, T, a, nh)
    dones: Done  # (b, T)
    log_pis: Optional[Array]  # (b, T, a)
    final_graph: BlockGraph  # (b, ...) — graph after the last step

    # Reference-parity surface (data.py:18-32); unused by this framework's
    # own code paths. NOTE `length` is the reference's name for the BATCH
    # size (axis 0), not the episode length — that is `time_horizon`.
    @property
    def length(self) -> int:
        return self.rewards.shape[0]

    @property
    def time_horizon(self) -> int:
        return self.rewards.shape[1]

    @property
    def n_data(self) -> int:
        return self.length * self.time_horizon
