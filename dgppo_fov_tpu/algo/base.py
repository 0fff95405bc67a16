"""Abstract algorithm interface.

Behavioral parity reference: /root/reference/dgppo/algo/base.py:10-99.
"""
from abc import ABC, abstractmethod
from typing import Optional, Tuple

from ..graph import BlockGraph
from ..trainer.data import Rollout
from ..utils.typing import Action, Array, Params, PRNGKey


class Algorithm(ABC):
    #: Constructor arguments that form the serialized `config` surface
    #: (the reference exposes config as a per-algorithm hand-written dict,
    #: base.py:30-33; here each algorithm declares its keys once and the
    #: base renders the dict). Subclasses extend the parent tuple.
    config_keys: Tuple[str, ...] = ()

    def __init__(self, env, node_dim: int, edge_dim: int, action_dim: int, n_agents: int):
        self._env = env
        self.node_dim = node_dim
        self.edge_dim = edge_dim
        self.action_dim = action_dim
        self.n_agents = n_agents

    def _store_hyperparameters(self, scope: dict, names: Tuple[str, ...]):
        """setattr the named constructor locals onto self (one declaration
        site per algorithm instead of a wall of `self.x = x`)."""
        for name in names:
            setattr(self, name, scope[name])

    @property
    def config(self) -> dict:
        return {k: getattr(self, k) for k in self.config_keys}

    @property
    @abstractmethod
    def params(self) -> Params: ...

    @abstractmethod
    def act(self, graph: BlockGraph, rnn_state: Array, params: Optional[Params] = None) -> Tuple[Action, Array]:
        """Deterministic action (policy mode)."""

    @abstractmethod
    def step(
        self, graph: BlockGraph, rnn_state: Array, key: PRNGKey, params: Optional[Params] = None
    ) -> Tuple[Action, Array, Array]:
        """Stochastic action + log_pi."""

    @abstractmethod
    def collect(self, params: Params, b_key: PRNGKey) -> Rollout: ...

    @abstractmethod
    def update(self, rollout: Rollout, step: int) -> dict: ...

    @abstractmethod
    def save(self, save_dir: str, step: int): ...

    @abstractmethod
    def load(self, load_dir: str, step: int): ...
