"""Functional multi-agent environment protocol.

Behavioral parity reference: /root/reference/dgppo/env/base.py:30-150.
State lives in the graph (env object is stateless); `reset(key) -> BlockGraph`,
`step(graph, action) -> (BlockGraph, reward, cost, done, info)` — the shape
that `lax.scan` / `vmap` / `shard_map` want.
"""
import pathlib
from abc import ABC, abstractmethod
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from ..graph import BlockGraph, GraphSpec
from ..utils.typing import Action, Array, Cost, Done, Info, Reward, State


class StepResult(NamedTuple):
    graph: BlockGraph
    reward: Reward
    cost: Cost
    done: Done
    info: Info


class MultiAgentEnv(ABC):
    PARAMS = {}

    def __init__(
        self,
        num_agents: int,
        area_size: float,
        max_step: int = 256,
        dt: float = 0.03,
        params: Optional[dict] = None,
    ):
        self._num_agents = num_agents
        self._dt = dt
        if params is None:
            params = dict(self.PARAMS)
        self._params = dict(params)
        self._max_step = max_step
        self._area_size = area_size

    # ---- static metadata ---------------------------------------------------
    @property
    def params(self) -> dict:
        return self._params

    @property
    def num_agents(self) -> int:
        return self._num_agents

    @property
    def area_size(self) -> float:
        return self._area_size

    @property
    def dt(self) -> float:
        return self._dt

    @property
    def max_episode_steps(self) -> int:
        return self._max_step

    @property
    @abstractmethod
    def state_dim(self) -> int: ...

    @property
    @abstractmethod
    def node_dim(self) -> int: ...

    @property
    @abstractmethod
    def edge_dim(self) -> int: ...

    @property
    @abstractmethod
    def action_dim(self) -> int: ...

    @property
    @abstractmethod
    def n_cost(self) -> int: ...

    @property
    @abstractmethod
    def cost_components(self) -> Tuple[str, ...]: ...

    @property
    @abstractmethod
    def graph_spec(self) -> GraphSpec:
        """Static graph layout (node-type slices + candidate-edge blocks)."""

    # ---- dynamics ------------------------------------------------------------
    @abstractmethod
    def reset(self, key: Array) -> BlockGraph: ...

    @abstractmethod
    def step(self, graph: BlockGraph, action: Action, get_eval_info: bool = False) -> StepResult: ...

    @abstractmethod
    def get_cost(self, graph: BlockGraph) -> Cost: ...

    @abstractmethod
    def state_lim(self, state: Optional[State] = None) -> Tuple[State, State]: ...

    @abstractmethod
    def action_lim(self) -> Tuple[Action, Action]: ...

    def clip_state(self, state: State) -> State:
        lower, upper = self.state_lim(state)
        return jnp.clip(state, lower, upper)

    def clip_action(self, action: Action) -> Action:
        lower, upper = self.action_lim()
        return jnp.clip(action, lower, upper)

    # ---- rendering (host-side, off the hot path) ----------------------------
    def render_video(
        self,
        rollout,
        video_path: pathlib.Path,
        Ta_is_unsafe=None,
        viz_opts: dict = None,
        dpi: int = 100,
        **kwargs,
    ) -> None:
        raise NotImplementedError
