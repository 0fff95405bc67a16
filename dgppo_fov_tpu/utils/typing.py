"""Shape-annotated type aliases used across the framework.

Behavioral parity reference: /root/reference/dgppo/utils/typing.py:1-46.
"""
from typing import Any, Dict, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
PRNGKey = jax.Array

# Per-agent continuous action, shape (n_agents, action_dim).
Action = Array
# Per-agent per-constraint cost, shape (n_agents, n_cost).
Cost = Array
# Scalar task reward.
Reward = Array
Done = Array
Info = Dict[str, Any]

# Node state (physical state of the entity behind a graph node).
State = Array
AgentState = Array
Pos = Array
Radius = Union[float, Array]
BoolScalar = Array

Params = Any
PyTree = Any

AnyFloat = Union[Array, np.ndarray, float]
Shape = tuple

EPS = jnp.finfo(jnp.float32).eps
