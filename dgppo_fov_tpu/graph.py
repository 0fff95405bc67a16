"""Dense block-structured graphs with static layout — the central data structure.

TPU-first redesign of the reference's padded edge-list graph
(/root/reference/dgppo/utils/graph.py:15-247). The reference flattens dense
candidate-edge blocks (`EdgeBlock.make_edges`) into an edge list whose masked
entries point at a padding node, then runs jraph segment ops (gather/scatter)
over it. Here we *keep* the dense `(n_recv, n_send, edge_dim)` blocks plus
boolean masks:

 - every block's receiver/sender node ranges are **static** (known from the
   environment class), so attention becomes masked dense einsums on the MXU
   with zero gather/scatter;
 - node types occupy static contiguous slices, so `type_states` /
   `type_nodes` (reference: utils/graph.py:115-141, a cumsum+scatter) become
   free static slices;
 - no padding node is needed: masked-out edges simply contribute nothing to
   the per-receiver softmax (mathematically identical to the reference's
   segment softmax where masked edges land on the discarded padding node).

`GraphSpec` is fully static/hashable and travels with the graph as pytree aux
data so `vmap`/`scan`/`jit`/`shard_map` all treat it as a compile-time
constant.
"""
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from .utils.typing import Array


class BlockSpec(NamedTuple):
    """Static description of one dense candidate-edge block.

    Receivers are nodes [recv_start, recv_start+n_recv); senders are nodes
    [send_start, send_start+n_send). Two layouts:

     - dense (diag_chunk == 0): every receiver sees every sender; edge
       features are (n_recv, n_send, edge_dim), mask (n_recv, n_send).
     - diagonal (diag_chunk == k > 0): receiver i sees only senders
       [send_start + i*k, send_start + (i+1)*k) — e.g. each agent's own
       top-k LiDAR hits. n_send must equal n_recv * k; edge features are
       (n_recv, k, edge_dim), mask (n_recv, k). This stores k edges per
       receiver instead of n_recv*k — the TPU-native replacement for the
       reference's per-agent 1-row edge blocks
       (/root/reference/dgppo/env/lidar_env/lidar_target.py:79-94).
    """

    name: str
    recv_start: int
    n_recv: int
    send_start: int
    n_send: int
    diag_chunk: int = 0

    @property
    def recv_slice(self) -> slice:
        return slice(self.recv_start, self.recv_start + self.n_recv)

    @property
    def send_slice(self) -> slice:
        return slice(self.send_start, self.send_start + self.n_send)

    @property
    def edge_shape(self):
        if self.diag_chunk:
            assert self.n_send == self.n_recv * self.diag_chunk
            return (self.n_recv, self.diag_chunk)
        return (self.n_recv, self.n_send)


class TypeSpec(NamedTuple):
    """Static node-type slice: nodes [start, start+count) have this type."""

    type_id: int
    start: int
    count: int


class GraphSpec(NamedTuple):
    """Static graph layout for one environment family. Hashable."""

    n_nodes: int
    node_dim: int
    state_dim: int
    edge_dim: int
    types: Tuple[TypeSpec, ...]
    blocks: Tuple[BlockSpec, ...]

    def type_slice(self, type_id: int) -> slice:
        for t in self.types:
            if t.type_id == type_id:
                return slice(t.start, t.start + t.count)
        raise KeyError(f"no node type {type_id} in spec")

    def type_count(self, type_id: int) -> int:
        for t in self.types:
            if t.type_id == type_id:
                return t.count
        raise KeyError(f"no node type {type_id} in spec")


@jtu.register_pytree_node_class
class BlockGraph:
    """Batched-or-single dense block graph.

    Leaves: nodes (..., N, node_dim), states (..., N, state_dim),
    edges/masks per block (..., nr, ns, edge_dim) / (..., nr, ns),
    env_states (arbitrary pytree or None). `spec` is static aux data.
    """

    __slots__ = ("nodes", "states", "edges", "masks", "env_states", "spec")

    def __init__(self, nodes, states, edges, masks, env_states, spec: GraphSpec):
        self.nodes = nodes
        self.states = states
        self.edges = tuple(edges)
        self.masks = tuple(masks)
        self.env_states = env_states
        self.spec = spec

    # ---- pytree protocol -------------------------------------------------
    def tree_flatten(self):
        children = (self.nodes, self.states, self.edges, self.masks, self.env_states)
        return children, self.spec

    @classmethod
    def tree_unflatten(cls, spec, children):
        nodes, states, edges, masks, env_states = children
        return cls(nodes, states, edges, masks, env_states, spec)

    # ---- convenience -----------------------------------------------------
    @property
    def is_single(self) -> bool:
        return self.nodes.ndim == 2

    @property
    def batch_shape(self) -> Tuple[int, ...]:
        return self.nodes.shape[:-2]

    def replace(self, **kw) -> "BlockGraph":
        vals = {k: getattr(self, k) for k in ("nodes", "states", "edges", "masks", "env_states", "spec")}
        vals.update(kw)
        return BlockGraph(**vals)

    def without_env_states(self) -> "BlockGraph":
        return self.replace(env_states=None)

    def type_nodes(self, type_id: int) -> Array:
        """Node features of one type — a free static slice.

        Parity: reference GraphsTuple.type_nodes (utils/graph.py:115-127).
        """
        return self.nodes[..., self.spec.type_slice(type_id), :]

    def type_states(self, type_id: int) -> Array:
        """Node states of one type — a free static slice.

        Parity: reference GraphsTuple.type_states (utils/graph.py:129-141).
        """
        return self.states[..., self.spec.type_slice(type_id), :]

    def __repr__(self) -> str:
        return (
            f"BlockGraph(N={self.spec.n_nodes}, batch={self.batch_shape}, "
            f"blocks={[b.name for b in self.spec.blocks]})"
        )


def build_graph(
    spec: GraphSpec,
    node_feats: Array,
    states: Array,
    edges: Tuple[Array, ...],
    masks: Tuple[Array, ...],
    env_states: Any = None,
) -> BlockGraph:
    """Assemble a single (unbatched) BlockGraph, validating static shapes."""
    assert node_feats.shape == (spec.n_nodes, spec.node_dim), (node_feats.shape, spec)
    assert states.shape == (spec.n_nodes, spec.state_dim), (states.shape, spec)
    assert len(edges) == len(masks) == len(spec.blocks)
    for e, m, b in zip(edges, masks, spec.blocks):
        assert e.shape == b.edge_shape + (spec.edge_dim,), (b.name, e.shape)
        assert m.shape == b.edge_shape, (b.name, m.shape)
    masks = tuple(m.astype(bool) for m in masks)
    return BlockGraph(node_feats, states, edges, masks, env_states, spec)


def nominal_graph(spec: GraphSpec) -> BlockGraph:
    """All-zeros graph with full masks, used to initialize network params.

    Parity: reference nominal graph (algo/informarl.py:88-99).
    """
    nodes = jnp.zeros((spec.n_nodes, spec.node_dim))
    states = jnp.zeros((spec.n_nodes, spec.state_dim))
    edges = tuple(jnp.zeros(b.edge_shape + (spec.edge_dim,)) for b in spec.blocks)
    masks = tuple(jnp.ones(b.edge_shape, dtype=bool) for b in spec.blocks)
    return BlockGraph(nodes, states, edges, masks, None, spec)
