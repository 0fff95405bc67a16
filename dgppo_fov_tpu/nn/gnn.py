"""Block-dense Graph Transformer — masked dense attention over static blocks.

TPU-first re-engineering of the reference GraphTransformer
(/root/reference/dgppo/nn/gnn.py:78-142). The reference computes per-edge
multi-head attention over a flat edge list with `jraph.segment_softmax`
(gather + scatter, batch-hostile). Because every environment's candidate-edge
structure is a static union of dense (receiver-range × sender-range) blocks,
we compute the exact same math as masked dense attention:

  Q = Dense(recv_feats), K = Dense(send_feats), V = Dense(send_feats),
  E = Dense_nobias(edge_feats)                      [gnn.py:85-98]
  logits = <Q, K> / sqrt(out_dim)                   [gnn.py:100]
  attn   = softmax over *all* incoming edges of a receiver across blocks
           (masked entries excluded)                [gnn.py:101 segment_softmax]
  msg    = mean_heads(attn * (V + E))               [gnn.py:104-107]
  node'  = act(Dense(node) + sum_incoming msg)      [gnn.py:109-114]

The softmax normalization spans blocks: we do a numerically-stable two-pass
(global per-receiver max, then exp-sum) with static-slice accumulation —
XLA compiles these to dynamic_update_slice, no scatter. Receivers with zero
unmasked incoming edges get a zero message, matching the reference where such
nodes receive an empty segment_sum.

Equivalence to the reference formulation is tested against a from-scratch
segment-softmax oracle in tests/test_gnn.py.
"""
import math
from typing import Callable

import flax.linen as nn
import jax.numpy as jnp

from ..graph import BlockGraph
from ..utils.typing import Array
from .mlp import MLP, default_nn_init

NEG_INF = -1e30


def shared_receiver_range(blocks) -> bool:
    """True when every block addresses the SAME receiver range. Then one
    masked softmax over the concatenated sender axis is exact, and a final
    layer may compute receiver rows only (`only_recv`). Both decisions must
    come from this single predicate so they can never disagree."""
    return all(
        b.recv_start == blocks[0].recv_start and b.n_recv == blocks[0].n_recv for b in blocks
    )


class _FusedQKVU(nn.Module):
    """The fused Q/K/V/update projection with an optional receiver-restricted
    split: K/V are computed for all nodes (senders), Q/update only for the
    receiver rows. Column-slicing the shared kernel computes bit-identical
    dot products to the full fused matmul, so the param tree ('qkvu': kernel,
    bias) and outputs are unchanged from the single-Dense formulation."""

    n_heads: int
    out_dim: int

    @nn.compact
    def __call__(self, x: Array, recv_slice=None):
        import jax.random as jr

        H, D = self.n_heads, self.out_dim
        d_in = x.shape[-1]

        def fused_init(key, shape, dtype):
            # Identical distribution to four separate orthogonally-initialized
            # Dense layers (each column block initialized independently).
            keys = jr.split(key, 4)
            init = default_nn_init()
            cols = [init(keys[i], (shape[0], H * D), dtype) for i in range(3)]
            cols.append(init(keys[3], (shape[0], D), dtype))
            return jnp.concatenate(cols, axis=1)

        kernel = self.param("kernel", fused_init, (d_in, 3 * H * D + D), x.dtype)
        bias = self.param("bias", nn.initializers.zeros, (3 * H * D + D,), x.dtype)

        if recv_slice is None:
            out = x @ kernel + bias
            q = out[:, : H * D]
            kv = out[:, H * D : 3 * H * D]
            upd = out[:, 3 * H * D :]
        else:
            xr = x[recv_slice]
            kv = x @ kernel[:, H * D : 3 * H * D] + bias[H * D : 3 * H * D]
            q = xr @ kernel[:, : H * D] + bias[: H * D]
            upd = xr @ kernel[:, 3 * H * D :] + bias[3 * H * D :]
        k = kv[:, : H * D]
        v = kv[:, H * D :]
        return q, k, v, upd


class BlockGraphTransformer(nn.Module):
    """One graph-transformer layer over a BlockGraph.

    Returns updated nodes (N, D) — or, with only_recv=True on the shared-
    receiver fast path, just the receiver rows (nr, D): the final layer of a
    GNN stack is only ever read at the receiver (agent) slice, so computing
    Q/update/aggregation/activation for the other ~90% of nodes is wasted
    HBM traffic.
    """

    n_heads: int
    out_dim: int
    act: Callable[[Array], Array] = nn.relu

    @nn.compact
    def __call__(self, graph: BlockGraph, only_recv: bool = False) -> Array:
        spec = graph.spec
        x = graph.nodes  # (N, d)
        N = spec.n_nodes
        H, D = self.n_heads, self.out_dim

        blocks_all = spec.blocks
        shared_recv = shared_receiver_range(blocks_all)
        restrict = only_recv and shared_recv
        recv_slice = blocks_all[0].recv_slice if restrict else None

        q_flat, k_flat, v_flat, upd = _FusedQKVU(H, D, name="qkvu")(x, recv_slice)
        # Restricted: q/upd rows are already exactly the receiver slice.
        q = q_flat.reshape(-1, H, D)
        k = k_flat.reshape(N, H, D)
        v = v_flat.reshape(N, H, D)

        edge_proj = nn.Dense(H * D, use_bias=False, kernel_init=default_nn_init(), name="edge")

        # One edge-projection matmul across all blocks (flatten + concat).
        flat_edges = jnp.concatenate([e.reshape(-1, spec.edge_dim) for e in graph.edges], axis=0)
        flat_eproj = edge_proj(flat_edges)  # (total_edges, H*D)
        offsets = []
        off = 0
        for b in spec.blocks:
            n_e = b.edge_shape[0] * b.edge_shape[1]
            offsets.append((off, n_e))
            off += n_e

        # Per-block logits and projected (V + E) messages. Dense blocks give
        # (nr, ns, ...); diagonal blocks give (nr, chunk, ...) where receiver
        # r's senders are its own contiguous chunk.
        logits = []
        vpe = []
        for (e_off, e_cnt), mask, b in zip(offsets, graph.masks, spec.blocks):
            # Restricted: q holds exactly the (shared) receiver rows already.
            qr = q if restrict else q[b.recv_slice]  # (nr, H, D)
            ks = k[b.send_slice]
            vs = v[b.send_slice]
            eb = flat_eproj[e_off : e_off + e_cnt].reshape(b.edge_shape + (H, D))
            if b.diag_chunk:
                c = b.diag_chunk
                ks = ks.reshape(b.n_recv, c, H, D)
                vs = vs.reshape(b.n_recv, c, H, D)
                lg = jnp.einsum("rhd,rchd->rch", qr, ks) / math.sqrt(D)
                msg = vs + eb
            else:
                lg = jnp.einsum("rhd,shd->rsh", qr, ks) / math.sqrt(D)
                msg = vs[None, :, :, :] + eb
            lg = jnp.where(mask[..., None], lg, NEG_INF)
            logits.append(lg)
            vpe.append(msg)

        # Softmax over each receiver's full incoming-edge set across blocks.
        blocks = spec.blocks
        if shared_recv:
            # Fast path (every env here: receivers are always the agents):
            # concatenate blocks along the sender axis -> ONE masked softmax
            # and ONE weighted-sum einsum; scatter once into the recv slice.
            # Every vpe entry already has leading dim nr (dense: vs[None]+eb
            # broadcasts to (nr, ns, H, D); diag: (nr, c, H, D)).
            nr = blocks[0].n_recv
            lg_cat = jnp.concatenate(logits, axis=1)  # (nr, S, H)
            msg_cat = jnp.concatenate(vpe, axis=1)  # (nr, S, H, D)
            m_max = lg_cat.max(axis=1)  # (nr, H)
            m_safe = jnp.where(m_max <= NEG_INF / 2, 0.0, m_max)
            p = jnp.exp(lg_cat - m_safe[:, None, :])
            p = jnp.where(lg_cat <= NEG_INF / 2, 0.0, p)
            z = p.sum(axis=1)  # (nr, H)
            s = jnp.einsum("rsh,rshd->rhd", p, msg_cat)
            aggr_r = jnp.where(z[..., None] > 0, s / jnp.maximum(z[..., None], 1e-38), 0.0)
            if restrict:
                aggr = aggr_r  # upd is receiver-rows too; no scatter to N
            else:
                # Accumulators take the compute dtype — f32 literals would
                # silently promote the whole layer back to f32 under bf16.
                aggr = jnp.zeros((N, H, D), aggr_r.dtype).at[blocks[0].recv_slice].set(aggr_r)
        else:
            # General path: two-pass accumulation with static-slice updates.
            # (accumulator dtypes follow the compute dtype, as above)
            m = jnp.full((N, H), NEG_INF, logits[0].dtype)
            for lg, b in zip(logits, blocks):
                r = b.recv_slice
                m = m.at[r].set(jnp.maximum(m[r], lg.max(axis=1)))
            m_safe = jnp.where(m <= NEG_INF / 2, 0.0, m)

            z = jnp.zeros((N, H), logits[0].dtype)
            s = jnp.zeros((N, H, D), vpe[0].dtype)
            for lg, msg, mask, b in zip(logits, vpe, graph.masks, blocks):
                r = b.recv_slice
                p = jnp.exp(lg - m_safe[r][:, None, :])
                p = jnp.where(mask[..., None], p, 0.0)
                z = z.at[r].add(p.sum(axis=1))
                s = s.at[r].add(jnp.einsum("rsh,rshd->rhd", p, msg))
            aggr = jnp.where(z[..., None] > 0, s / jnp.maximum(z[..., None], 1e-38), 0.0)

        aggr = aggr.mean(axis=1)  # mean over heads -> (N, D)
        return self.act(upd + aggr)


class GraphTransformerGNN(nn.Module):
    """n-layer stack; last layer width = out_dim, earlier layers = msg_dim.

    Parity: reference GraphTransformerGNN (nn/gnn.py:127-142).
    """

    msg_dim: int
    out_dim: int
    n_heads: int
    n_layers: int

    @nn.compact
    def __call__(self, graph: BlockGraph, node_type: int = None) -> Array:
        spec = graph.spec
        blocks = spec.blocks
        # Final-layer receiver restriction: when the caller only reads one
        # node type and that type IS the shared receiver range of every
        # block, the last layer computes Q/update/softmax/activation for the
        # receiver rows only (~10x fewer rows on lidar graphs).
        shared_recv = shared_receiver_range(blocks)
        restrict_last = False
        if node_type is not None and shared_recv:
            t_slice = spec.type_slice(node_type)
            r = blocks[0]
            restrict_last = t_slice.start == r.recv_start and (t_slice.stop - t_slice.start) == r.n_recv

        for i in range(self.n_layers):
            last = i == self.n_layers - 1
            out_dim = self.out_dim if last else self.msg_dim
            layer = BlockGraphTransformer(self.n_heads, out_dim, act=nn.relu)
            if last and restrict_last:
                return layer(graph, only_recv=True)
            graph = graph.replace(nodes=layer(graph))
        if node_type is None:
            return graph.nodes
        return graph.type_nodes(node_type)


class AttentionAggregation(nn.Module):
    """Alternative GNN layer: MLP message + gated softmax aggregation.

    Parity: reference AttentionAggregation (nn/gnn.py:44-75). Constructible
    via config but unused by the default algorithms (SURVEY.md §2.2).
    """

    msg_dim: int
    out_dim: int
    hid_size_msg: tuple
    hid_size_aggr: tuple
    hid_size_update: tuple

    @nn.compact
    def __call__(self, graph: BlockGraph) -> Array:
        spec = graph.spec
        x = graph.nodes
        N = spec.n_nodes

        msg_net = MLP(hid_sizes=self.hid_size_msg, act=nn.relu, act_final=False, name="msg")
        msg_out = nn.Dense(self.msg_dim, kernel_init=default_nn_init(), name="msg_out")
        attn_net = MLP(hid_sizes=self.hid_size_aggr, act=nn.relu, act_final=False, name="attn")
        attn_out = nn.Dense(1, kernel_init=default_nn_init(), name="attn_out")
        upd_net = MLP(hid_sizes=self.hid_size_update, act=nn.relu, act_final=False, name="update")
        upd_out = nn.Dense(self.out_dim, kernel_init=default_nn_init(), name="update_out")

        msgs, gates = [], []
        for e_feats, mask, b in zip(graph.edges, graph.masks, spec.blocks):
            n_send = b.diag_chunk if b.diag_chunk else b.n_send
            if b.diag_chunk:
                send = x[b.send_slice].reshape(b.n_recv, b.diag_chunk, x.shape[-1])
            else:
                send = jnp.broadcast_to(x[b.send_slice][None, :, :], (b.n_recv, n_send, x.shape[-1]))
            recv = jnp.broadcast_to(x[b.recv_slice][:, None, :], (b.n_recv, n_send, x.shape[-1]))
            feats = jnp.concatenate([e_feats, send, recv], axis=-1)
            mb = msg_out(msg_net(feats))  # (nr, ns, msg_dim)
            gb = attn_out(attn_net(mb)).squeeze(-1)  # (nr, ns)
            gb = jnp.where(mask, gb, NEG_INF)
            msgs.append(mb)
            gates.append(gb)

        # Accumulator dtypes follow the compute dtype (see the same note in
        # BlockGraphTransformer) — f32 literals would defeat bf16 mode.
        m = jnp.full((N,), NEG_INF, gates[0].dtype)
        for gb, b in zip(gates, spec.blocks):
            r = b.recv_slice
            m = m.at[r].set(jnp.maximum(m[r], gb.max(axis=1)))
        m_safe = jnp.where(m <= NEG_INF / 2, 0.0, m)

        z = jnp.zeros((N,), gates[0].dtype)
        s = jnp.zeros((N, self.msg_dim), msgs[0].dtype)
        for gb, mb, mask, b in zip(gates, msgs, graph.masks, spec.blocks):
            r = b.recv_slice
            p = jnp.where(mask, jnp.exp(gb - m_safe[r][:, None]), 0.0)
            z = z.at[r].add(p.sum(axis=1))
            s = s.at[r].add(jnp.einsum("rs,rsd->rd", p, mb))
        aggr = jnp.where(z[:, None] > 0, s / jnp.maximum(z[:, None], 1e-38), 0.0)

        feats = jnp.concatenate([x, aggr], axis=-1)
        return upd_out(upd_net(feats))


class AttentionAggregationGNN(nn.Module):
    """Parity: reference AttentionAggregationGNN (nn/gnn.py:145-171)."""

    msg_dim: int
    hid_size_msg: tuple
    hid_size_aggr: tuple
    hid_size_update: tuple
    out_dim: int
    n_layers: int

    @nn.compact
    def __call__(self, graph: BlockGraph, node_type: int = None) -> Array:
        for i in range(self.n_layers):
            out_dim = self.out_dim if i == self.n_layers - 1 else self.msg_dim
            new_nodes = AttentionAggregation(
                msg_dim=self.msg_dim,
                out_dim=out_dim,
                hid_size_msg=tuple(self.hid_size_msg),
                hid_size_aggr=tuple(self.hid_size_aggr),
                hid_size_update=tuple(self.hid_size_update),
            )(graph)
            graph = graph.replace(nodes=new_nodes)
        if node_type is None:
            return graph.nodes
        return graph.type_nodes(node_type)
