"""Cross-network weight stacking: evaluate the policy and Vl networks as ONE
set of double-width kernels.

MEASURED OUTCOME (2026-08-19, live v5-class chip, MPETarget 2048x128,
scripts/exp_stacked_ab.py): the stacked joint sub-update is 662 ms vs
643 ms for the two separate sub-updates — 1.03x, i.e. NO win — so
`stacked_update` defaults to FALSE and this module is an experimental flag.
Why the round-2 hypothesis failed: the sub-updates are bound by streaming
the (8192-graph x 16-step) activations through HBM, not by MXU lane
occupancy — the vmapped batch already gives every 64-wide matmul a ~75k-row
M dimension, so doubling K/N just doubles bytes and the block-diagonal
zero padding burns back the op-count savings. This also explains the two
adjacent round-2 measurements: bf16 neutrality on this path and the width
probe's sublinear-but-not-free 1.45x. The earlier in-scan-assembly cut of
this module measured 0.45 updates/s end-to-end (vs 0.53 separate); hoisting
assembly into `prepare` recovered to 0.49; the remaining gap is the
blockdiag waste. Kept because it is exact, tested, and the trade-off is
shape-dependent (a future config with small batch x wide model could win).

Original motivation (round-2 perf thread): the TBPTT sub-updates dominate
the DGPPO update (~0.95 s of 1.89 s per minibatch pair at 2048x128), and
the width probe (scripts/exp_width_probe.py) measured a 128-wide
update_policy at 1.45x the 64-wide one, i.e. marginal width is ~half price.
The policy and Vl networks read the SAME minibatch graphs in every
sub-update, so their matmuls can be concatenated:

 - first GNN layer + every edge projection: inputs are shared, so kernels
   concatenate along the OUTPUT axis — one matmul, zero wasted FLOPs;
 - later layers / head MLP / GRU / output heads: inputs differ per network,
   so kernels combine BLOCK-DIAGONALLY — the off-diagonal zeros waste FLOPs
   but the measured wall-clock of the wide op is far below 2x;
 - attention runs with 2H stacked heads (policy heads 0..H-1, Vl heads
   H..2H-1): per-head softmax/einsum math is unchanged;
 - LayerNorm and head-mean are computed per SEGMENT (reshape (..., 2, d)),
   never across the two networks.

The kernel assembly happens ONCE per loss evaluation (`prepare`), NOT per
scan step: a first cut that assembled inside the TBPTT scan body measured
0.45 updates/s vs the separate path's 0.53 — the per-step concats plus
their jax.checkpoint recompute and per-step backward slicing cost more than
the wide matmuls saved. `prepare` also pre-permutes the fused-QKVU columns
into head-stacked order ([q_pi|q_vl|k_pi|k_vl|v_pi|v_vl|u_pi|u_vl]) so the
per-step evaluation needs only contiguous slices/reshapes, zero concats.

Exactness: the stacked forward computes the same dot products as the two
separate networks (block-diagonal structure means no cross-terms, and the
f32 sums differ only by accumulation order — zeros are exact additive
identities). Gradients of `loss_pi(pi_params) + loss_vl(vl_params)` are the
exact per-network gradients because each loss depends on only its own tree.
Guarded by tests/test_stacked.py (stacked == separate forward to 1e-5 and
leaf-identical full updates vs the separate path). The leaf-level
reference-parity update tests run with the DEFAULT stacked_update=False;
stacking was additionally checked against them in a one-off forced-on run
(2026-08-18), but that configuration is not part of the suite.

Caveat: prepare()/the specs below hardcode the production architecture
(msg_dim=32, out_dim=64, 3 heads, 2 head layers, GRU 64) rather than
deriving it from the live PPOPolicy/ValueNet; build_stacked() refuses
non-default layer counts/LSTM, and test_stacked.py pins the rest — if the
module wiring in algo/modules.py changes, update both together.

Parity reference for the math being stacked: reference nn/gnn.py:78-142,
nn/mlp.py:6-30, algo/module/policy.py:20-78, algo/module/value.py:15-44 —
see nn/gnn.py, nn/mlp.py, algo/modules.py for the unstacked forms.
"""
import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..graph import BlockGraph, GraphSpec
from ..nn.distribution import TanhNormalDistribution
from ..nn.gnn import NEG_INF, shared_receiver_range
from ..utils.typing import Array, Params
from .modules import _cast_floats, _resolve_dtype

_LN_EPS = 1e-6  # flax LayerNorm default


def _block_diag2(ka: Array, kb: Array) -> Array:
    """[[ka, 0], [0, kb]] for two (in, out) kernels."""
    ia, oa = ka.shape
    ib, ob = kb.shape
    z = jnp.zeros
    return jnp.concatenate(
        [
            jnp.concatenate([ka, z((ia, ob), ka.dtype)], axis=1),
            jnp.concatenate([z((ib, oa), kb.dtype), kb], axis=1),
        ],
        axis=0,
    )


def _stack_dense(p_pi: Params, p_vl: Params, shared_input: bool) -> Dict[str, Array]:
    """One double-width Dense from two same-shape Dense param dicts."""
    if shared_input:
        kernel = jnp.concatenate([p_pi["kernel"], p_vl["kernel"]], axis=1)
    else:
        kernel = _block_diag2(p_pi["kernel"], p_vl["kernel"])
    out = {"kernel": kernel}
    if "bias" in p_pi:
        out["bias"] = jnp.concatenate([p_pi["bias"], p_vl["bias"]])
    return out


def _apply_dense(d: Dict[str, Array], x: Array) -> Array:
    out = x @ d["kernel"]
    return out + d["bias"] if "bias" in d else out


def _head_stack_columns(kernel: Array, bias: Array, H: int, D: int) -> Tuple[Array, Array]:
    """Permute one network-PAIR's fused qkvu columns into head-stacked order.

    Input column layout (from _stack_dense on two fused qkvu kernels, each
    [q HD | k HD | v HD | u D]): [pi-block | vl-block]. Output layout:
    [q_pi | q_vl | k_pi | k_vl | v_pi | v_vl | u_pi | u_vl] so that
    out[:, :2HD].reshape(-1, 2H, D) IS the stacked-head q, etc. — per-step
    slicing becomes contiguous and free.
    """
    w = 3 * H * D + D
    pi, vl = kernel[:, :w], kernel[:, w:]
    bpi, bvl = bias[:w], bias[w:]
    cols = []
    bs = []
    for s in (slice(0, H * D), slice(H * D, 2 * H * D), slice(2 * H * D, 3 * H * D), slice(3 * H * D, w)):
        cols += [pi[:, s], vl[:, s]]
        bs += [bpi[s], bvl[s]]
    return jnp.concatenate(cols, axis=1), jnp.concatenate(bs)


def _seg_layernorm(x_cat: Array, scale: Array, bias: Array) -> Array:
    """LayerNorm per network segment of [pi | vl] features. Matches flax
    LayerNorm(use_fast_variance=True): var = E[x^2] - E[x]^2."""
    rows, two_d = x_cat.shape
    seg = x_cat.reshape(rows, 2, two_d // 2)
    mean = seg.mean(axis=-1, keepdims=True)
    var = jnp.maximum((seg * seg).mean(axis=-1, keepdims=True) - mean * mean, 0.0)
    normed = (seg - mean) * jax.lax.rsqrt(var + _LN_EPS)
    return (normed * scale + bias).reshape(rows, two_d)


class StackedStep(NamedTuple):
    """Outputs of one stacked policy+Vl evaluation."""

    dist: TanhNormalDistribution
    value: Array  # (1, vl_n_out)
    pi_carry: Array
    vl_carry: Array


class StackedVlPolicy:
    """Joint evaluator for a PPOPolicy and a centralized ValueNet (RStateFn)
    that share GNN architecture (width/heads/layers). Pure functions over the
    two UNCHANGED param trees — checkpoints, optimizers, and the separate
    code paths are untouched. Call `prepare` once per loss evaluation, then
    `eval_prepared` per step.
    """

    def __init__(
        self,
        spec: GraphSpec,
        gnn_layers: int,
        action_dim: int,
        msg_dim: int = 32,
        out_dim: int = 64,
        n_heads: int = 3,
        use_rnn: bool = True,
        rnn_layers: int = 1,
        head_layers: int = 2,
        compute_dtype=None,
        std_dev_min: float = 1e-5,
        std_dev_init: float = 0.5,
    ):
        self.spec = spec
        self.gnn_layers = gnn_layers
        self.action_dim = action_dim
        self.msg_dim = msg_dim
        self.out_dim = out_dim
        self.n_heads = n_heads
        self.use_rnn = use_rnn
        self.rnn_layers = rnn_layers
        self.head_layers = head_layers
        self.compute_dtype = _resolve_dtype(compute_dtype)
        self.std_dev_min = std_dev_min
        self.std_init_inv = math.log(math.exp(std_dev_init) - 1.0)

        # The stacked GNN implements only the shared-receiver fast path with
        # the final layer restricted to the (type-0 == receiver) agent rows —
        # callers must check supports_spec() first.
        assert self.supports_spec(spec)

    @staticmethod
    def supports_spec(spec: GraphSpec) -> bool:
        """True when every block shares one receiver range and that range is
        exactly the type-0 (agent) slice — the layout of every env here."""
        if not shared_receiver_range(spec.blocks):
            return False
        t = spec.type_slice(0)
        b = spec.blocks[0]
        return t.start == b.recv_start and (t.stop - t.start) == b.n_recv

    # ---------------------------------------------------------------- prepare
    def prepare(self, pi_params: Params, vl_params: Params) -> Any:
        """Assemble every double-width kernel ONCE (outside the TBPTT scan).

        Returns a plain pytree (dict) of stacked weights; the backward pass
        slices gradients back to the original leaves here, once per loss.
        """
        dt = self.compute_dtype
        if dt is not None:
            pi_params = _cast_floats(pi_params, dt)
            vl_params = _cast_floats(vl_params, dt)
        pi_root = pi_params["params"]
        vl_root = vl_params["params"]
        gnn_pi = pi_root["PolicyNet_0"]["GraphTransformerGNN_0"]
        gnn_vl = vl_root["GraphTransformerGNN_0"]
        H = self.n_heads

        layers = []
        for i in range(self.gnn_layers):
            last = i == self.gnn_layers - 1
            D = self.out_dim if last else self.msg_dim
            lp = gnn_pi[f"BlockGraphTransformer_{i}"]
            lv = gnn_vl[f"BlockGraphTransformer_{i}"]
            # Architecture guard (ADVICE r3): _head_stack_columns slices the
            # fused kernel at offsets derived from (n_heads, D); a width/head
            # change in PPOPolicy/ValueNet that isn't mirrored here would
            # produce silently wrong math, not a shape error. Trace-time
            # asserts make it loud.
            expect_w = 3 * H * D + D  # q,k,v (H heads x D) + update (D)
            for who, tree in (("policy", lp), ("Vl", lv)):
                got = tree["qkvu"]["kernel"].shape[1]
                assert got == expect_w, (
                    f"stacked path built for n_heads={H}, dim={D} but the live "
                    f"{who} GNN layer {i} qkvu kernel is {got} columns wide "
                    f"(expected {expect_w}); update StackedVlPolicy or disable "
                    "stacked_update"
                )
            fused = _stack_dense(lp["qkvu"], lv["qkvu"], shared_input=(i == 0))
            kernel, bias = _head_stack_columns(fused["kernel"], fused["bias"], H, D)
            # Head-stacked column groups: q [0:2HD), k [2HD:4HD), v [4HD:6HD),
            # u [6HD:6HD+2D).
            layer = {
                # Edge features never change across layers -> shared input.
                "edge_kernel": jnp.concatenate([lp["edge"]["kernel"], lv["edge"]["kernel"]], axis=1)
            }
            if last:
                # Receiver-restricted final layer: split the kernel into the
                # k/v columns (all nodes) and q/u columns (receiver rows).
                layer["kv"] = {"kernel": kernel[:, 2 * H * D : 6 * H * D], "bias": bias[2 * H * D : 6 * H * D]}
                layer["qu"] = {
                    "kernel": jnp.concatenate([kernel[:, : 2 * H * D], kernel[:, 6 * H * D :]], axis=1),
                    "bias": jnp.concatenate([bias[: 2 * H * D], bias[6 * H * D :]]),
                }
            else:
                layer["qkvu"] = {"kernel": kernel, "bias": bias}
            layers.append(layer)

        head_pi = pi_root["PolicyNet_0"]["PolicyGNNHead"]
        head_vl = vl_root["ValueGNNHead"]
        head = []
        for i in range(self.head_layers):
            head.append(
                {
                    "dense": _stack_dense(head_pi[f"Dense_{i}"], head_vl[f"Dense_{i}"], shared_input=False),
                    "ln_scale": jnp.stack(
                        [head_pi[f"LayerNorm_{i}"]["scale"], head_vl[f"LayerNorm_{i}"]["scale"]]
                    ),
                    "ln_bias": jnp.stack(
                        [head_pi[f"LayerNorm_{i}"]["bias"], head_vl[f"LayerNorm_{i}"]["bias"]]
                    ),
                }
            )

        rnn = []
        if self.use_rnn:
            rnn_pi = pi_root["PolicyNet_0"]["RNN_0"]
            rnn_vl = vl_root["RNN_0"]
            for i in range(self.rnn_layers):
                cp = rnn_pi[f"GRUCell_{i}"]
                cv = rnn_vl[f"GRUCell_{i}"]
                rnn.append({g: _stack_dense(cp[g], cv[g], shared_input=False)
                            for g in ("ir", "iz", "in", "hr", "hz", "hn")})

        out_head = _stack_dense(pi_root["ScaleHid"], vl_root["Dense_0"], shared_input=False)
        return {
            "gnn": layers,
            "head": head,
            "rnn": rnn,
            "out": out_head,
            "scale_dim": pi_root["ScaleHid"]["kernel"].shape[1],
            "mean_std": dict(pi_root["OutputDenseMeanStd"]),
        }

    # ------------------------------------------------------------------ GNN
    def _gnn(self, layers, graph: BlockGraph) -> Tuple[Array, Array]:
        """Stacked GraphTransformerGNN forward -> (agents_pi, agents_vl),
        each (n_agents, out_dim). Mirrors nn/gnn.py BlockGraphTransformer's
        shared-receiver fast path with a doubled head axis."""
        spec = graph.spec
        H = self.n_heads
        blocks = spec.blocks
        recv_slice = blocks[0].recv_slice

        flat_edges = jnp.concatenate([e.reshape(-1, spec.edge_dim) for e in graph.edges], axis=0)
        offsets = []
        off = 0
        for b in blocks:
            n_e = b.edge_shape[0] * b.edge_shape[1]
            offsets.append((off, n_e))
            off += n_e

        x = graph.nodes  # (N, d_in); becomes [pi | vl] features after layer 0
        for i, layer in enumerate(layers):
            last = i == self.gnn_layers - 1
            D = self.out_dim if last else self.msg_dim

            if last:
                kv = _apply_dense(layer["kv"], x)  # (N, 4HD): [k_pi k_vl v_pi v_vl]
                qu = _apply_dense(layer["qu"], x[recv_slice])  # (nr, 2HD + 2D)
                k = kv[:, : 2 * H * D].reshape(-1, 2 * H, D)
                v = kv[:, 2 * H * D :].reshape(-1, 2 * H, D)
                q_rows = qu[:, : 2 * H * D].reshape(-1, 2 * H, D)
                upd = qu[:, 2 * H * D :]  # (nr, 2D)
            else:
                out = _apply_dense(layer["qkvu"], x)  # (N, 6HD + 2D)
                q = out[:, : 2 * H * D].reshape(-1, 2 * H, D)
                k = out[:, 2 * H * D : 4 * H * D].reshape(-1, 2 * H, D)
                v = out[:, 4 * H * D : 6 * H * D].reshape(-1, 2 * H, D)
                upd = out[:, 6 * H * D :]  # (N, 2D)
                q_rows = q[recv_slice]

            eproj = flat_edges @ layer["edge_kernel"]  # (E, 2HD): [pi | vl] head groups

            logits = []
            vpe = []
            for (e_off, e_cnt), mask, b in zip(offsets, graph.masks, blocks):
                ks = k[b.send_slice]
                vs = v[b.send_slice]
                eb = eproj[e_off : e_off + e_cnt].reshape(b.edge_shape + (2 * H, D))
                if b.diag_chunk:
                    c = b.diag_chunk
                    ks = ks.reshape(b.n_recv, c, 2 * H, D)
                    vs = vs.reshape(b.n_recv, c, 2 * H, D)
                    lg = jnp.einsum("rhd,rchd->rch", q_rows, ks) / math.sqrt(D)
                    msg = vs + eb
                else:
                    lg = jnp.einsum("rhd,shd->rsh", q_rows, ks) / math.sqrt(D)
                    msg = vs[None, :, :, :] + eb
                logits.append(jnp.where(mask[..., None], lg, NEG_INF))
                vpe.append(msg)

            lg_cat = jnp.concatenate(logits, axis=1)  # (nr, S, 2H)
            msg_cat = jnp.concatenate(vpe, axis=1)  # (nr, S, 2H, D)
            m_max = lg_cat.max(axis=1)
            m_safe = jnp.where(m_max <= NEG_INF / 2, 0.0, m_max)
            p = jnp.exp(lg_cat - m_safe[:, None, :])
            p = jnp.where(lg_cat <= NEG_INF / 2, 0.0, p)
            z = p.sum(axis=1)
            s = jnp.einsum("rsh,rshd->rhd", p, msg_cat)
            aggr = jnp.where(z[..., None] > 0, s / jnp.maximum(z[..., None], 1e-38), 0.0)
            # Mean over each network's OWN heads (contiguous groups), then
            # back to [pi | vl] features — one reshaped mean, no concat.
            aggr = aggr.reshape(aggr.shape[0], 2, H, D).mean(axis=2).reshape(-1, 2 * D)

            if last:
                h = jax.nn.relu(upd + aggr)  # (nr, 2D)
                return h[:, :D], h[:, D:]
            aggr_full = jnp.zeros((spec.n_nodes, 2 * D), aggr.dtype).at[recv_slice].set(aggr)
            x = jax.nn.relu(upd + aggr_full)

        raise AssertionError("gnn_layers must be >= 1")  # pragma: no cover

    # ----------------------------------------------------------------- tails
    def _tail(self, sp, x_pi: Array, x_vl: Array, pi_carry: Array, vl_carry: Array):
        """Head MLP -> GRU -> output heads on stacked rows. The Vl trunk
        pools over agents FIRST (RStateFn.trunk), then its single row is
        tiled across the agent rows so every matmul stays one kernel; its
        outputs/carries are read back from row 0 (all rows are identical)."""
        a = x_pi.shape[0]
        vl_pooled = x_vl.mean(axis=0, keepdims=True)
        x_cat = jnp.concatenate([x_pi, jnp.tile(vl_pooled, (a, 1))], axis=-1)

        for layer in sp["head"]:
            x_cat = _apply_dense(layer["dense"], x_cat)
            x_cat = _seg_layernorm(x_cat, layer["ln_scale"], layer["ln_bias"])
            x_cat = jax.nn.relu(x_cat)

        if self.use_rnn:
            new_pi, new_vl = [], []
            for i, cell in enumerate(sp["rnn"]):
                h_cat = jnp.concatenate(
                    [pi_carry[i, :, 0, :], jnp.tile(vl_carry[i, :, 0, :], (a, 1))], axis=-1
                )
                # flax GRUCell math (see flax GRUCell.__call__).
                r = jax.nn.sigmoid(_apply_dense(cell["ir"], x_cat) + _apply_dense(cell["hr"], h_cat))
                z = jax.nn.sigmoid(_apply_dense(cell["iz"], x_cat) + _apply_dense(cell["hz"], h_cat))
                n = jnp.tanh(_apply_dense(cell["in"], x_cat) + r * _apply_dense(cell["hn"], h_cat))
                h_cat = (1.0 - z) * n + z * h_cat
                hid = h_cat.shape[-1] // 2
                new_pi.append(h_cat[:, None, :hid])
                new_vl.append(h_cat[0:1, None, hid:])
                x_cat = h_cat
            pi_carry = jnp.stack(new_pi)
            vl_carry = jnp.stack(new_vl)

        # Output heads: policy ScaleHid || Vl Dense_0 share one block-diagonal
        # matmul; the mean/std head then reads only the policy columns.
        out = _apply_dense(sp["out"], x_cat)
        scale_dim = sp["scale_dim"]
        pi_feats = out[:, :scale_dim]
        value = out[0:1, scale_dim:]  # (1, vl_n_out)

        ms_out = pi_feats @ sp["mean_std"]["kernel"] + sp["mean_std"]["bias"]
        nu = self.action_dim
        stds = jax.nn.softplus(ms_out[..., nu:] + self.std_init_inv) + self.std_dev_min
        dist = TanhNormalDistribution(ms_out[..., :nu], stds)
        return dist, value, pi_carry, vl_carry

    # ------------------------------------------------------------------ API
    def eval_prepared(
        self, sp, graph: BlockGraph, pi_carry: Array, vl_carry: Array
    ) -> StackedStep:
        """One joint evaluation from `prepare`d stacked weights."""
        dt = self.compute_dtype
        if dt is not None:
            graph, pi_carry, vl_carry = (
                _cast_floats(t, dt) for t in (graph, pi_carry, vl_carry)
            )
        x_pi, x_vl = self._gnn(sp["gnn"], graph)
        dist, value, pi_carry, vl_carry = self._tail(sp, x_pi, x_vl, pi_carry, vl_carry)
        if dt is not None:
            dist = TanhNormalDistribution(
                dist.mean.astype(jnp.float32), dist.std.astype(jnp.float32), dist.threshold
            )
            value = value.astype(jnp.float32)
            pi_carry = pi_carry.astype(jnp.float32)
            vl_carry = vl_carry.astype(jnp.float32)
        return StackedStep(dist, value, pi_carry, vl_carry)

    def eval_step(
        self,
        pi_params: Params,
        vl_params: Params,
        graph: BlockGraph,
        pi_carry: Array,
        vl_carry: Array,
    ) -> StackedStep:
        """Single-shot convenience (prepare + eval): equivalent to
        TanhNormal.apply(pi_params, graph, pi_carry) and
        RStateFn.apply(vl_params, graph, vl_carry) — tests/test_stacked.py.
        """
        return self.eval_prepared(self.prepare(pi_params, vl_params), graph, pi_carry, vl_carry)


def build_stacked(algo, spec: GraphSpec) -> Optional[StackedVlPolicy]:
    """Construct the stacked evaluator for an InforMARL-family algorithm, or
    None when the configuration falls outside the stacked fast path (the
    separate-network update is used instead — same math, more kernels)."""
    # Fail CLOSED: an algorithm class that never plumbed the flag gets the
    # default-off separate path, not the experimental stacked one
    # (ADVICE r3: the old default-True silently opted unplumbed classes in).
    if not getattr(algo, "stacked_update", False):
        return None
    if algo.use_lstm:
        return None  # GRU-only stacking; LSTM configs use the separate path
    if algo.actor_gnn_layers != algo.Vl_gnn_layers:
        return None
    if not StackedVlPolicy.supports_spec(spec):
        return None
    return StackedVlPolicy(
        spec=spec,
        gnn_layers=algo.actor_gnn_layers,
        action_dim=algo.action_dim,
        use_rnn=algo.use_rnn,
        rnn_layers=algo.rnn_layers,
        compute_dtype=algo.compute_dtype,
        std_dev_min=algo.std_dev_min,
    )
