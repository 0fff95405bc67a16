"""Block-dense GraphTransformer vs a from-scratch segment-softmax oracle.

The oracle mirrors the reference formulation (nn/gnn.py:78-117): flatten the
blocks into an edge list, compute per-edge attention logits, softmax over
each receiver's incoming edges, sum attn * (V + E) per receiver, then
node' = relu(Dense(node) + msg). It reuses the *same flax params* as our
block-dense layer (identical projection names), so any mismatch is a math
bug, not an init artifact.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgppo_fov_tpu.graph import BlockGraph, BlockSpec, GraphSpec, TypeSpec, build_graph
from dgppo_fov_tpu.nn.gnn import BlockGraphTransformer, GraphTransformerGNN


def _make_spec():
    # 3 agents, 3 goals, 2 obstacles = 8 nodes
    return GraphSpec(
        n_nodes=8,
        node_dim=7,
        state_dim=4,
        edge_dim=4,
        types=(TypeSpec(0, 0, 3), TypeSpec(1, 3, 3), TypeSpec(2, 6, 2)),
        blocks=(
            BlockSpec("aa", 0, 3, 0, 3),
            BlockSpec("ag", 0, 3, 3, 3),
            BlockSpec("ao", 0, 3, 6, 2),
        ),
    )


def _make_graph(spec, key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    nodes = jax.random.normal(k1, (spec.n_nodes, spec.node_dim))
    states = jax.random.normal(k2, (spec.n_nodes, spec.state_dim))
    edges = []
    masks = []
    for i, b in enumerate(spec.blocks):
        ke, km = jax.random.split(jax.random.fold_in(k3, i))
        edges.append(jax.random.normal(ke, (b.n_recv, b.n_send, spec.edge_dim)))
        m = jax.random.bernoulli(km, 0.6, (b.n_recv, b.n_send))
        masks.append(m)
    del k4
    return build_graph(spec, nodes, states, tuple(edges), tuple(masks))


def oracle_layer(params, graph, n_heads, out_dim):
    """Edge-list segment-softmax formulation using the same dense params."""
    spec = graph.spec
    p = params["params"]

    def dense(name, x, bias=True):
        w = p[name]["kernel"]
        y = x @ w
        if bias:
            y = y + p[name]["bias"]
        return y

    N = spec.n_nodes
    H, D = n_heads, out_dim
    # The implementation fuses Q/K/V/update into one projection; split it.
    qkvu = dense("qkvu", graph.nodes)
    q = qkvu[:, : H * D].reshape(N, H, D)
    k = qkvu[:, H * D : 2 * H * D].reshape(N, H, D)
    v = qkvu[:, 2 * H * D : 3 * H * D].reshape(N, H, D)
    upd = qkvu[:, 3 * H * D :]

    # Flatten blocks to an edge list (recv, send, feat) keeping only masked-in.
    recvs, sends, feats = [], [], []
    for e, m, b in zip(graph.edges, graph.masks, spec.blocks):
        for i in range(b.n_recv):
            for j in range(b.n_send):
                if bool(m[i, j]):
                    recvs.append(b.recv_start + i)
                    sends.append(b.send_start + j)
                    feats.append(np.asarray(e[i, j]))
    if not recvs:
        msg = jnp.zeros((N, D))
    else:
        recvs = np.array(recvs)
        sends = np.array(sends)
        feats = jnp.asarray(np.stack(feats))
        e_proj = dense("edge", feats, bias=False).reshape(len(recvs), H, D)
        logits = (q[recvs] * k[sends]).sum(-1) / np.sqrt(D)  # (E, H)
        # segment softmax over receivers
        attn = np.zeros(logits.shape, dtype=np.float64)
        logits = np.asarray(logits, dtype=np.float64)
        for r in set(recvs.tolist()):
            sel = recvs == r
            lg = logits[sel]
            lg = np.exp(lg - lg.max(axis=0, keepdims=True))
            attn[sel] = lg / lg.sum(axis=0, keepdims=True)
        msgs = attn[..., None] * np.asarray(v[sends] + e_proj)  # (E, H, D)
        msgs = msgs.mean(axis=1)  # mean over heads
        msg = np.zeros((N, D))
        for idx, r in enumerate(recvs):
            msg[r] += msgs[idx]
        msg = jnp.asarray(msg)

    return jax.nn.relu(upd + msg)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_block_transformer_matches_segment_oracle(seed):
    spec = _make_spec()
    key = jax.random.PRNGKey(seed)
    graph = _make_graph(spec, key)

    layer = BlockGraphTransformer(n_heads=3, out_dim=16)
    params = layer.init(jax.random.PRNGKey(42), graph)
    out = layer.apply(params, graph)
    ref = oracle_layer(params, graph, n_heads=3, out_dim=16)
    # Oracle accumulates partially in float64; f32 reassociation costs ~1e-4.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-2, atol=5e-4)


def test_general_path_mixed_receivers():
    """Blocks with different receiver ranges exercise the multi-pass path."""
    spec = GraphSpec(
        n_nodes=8,
        node_dim=7,
        state_dim=4,
        edge_dim=4,
        types=(TypeSpec(0, 0, 3), TypeSpec(1, 3, 3), TypeSpec(2, 6, 2)),
        blocks=(
            BlockSpec("aa", 0, 3, 0, 3),
            BlockSpec("ga", 3, 3, 0, 3),  # goals also receive
            BlockSpec("ao", 0, 3, 6, 2),
        ),
    )
    graph = _make_graph(spec, jax.random.PRNGKey(7))
    layer = BlockGraphTransformer(n_heads=2, out_dim=8)
    params = layer.init(jax.random.PRNGKey(0), graph)
    out = layer.apply(params, graph)
    ref = oracle_layer(params, graph, n_heads=2, out_dim=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-2, atol=5e-4)


def test_zero_incoming_edges_gives_zero_message():
    spec = _make_spec()
    graph = _make_graph(spec, jax.random.PRNGKey(3))
    # Mask out everything: every node then gets msg = 0 -> relu(Dense(node)).
    masks = tuple(jnp.zeros_like(m) for m in graph.masks)
    graph_nomask = graph.replace(masks=masks)

    layer = BlockGraphTransformer(n_heads=3, out_dim=16)
    params = layer.init(jax.random.PRNGKey(0), graph)
    out = layer.apply(params, graph_nomask)

    H, D = 3, 16
    w = params["params"]["qkvu"]["kernel"][:, 3 * H * D :]
    b = params["params"]["qkvu"]["bias"][3 * H * D :]
    expected = jax.nn.relu(graph.nodes @ w + b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-6, atol=1e-6)
    assert not np.any(np.isnan(np.asarray(out)))


def test_gnn_stack_shapes_and_type_slice():
    spec = _make_spec()
    graph = _make_graph(spec, jax.random.PRNGKey(4))
    gnn = GraphTransformerGNN(msg_dim=32, out_dim=64, n_heads=3, n_layers=2)
    params = gnn.init(jax.random.PRNGKey(0), graph)
    out_all = gnn.apply(params, graph)
    assert out_all.shape == (8, 64)
    out_agents = gnn.apply(params, graph, node_type=0)
    assert out_agents.shape == (3, 64)
    np.testing.assert_allclose(np.asarray(out_all[:3]), np.asarray(out_agents))


def test_gnn_vmaps():
    spec = _make_spec()
    graphs = jax.vmap(lambda k: _make_graph(spec, k))(jax.random.split(jax.random.PRNGKey(5), 4))
    gnn = GraphTransformerGNN(msg_dim=8, out_dim=8, n_heads=2, n_layers=2)
    single = jax.tree_util.tree_map(lambda x: x[0], graphs)
    params = gnn.init(jax.random.PRNGKey(0), single)
    out = jax.vmap(lambda g: gnn.apply(params, g, node_type=0))(graphs)
    assert out.shape == (4, 3, 8)
