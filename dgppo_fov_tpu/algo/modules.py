"""Policy and value networks over BlockGraphs.

Behavioral parity references:
 - PolicyNet / TanhNormal head: /root/reference/dgppo/algo/module/policy.py:20-78
 - PPOPolicy wiring (GraphTransformerGNN(msg=32, heads=3) + MLP(64,64) head +
   GRU/LSTM(64) + scaled Dense(64) + mean/std heads):
   /root/reference/dgppo/algo/module/policy.py:132-212
 - RStateFn (centralized Vl: GNN -> mean-pool -> head -> RNN -> Dense(n_out)):
   /root/reference/dgppo/algo/module/value.py:15-44
 - DecRStateFn (per-agent Vh, optional global mean-pool concat):
   /root/reference/dgppo/algo/module/value.py:47-79
 - ValueNet factory: /root/reference/dgppo/algo/module/value.py:82-157
"""
import functools as ft
import math
from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import jax.random as jr

from ..graph import BlockGraph
from ..nn.distribution import TanhNormalDistribution
from ..nn.gnn import GraphTransformerGNN
from ..nn.mlp import MLP, default_nn_init, scaled_init
from ..nn.rnn import RNN
from ..utils.typing import Action, Array, Params, PRNGKey


def _resolve_dtype(compute_dtype):
    """None/'float32' -> None (no casting); 'bfloat16'/'bf16' -> jnp.bfloat16."""
    if compute_dtype in (None, "float32", "fp32", "f32", jnp.float32):
        return None
    if compute_dtype in ("bfloat16", "bf16", jnp.bfloat16):
        return jnp.bfloat16
    raise ValueError(f"unsupported compute_dtype {compute_dtype!r}")


def _cast_floats(tree, dtype):
    """Cast floating leaves of a pytree (params, graphs, carries) to dtype.

    Mixed-precision boundary: master params stay f32 in the TrainStates; the
    cast happens inside the loss/apply, so gradients accumulate back in f32.
    Bool masks and integer fields are untouched.
    """
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


class PolicyNet(nn.Module):
    """GNN -> head -> optional RNN.

    setup-style (not nn.compact): the carry-independent trunk (GNN + head)
    and the recurrent tail are separate methods, composed by __call__.
    Attribute names replicate the compact auto-names so the param tree is
    bit-identical to the original formulation. (Note: hoisting the trunk out
    of the update loop's per-timestep scan and batching it over T was
    measured 20% slower on TPU at bench shapes — see InforMARL.scan_Vl.)
    """

    gnn_cls: Callable[[], nn.Module]
    head_cls: Callable[[], nn.Module]
    rnn_cls: Optional[Callable[[], nn.Module]] = None

    def setup(self):
        self.GraphTransformerGNN_0 = self.gnn_cls()
        self.PolicyGNNHead = self.head_cls()
        if self.rnn_cls is not None:
            self.RNN_0 = self.rnn_cls()

    def trunk(self, graph: BlockGraph, node_type: int = None) -> Array:
        return self.PolicyGNNHead(self.GraphTransformerGNN_0(graph, node_type))

    def recur(self, x: Array, rnn_state: Array):
        if self.rnn_cls is not None:
            return self.RNN_0(x, rnn_state)
        return x, rnn_state

    def __call__(self, graph: BlockGraph, rnn_state: Array, node_type: int = None):
        return self.recur(self.trunk(graph, node_type), rnn_state)


class TanhNormal(nn.Module):
    """GNN trunk -> scaled Dense(64) -> mean/std heads -> TanhNormal dist.

    std = softplus(x + softplus_inv(std_dev_init)) + std_dev_min
    (reference policy.py:47-74). Structured as trunk / recur / dist_params
    stages (see PolicyNet) with the compact-era param names preserved.

    std_dev_min: the reference's 1e-5 floor creates a vanishing-entropy-
    gradient basin (dH/dx ~ sigmoid(x)/std -> e^x/1e-5 -> 0 once x < ~-15;
    PARITY.md "sigma-floor" analysis) that two observed runs collapsed into
    terminally. Raising it (e.g. 1e-2 via --std-dev-min) bounds the
    pathology rather than the gradient: min entropy -3.2/dim instead of
    -10.6/dim, and |dlogpi/dmu| <= |z|/floor — 1e6 less log-prob curvature,
    the term behind the collapsed runs' 1e5-4e6 grad norms
    (tests/test_std_floor.py). The default stays at the reference value so
    parity configs are bit-identical.
    """

    base_cls: Callable[[], nn.Module]
    nu: int
    scale_final: float = 0.01
    std_dev_min: float = 1e-5
    std_dev_init: float = 0.5

    def setup(self):
        self.PolicyNet_0 = self.base_cls()
        scaler_init = scaled_init(default_nn_init(), self.scale_final)
        self.ScaleHid = nn.Dense(64, kernel_init=scaler_init)

        # Mean and std heads fused into one matmul; column blocks initialized
        # independently (identical distribution to two separate Dense layers).
        nu = self.nu

        def fused_head_init(key, shape, dtype):
            k1, k2 = jax.random.split(key)
            init = default_nn_init()
            return jnp.concatenate(
                [init(k1, (shape[0], nu), dtype), init(k2, (shape[0], nu), dtype)], axis=1
            )

        self.OutputDenseMeanStd = nn.Dense(2 * nu, kernel_init=fused_head_init)

    def trunk(self, graph: BlockGraph) -> Array:
        return self.PolicyNet_0.trunk(graph, node_type=0)

    def recur(self, x: Array, rnn_state: Array):
        return self.PolicyNet_0.recur(x, rnn_state)

    def dist_params(self, x: Array) -> TanhNormalDistribution:
        feats_scaled = self.ScaleHid(x)
        out = self.OutputDenseMeanStd(feats_scaled)
        nu = self.nu
        # softplus_inverse(std_dev_init) — reference policy.py's std shift.
        std_init_inv = math.log(math.exp(self.std_dev_init) - 1.0)
        stds = jax.nn.softplus(out[..., nu:] + std_init_inv) + self.std_dev_min
        return TanhNormalDistribution(out[..., :nu], stds)

    def __call__(self, graph: BlockGraph, rnn_state: Array):
        x, rnn_state = self.recur(self.trunk(graph), rnn_state)
        return self.dist_params(x), rnn_state


class RecurrentCarries:
    """Shared carry layout of the policy/value wrappers — ONE change point
    for the (n_layers, slots, n_carries, hid) convention (reference
    informarl.py:114-124). Host classes provide use_rnn / use_lstm /
    rnn_base / gnn_out_dim / rnn_layers."""

    @property
    def n_carries(self) -> int:
        return 2 if self.use_lstm else 1

    def initialize_carry(self, key: PRNGKey) -> Array:
        """Per-slot carry; zeros, matching flax cell init on zero inputs."""
        if self.use_rnn:
            cell = self.rnn_base()
            carry = cell.initialize_carry(key, (self.gnn_out_dim,))
            if isinstance(carry, tuple):
                return jnp.stack(carry, axis=0)  # (n_carries, hid)
            return carry[None]
        return jnp.zeros((1, self.gnn_out_dim))

    def _init_rnn_slots(self, key: PRNGKey, n_slots: int) -> Array:
        keys = jr.split(key, n_slots)
        per_slot = jax.vmap(self.initialize_carry)(keys)  # (slots, n_carries, hid)
        return jnp.repeat(per_slot[None], self.rnn_layers, axis=0)


class PPOPolicy(RecurrentCarries):
    """Functional policy wrapper: get_action / sample_action / eval_action."""

    def __init__(
        self,
        node_dim: int,
        edge_dim: int,
        n_agents: int,
        action_dim: int,
        use_rnn: bool = True,
        rnn_layers: int = 1,
        gnn_layers: int = 1,
        gnn_out_dim: int = 16,
        use_lstm: bool = False,
        compute_dtype=None,
        std_dev_min: float = 1e-5,
    ):
        self.node_dim = node_dim
        self.edge_dim = edge_dim
        self.n_agents = n_agents
        self.action_dim = action_dim
        self.gnn_out_dim = gnn_out_dim
        self.use_rnn = use_rnn
        self.use_lstm = use_lstm
        self.rnn_layers = rnn_layers
        self.std_dev_min = std_dev_min
        self.compute_dtype = _resolve_dtype(compute_dtype)

        gnn = ft.partial(
            GraphTransformerGNN, msg_dim=32, out_dim=gnn_out_dim, n_heads=3, n_layers=gnn_layers
        )
        # No explicit flax name: the setup-style PolicyNet names it via the
        # attribute (PolicyGNNHead), preserving the historical param path.
        head = ft.partial(MLP, hid_sizes=(64, 64), act=nn.relu, act_final=True)
        if use_rnn:
            self.rnn_base = ft.partial(nn.LSTMCell if use_lstm else nn.GRUCell, features=64)
            rnn = ft.partial(RNN, rnn_cls=self.rnn_base, rnn_layers=rnn_layers)
            base = ft.partial(PolicyNet, gnn_cls=gnn, head_cls=head, rnn_cls=rnn)
        else:
            self.rnn_base = None
            base = ft.partial(PolicyNet, gnn_cls=gnn, head_cls=head)
        self.dist = TanhNormal(base_cls=base, nu=action_dim, std_dev_min=std_dev_min)

    def init_rnn_state(self, key: PRNGKey) -> Array:
        """(n_layers, n_agents, n_carries, hid)."""
        return self._init_rnn_slots(key, self.n_agents)

    def init(self, key: PRNGKey, graph: BlockGraph, rnn_state: Array) -> Params:
        return self.dist.init(key, graph, rnn_state)

    def _apply(self, params: Params, graph: BlockGraph, rnn_state: Array):
        """Network apply with optional bf16 compute (f32 master params; the
        cast sits inside the loss so gradients accumulate in f32). The
        distribution parameters and new carry are cast back to f32 so all
        sampling/log-prob/loss math stays f32."""
        dt = self.compute_dtype
        if dt is None:
            return self.dist.apply(params, graph, rnn_state)
        dist, new_rnn = self.dist.apply(
            _cast_floats(params, dt), _cast_floats(graph, dt), _cast_floats(rnn_state, dt)
        )
        dist = TanhNormalDistribution(
            dist.mean.astype(jnp.float32), dist.std.astype(jnp.float32), dist.threshold
        )
        return dist, new_rnn.astype(jnp.float32)

    def get_action(self, params: Params, graph: BlockGraph, rnn_state: Array) -> Tuple[Action, Array]:
        dist, rnn_state = self._apply(params, graph, rnn_state)
        return dist.mode(), rnn_state

    def sample_action(
        self, params: Params, graph: BlockGraph, rnn_state: Array, key: PRNGKey
    ) -> Tuple[Action, Array, Array]:
        dist, rnn_state = self._apply(params, graph, rnn_state)
        action = dist.sample(seed=key)
        log_pi = dist.log_prob(action)
        return action, log_pi, rnn_state

    def eval_action(
        self, params: Params, graph: BlockGraph, action: Action, rnn_state: Array, key: PRNGKey
    ) -> Tuple[Array, Array, Array]:
        dist, rnn_state = self._apply(params, graph, rnn_state)
        log_pi = dist.log_prob(action)
        entropy = dist.entropy(seed=key)
        return log_pi, entropy, rnn_state



class RStateFn(nn.Module):
    """Centralized value: GNN over agents -> mean pool -> head -> RNN -> Dense.

    Structured as trunk (everything before the RNN) + recurrent tail (see
    PolicyNet); attribute names preserve the compact-era param paths
    (GraphTransformerGNN_0 / ValueGNNHead / RNN_0 / Dense_0).
    """

    gnn_cls: Callable[[], nn.Module]
    head_cls: Callable[[], nn.Module]
    n_out: int = 1
    rnn_cls: Optional[Callable[[], nn.Module]] = None

    def setup(self):
        self.GraphTransformerGNN_0 = self.gnn_cls()
        self.ValueGNNHead = self.head_cls()
        if self.rnn_cls is not None:
            self.RNN_0 = self.rnn_cls()
        self.Dense_0 = nn.Dense(self.n_out, kernel_init=default_nn_init())

    def trunk(self, graph: BlockGraph) -> Array:
        x = self.GraphTransformerGNN_0(graph, node_type=0)  # (a, d)
        x = x.mean(axis=0, keepdims=True)  # (1, d)
        return self.ValueGNNHead(x)

    def recur(self, x: Array, rnn_state: Array):
        if self.rnn_cls is not None:
            x, rnn_state = self.RNN_0(x, rnn_state)
        return self.Dense_0(x), rnn_state  # (1, n_out)

    def __call__(self, graph: BlockGraph, rnn_state: Array):
        return self.recur(self.trunk(graph), rnn_state)


class DecRStateFn(nn.Module):
    """Per-agent value; optionally concat a global mean-pool feature."""

    gnn_cls: Callable[[], nn.Module]
    head_cls: Callable[[], nn.Module]
    n_out: int = 1
    rnn_cls: Optional[Callable[[], nn.Module]] = None
    use_global_info: bool = False

    def setup(self):
        self.GraphTransformerGNN_0 = self.gnn_cls()
        self.ValueGNNHead = self.head_cls()
        if self.rnn_cls is not None:
            self.RNN_0 = self.rnn_cls()
        self.Dense_0 = nn.Dense(self.n_out, kernel_init=default_nn_init())

    def trunk(self, graph: BlockGraph) -> Array:
        x = self.GraphTransformerGNN_0(graph, node_type=0)  # (a, d)
        if self.use_global_info:
            n_agents = x.shape[0]
            x_global = x.mean(axis=0, keepdims=True)
            x = jnp.concatenate([x, jnp.tile(x_global, (n_agents, 1))], axis=-1)
        return self.ValueGNNHead(x)

    def recur(self, x: Array, rnn_state: Array):
        if self.rnn_cls is not None:
            x, rnn_state = self.RNN_0(x, rnn_state)
        return self.Dense_0(x), rnn_state  # (a, n_out)

    def __call__(self, graph: BlockGraph, rnn_state: Array):
        return self.recur(self.trunk(graph), rnn_state)


class ValueNet(RecurrentCarries):
    """Factory choosing centralized (RStateFn) vs decomposed (DecRStateFn)."""

    def __init__(
        self,
        node_dim: int,
        edge_dim: int,
        n_agents: int,
        n_out: int = 1,
        use_rnn: bool = True,
        rnn_layers: int = 1,
        gnn_layers: int = 1,
        gnn_out_dim: int = 16,
        use_lstm: bool = False,
        decompose: bool = False,
        use_global_info: bool = False,
        n_heads: int = 3,
        compute_dtype=None,
    ):
        self.n_agents = n_agents
        self.n_out = n_out
        self.gnn_out_dim = gnn_out_dim
        self.decompose = decompose
        self.use_rnn = use_rnn
        self.use_lstm = use_lstm
        self.rnn_layers = rnn_layers
        self.compute_dtype = _resolve_dtype(compute_dtype)

        gnn = ft.partial(
            GraphTransformerGNN, msg_dim=32, out_dim=gnn_out_dim, n_heads=n_heads, n_layers=gnn_layers
        )
        # Named via the setup attribute (ValueGNNHead) — see PolicyNet.
        head = ft.partial(MLP, hid_sizes=(64, 64), act=nn.relu, act_final=True)
        if use_rnn:
            self.rnn_base = ft.partial(nn.LSTMCell if use_lstm else nn.GRUCell, features=64)
            rnn = ft.partial(RNN, rnn_cls=self.rnn_base, rnn_layers=rnn_layers)
        else:
            self.rnn_base = None
            rnn = None

        if decompose:
            self.net = DecRStateFn(
                gnn_cls=gnn, head_cls=head, n_out=n_out, rnn_cls=rnn, use_global_info=use_global_info
            )
        else:
            self.net = RStateFn(gnn_cls=gnn, head_cls=head, n_out=n_out, rnn_cls=rnn)

    def init_rnn_state(self, key: PRNGKey, n_slots: int) -> Array:
        """(n_layers, n_slots, n_carries, hid); n_slots=1 for centralized Vl
        (informarl.py:152-160), n_agents for decomposed Vh
        (informarl_lagr.py:85-93)."""
        return self._init_rnn_slots(key, n_slots)

    def init(self, key: PRNGKey, graph: BlockGraph, rnn_state: Array) -> Params:
        return self.net.init(key, graph, rnn_state)

    def get_value(self, params: Params, graph: BlockGraph, rnn_state: Array):
        dt = self.compute_dtype
        if dt is None:
            return self.net.apply(params, graph, rnn_state)
        value, new_rnn = self.net.apply(
            _cast_floats(params, dt), _cast_floats(graph, dt), _cast_floats(rnn_state, dt)
        )
        return value.astype(jnp.float32), new_rnn.astype(jnp.float32)

