"""Dependency shims that let the reference (`/root/reference`) run on this image.

The reference needs jraph, tensorflow_probability, wandb, colour, ipdb and
jax_dataclasses, none of which are installed here. These are minimal
from-scratch implementations of exactly the API surface the reference uses
(verified by grep over /root/reference — see each shim's docstring), installed
into sys.modules by `install_shims()` BEFORE importing any reference module.

Purpose: run the reference in-process as a behavioral oracle for
cross-framework parity tests (golden forwards, learning-dynamics comparison).
This is OUR code — nothing is copied from the reference or the shimmed
libraries; each shim implements the public, documented semantics of the API.
"""
import sys
import types

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np


# ---------------------------------------------------------------------------
# jraph: segment_softmax / segment_sum (used at reference nn/gnn.py:68,71,101,114)
# ---------------------------------------------------------------------------
def _make_jraph():
    mod = types.ModuleType("jraph")

    def segment_sum(data, segment_ids, num_segments):
        return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)

    def segment_max(data, segment_ids, num_segments):
        return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)

    def segment_softmax(logits, segment_ids, num_segments):
        """Softmax over elements sharing a segment id (numerically stabilized)."""
        maxs = segment_max(logits, segment_ids, num_segments)
        maxs = jnp.where(jnp.isfinite(maxs), maxs, 0.0)  # empty segments -> -inf
        shifted = logits - maxs[segment_ids]
        exp = jnp.exp(shifted)
        denom = segment_sum(exp, segment_ids, num_segments)
        return exp / denom[segment_ids]

    mod.segment_sum = segment_sum
    mod.segment_max = segment_max
    mod.segment_softmax = segment_softmax
    return mod


# ---------------------------------------------------------------------------
# tensorflow_probability.substrates.jax: tfd.{Normal, Independent,
# TransformedDistribution, Distribution}, tfb.Tanh
# (used at reference algo/module/distribution.py and policy.py:73-74,193-211)
# ---------------------------------------------------------------------------
def _make_tfp():
    class Distribution:
        pass

    class Normal(Distribution):
        def __init__(self, loc, scale):
            self.loc = jnp.asarray(loc)
            self.scale = jnp.asarray(scale)

        def sample(self, seed):
            shape = jnp.broadcast_shapes(self.loc.shape, self.scale.shape)
            return self.loc + self.scale * jr.normal(seed, shape)

        def mode(self):
            return jnp.broadcast_to(self.loc, jnp.broadcast_shapes(self.loc.shape, self.scale.shape))

        def log_prob(self, x):
            z = (x - self.loc) / self.scale
            return -0.5 * z**2 - jnp.log(self.scale) - 0.5 * np.log(2 * np.pi)

        def log_cdf(self, x):
            return jax.scipy.stats.norm.logcdf(x, loc=self.loc, scale=self.scale)

        def log_survival_function(self, x):
            # 1 - cdf(x) == cdf(2*loc - x) by symmetry of the normal.
            return jax.scipy.stats.norm.logcdf(2 * self.loc - x, loc=self.loc, scale=self.scale)

        def entropy(self):
            return 0.5 * np.log(2 * np.pi * np.e) + jnp.log(self.scale) + jnp.zeros(jnp.broadcast_shapes(self.loc.shape, self.scale.shape))

    class Tanh:
        def forward(self, x):
            return jnp.tanh(x)

        def inverse(self, y):
            return jnp.arctanh(y)

        def forward_log_det_jacobian(self, x, event_ndims=0):
            # log|d tanh(x)/dx| = log(1 - tanh(x)^2) = 2*(log 2 - x - softplus(-2x))
            return 2.0 * (np.log(2.0) - x - jax.nn.softplus(-2.0 * x))

    class TransformedDistribution(Distribution):
        def __init__(self, distribution, bijector, validate_args=False):
            self.distribution = distribution
            self.bijector = bijector

        def sample(self, seed):
            return self.bijector.forward(self.distribution.sample(seed))

        def log_prob(self, value):
            x = self.bijector.inverse(value)
            return self.distribution.log_prob(x) - self.bijector.forward_log_det_jacobian(x)

        def mode(self):
            return self._mode()

        def _mode(self):
            raise NotImplementedError

        @classmethod
        def _parameter_properties(cls, dtype, num_classes=None):
            return {"bijector": None}  # subclass deletes this key

        def entropy(self):
            raise NotImplementedError

    class Independent(Distribution):
        """Reinterprets the last `reinterpreted_batch_ndims` batch dims as event dims."""

        def __init__(self, distribution, reinterpreted_batch_ndims=1):
            assert reinterpreted_batch_ndims == 1
            self.distribution = distribution

        def sample(self, seed):
            return self.distribution.sample(seed)

        def mode(self):
            return self.distribution.mode()

        def log_prob(self, value):
            return self.distribution.log_prob(value).sum(axis=-1)

        def entropy(self, seed=None, **kwargs):
            return self.distribution.entropy().sum(axis=-1)

    tfd = types.ModuleType("tensorflow_probability.substrates.jax.distributions")
    tfd.Distribution = Distribution
    tfd.Normal = Normal
    tfd.Independent = Independent
    tfd.TransformedDistribution = TransformedDistribution

    tfb = types.ModuleType("tensorflow_probability.substrates.jax.bijectors")
    tfb.Tanh = Tanh

    substrate = types.ModuleType("tensorflow_probability.substrates.jax")
    substrate.distributions = tfd
    substrate.bijectors = tfb

    substrates = types.ModuleType("tensorflow_probability.substrates")
    substrates.jax = substrate

    root = types.ModuleType("tensorflow_probability")
    root.substrates = substrates
    return root, substrates, substrate, tfd, tfb


# ---------------------------------------------------------------------------
# jax_dataclasses: pytree_dataclass / Static / replace
# (used at reference env/vmas/physax/{entity,world}.py)
# ---------------------------------------------------------------------------
def _make_jdc():
    import dataclasses

    mod = types.ModuleType("jax_dataclasses")

    class _StaticMarker:
        pass

    class Static:
        def __class_getitem__(cls, item):
            from typing import Annotated

            return Annotated[item, _StaticMarker]

    def _is_static(hint) -> bool:
        meta = getattr(hint, "__metadata__", ())
        return any(m is _StaticMarker for m in meta)

    def pytree_dataclass(cls):
        import typing

        # eq=False keeps user-defined __eq__/__hash__ (Entity hashes by name).
        cls = dataclasses.dataclass(cls, frozen=True, eq=False)
        hints = typing.get_type_hints(cls, include_extras=True)
        all_fields = [f.name for f in dataclasses.fields(cls)]
        static_fields = tuple(n for n in all_fields if _is_static(hints.get(n)))
        dynamic_fields = tuple(n for n in all_fields if n not in static_fields)

        def flatten(obj):
            children = tuple(getattr(obj, n) for n in dynamic_fields)
            aux = tuple(getattr(obj, n) for n in static_fields)
            return children, aux

        def unflatten(aux, children):
            kwargs = dict(zip(dynamic_fields, children)) | dict(zip(static_fields, aux))
            return cls(**kwargs)

        jax.tree_util.register_pytree_node(cls, flatten, unflatten)
        return cls

    mod.pytree_dataclass = pytree_dataclass
    mod.Static = Static
    mod.replace = dataclasses.replace
    return mod


# ---------------------------------------------------------------------------
# wandb / colour / ipdb: no-op-level shims
# ---------------------------------------------------------------------------
def _make_wandb():
    mod = types.ModuleType("wandb")
    mod.run = None
    mod.login = lambda *a, **k: None
    mod.init = lambda *a, **k: None
    mod.log = lambda *a, **k: None
    mod.finish = lambda *a, **k: None
    return mod


def _make_colour():
    import colorsys

    mod = types.ModuleType("colour")

    def hsl2hex(hsl):
        h, s, l = float(hsl[0]), float(hsl[1]), float(hsl[2])
        r, g, b = colorsys.hls_to_rgb(h, l, s)
        return "#%02x%02x%02x" % (round(r * 255), round(g * 255), round(b * 255))

    mod.hsl2hex = hsl2hex
    return mod


def _make_ipdb():
    import contextlib

    mod = types.ModuleType("ipdb")
    mod.launch_ipdb_on_exception = contextlib.nullcontext
    mod.set_trace = lambda *a, **k: None
    return mod


def install_shims() -> None:
    """Install all shims into sys.modules (idempotent; no-op for real installs)."""
    # The reference targets jax 0.4.x; restore aliases removed since then.
    if not hasattr(jax, "tree_map"):
        jax.tree_map = jax.tree_util.tree_map
    if not hasattr(jax, "tree_leaves"):
        jax.tree_leaves = jax.tree_util.tree_leaves
    if not hasattr(jax, "tree_flatten"):
        jax.tree_flatten = jax.tree_util.tree_flatten
    if not hasattr(jax, "tree_unflatten"):
        jax.tree_unflatten = jax.tree_util.tree_unflatten
    if "jraph" not in sys.modules:
        sys.modules["jraph"] = _make_jraph()
    if "tensorflow_probability" not in sys.modules:
        root, substrates, substrate, tfd, tfb = _make_tfp()
        sys.modules["tensorflow_probability"] = root
        sys.modules["tensorflow_probability.substrates"] = substrates
        sys.modules["tensorflow_probability.substrates.jax"] = substrate
        sys.modules["tensorflow_probability.substrates.jax.distributions"] = tfd
        sys.modules["tensorflow_probability.substrates.jax.bijectors"] = tfb
    if "jax_dataclasses" not in sys.modules:
        sys.modules["jax_dataclasses"] = _make_jdc()
    if "wandb" not in sys.modules:
        sys.modules["wandb"] = _make_wandb()
    if "colour" not in sys.modules:
        sys.modules["colour"] = _make_colour()
    if "ipdb" not in sys.modules:
        sys.modules["ipdb"] = _make_ipdb()


def import_reference(path: str = "/root/reference"):
    """Install shims and put the reference repo on sys.path. Returns the dgppo pkg."""
    install_shims()
    if path not in sys.path:
        sys.path.insert(0, path)
    import dgppo  # noqa

    return dgppo
