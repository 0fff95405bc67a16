"""Tanh-transformed diagonal Normal policy distribution, built from scratch.

Behavioral parity reference: /root/reference/dgppo/algo/module/distribution.py:10-66
(a tfp TransformedDistribution). We implement the same math without tfp:

 - log_prob clamps the value at ±threshold and substitutes the closed-form
   tail mass log(P(|x| > atanh(thr))) - log(1 - thr) outside (the reference's
   NaN guard, distribution.py:25-35);
 - mode = tanh(mean) (distribution.py:45-46);
 - entropy = base-normal entropy + a single-sample estimate of the tanh
   log-det-jacobian (distribution.py:37-43). The reference seeds that sample
   with np.random.randint *at trace time* — a determinism hazard flagged in
   SURVEY.md §2.3. We instead use the PRNG key that callers already pass to
   `eval_action`, making entropy properly stochastic and reproducible. This
   is a deliberate, documented divergence.

Event shape is the last axis (action_dim); log_prob/entropy sum over it
(the reference wraps in tfd.Independent, reinterpreted_batch_ndims=1).
"""
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import jax.random as jr
from jax.scipy.stats import norm as jnorm

from ..utils.typing import Array, PRNGKey

_HALF_LOG_2PI_E = 0.5 * math.log(2.0 * math.pi * math.e)


def _tanh_forward_log_det_jacobian(x: Array) -> Array:
    """log |d tanh(x) / dx| = log(1 - tanh(x)^2), numerically stable."""
    return 2.0 * (math.log(2.0) - x - jax.nn.softplus(-2.0 * x))


def _atanh(y: Array) -> Array:
    return 0.5 * (jnp.log1p(y) - jnp.log1p(-y))


class TanhNormalDistribution(NamedTuple):
    """Independent tanh(Normal(mean, std)) over the last axis."""

    mean: Array
    std: Array
    threshold: float = 0.999

    def mode(self) -> Array:
        return jnp.tanh(self.mean)

    def sample(self, seed: PRNGKey) -> Array:
        eps = jr.normal(seed, self.mean.shape)
        return jnp.tanh(self.mean + self.std * eps)

    def _elem_log_prob(self, value: Array) -> Array:
        thr = self.threshold
        inv_thr = math.atanh(thr)
        log_eps = math.log(1.0 - thr)

        value = jnp.clip(value, -thr, thr)
        x = _atanh(value)
        inside = jnorm.logpdf(x, self.mean, self.std) - _tanh_forward_log_det_jacobian(x)

        # Tail mass: P(x <= -atanh(thr)) and P(x >= atanh(thr)) under the base
        # normal, averaged over the width-epsilon bin (reference
        # distribution.py:17-23).
        z_left = (-inv_thr - self.mean) / self.std
        z_right = (inv_thr - self.mean) / self.std
        log_prob_left = jnorm.logcdf(z_left) - log_eps
        log_prob_right = jnorm.logcdf(-z_right) - log_eps

        return jnp.where(
            value <= -thr,
            log_prob_left,
            jnp.where(value >= thr, log_prob_right, inside),
        )

    def log_prob(self, value: Array) -> Array:
        return self._elem_log_prob(value).sum(axis=-1)

    def entropy(self, seed: PRNGKey) -> Array:
        base_entropy = _HALF_LOG_2PI_E + jnp.log(self.std)
        x = self.mean + self.std * jr.normal(seed, self.mean.shape)
        return (base_entropy + _tanh_forward_log_det_jacobian(x)).sum(axis=-1)
