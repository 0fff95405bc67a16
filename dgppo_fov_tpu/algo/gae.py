"""Dec-EFOCP GAE kernel — joint GAE for cost value Vl and constraint value Vh.

Behavioral parity reference: /root/reference/dgppo/algo/utils.py:11-79
(`compute_dec_ocp_gae`). Semantics (verified against a from-scratch numpy
oracle in tests/test_gae.py):

For every step t, the kernel mixes the family of n-step estimates bootstrapped
at time s = t+1 .. T with GAE weights

    Qh(t) = lam^(T-1-t) * Wh[t, T]
          + sum_{s=t+1}^{T-1} lam^(s-t-1) * (1 - lam) * Wh[t, s]

where Wh[t, s] is the *max-over-time discounted* constraint DP value
    Wh[t, s] = max(h_t, (1-g) * max_h(h_t) + g * Wh[t+1, s]),  Wh[s,s] = Vh(x_s)
(reference utils.py:44-45, discount_to_max=True) and Wl is the ordinary
accumulated-loss DP  Wl[t, s] = l_t + g * Wl[t+1, s],  Wl[s,s] = Vl(x_s).

TPU re-engineering vs the reference:
 - The per-step GAE coefficient vector (reference utils.py:57-60, built with
   roll + two scatters per step) is a **static (T, T+1) matrix** precomputed
   with numpy at trace time — the per-step contraction becomes one matvec.
 - Vl rows are kept (T+1,) instead of the reference's (T+1, n_agents)
   repeat (utils.py:67,71) — the value is agent-independent.
 - The backward scan carries only the (T+1, a, nh) Vh row table and the
   (T+1,) Vl row; per-step work is vectorized over the row axis (VPU).
"""
import functools as ft
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.typing import Array


def _gae_coeff_matrix(T: int, gae_lambda: float) -> np.ndarray:
    """C[t, j]: weight of the row bootstrapped at s = T - j, for step t.

    C[t, 0] = lam^(T-1-t); C[t, j] = lam^(T-1-t-j) * (1-lam) for 1<=j<=T-1-t.
    """
    C = np.zeros((T, T + 1), dtype=np.float32)
    for t in range(T):
        ii = T - 1 - t
        C[t, 0] = gae_lambda**ii
        for j in range(1, ii + 1):
            C[t, j] = (gae_lambda ** (ii - j)) * (1.0 - gae_lambda)
    return C


@ft.partial(jax.jit, static_argnames=("disc_gamma", "gae_lambda", "discount_to_max"))
def compute_dec_ocp_gae(
    Tah_hs: Array,
    T_l: Array,
    Tp1ah_Vh: Array,
    Tp1_Vl: Array,
    disc_gamma: float,
    gae_lambda: float,
    discount_to_max: bool = True,
) -> Tuple[Array, Array]:
    """Returns (Qh: (T, a, nh), Ql: (T,)).

    T_l contract: the per-step stage loss is a TEAM scalar. A (T,) vector is
    the native form; a (T, a) matrix is accepted for reference-surface parity
    but MUST have identical columns — only column 0 is read (the reference
    does the same; golden-tested bitwise in tests/test_gae.py). Per-agent
    stage losses are NOT supported.
    """
    T, n_agent, nh = Tah_hs.shape
    assert T_l.shape[0] == T
    assert Tp1ah_Vh.shape == (T + 1, n_agent, nh)
    assert Tp1_Vl.shape == (T + 1,)
    if T_l.ndim == 2:  # reference passes (T, a) with identical columns
        T_l = T_l[:, 0]

    C = jnp.asarray(_gae_coeff_matrix(T, gae_lambda))  # static (T, T+1)

    Tah_Vh, T_Vl = Tp1ah_Vh[:-1], Tp1_Vl[:-1]
    Vh_final, Vl_final = Tp1ah_Vh[-1], Tp1_Vl[-1]

    init_Vh_rows = jnp.zeros((T + 1, n_agent, nh)).at[0].set(Vh_final)
    init_Vl_rows = jnp.zeros(T + 1).at[0].set(Vl_final)

    # j-th row is valid at step t iff j <= T-1-t; equivalently row j was
    # bootstrapped at s = T - j >= t + 1.
    row_j = jnp.arange(T + 1)

    def loop(carry, inp):
        Vh_rows, Vl_rows = carry
        t, hs, l, Vh_t, Vl_t, coeffs = inp
        ii = T - 1 - t
        mask = (row_j <= ii).astype(Vh_rows.dtype)  # (T+1,)

        h_disc = hs.max(-1, keepdims=True) if discount_to_max else hs  # (a, 1|nh)
        new_Vh_rows = jnp.maximum(hs, (1.0 - disc_gamma) * h_disc + disc_gamma * Vh_rows)
        new_Vh_rows = new_Vh_rows * mask[:, None, None]
        new_Vl_rows = (l + disc_gamma * Vl_rows) * mask

        Qh_t = jnp.einsum("jan,j->an", new_Vh_rows, coeffs)
        Ql_t = jnp.einsum("j,j->", new_Vl_rows, coeffs)

        # Insert the critic's direct estimate at x_t for the next (earlier)
        # step: row index j = T - t = ii + 1.
        next_Vh_rows = new_Vh_rows.at[ii + 1].set(Vh_t)
        next_Vl_rows = new_Vl_rows.at[ii + 1].set(Vl_t)
        return (next_Vh_rows, next_Vl_rows), (Qh_t, Ql_t)

    ts = jnp.arange(T)
    _, (Qh, Ql) = jax.lax.scan(
        loop,
        (init_Vh_rows, init_Vl_rows),
        (ts, Tah_hs, T_l, Tah_Vh, T_Vl, C),
        reverse=True,
    )
    return Qh, Ql
