"""Dec-EFOCP GAE kernel vs a from-scratch numpy oracle.

The oracle computes, by definition, every n-step DP estimate Wh[t, s]
(bootstrapped at s) and mixes them with GAE weights — independent of both the
reference implementation (algo/utils.py:11-79) and our scan kernel.
"""
import numpy as np
import pytest

from dgppo_fov_tpu.algo.gae import compute_dec_ocp_gae


def oracle_gae(hs, l, Vh, Vl, gamma, lam, discount_to_max=True):
    """hs: (T, a, nh), l: (T,), Vh: (T+1, a, nh), Vl: (T+1,)."""
    T, a, nh = hs.shape
    Qh = np.zeros((T, a, nh))
    Ql = np.zeros(T)
    for t in range(T):
        # All bootstrap times s in [t+1, T].
        Wh = {}
        Wl = {}
        for s in range(t + 1, T + 1):
            wh = Vh[s].copy()  # (a, nh)
            wl = Vl[s]
            for u in range(s - 1, t - 1, -1):
                hd = hs[u].max(-1, keepdims=True) if discount_to_max else hs[u]
                wh = np.maximum(hs[u], (1 - gamma) * hd + gamma * wh)
                wl = l[u] + gamma * wl
            Wh[s] = wh
            Wl[s] = wl
        ii = T - 1 - t
        qh = lam**ii * Wh[T]
        ql = lam**ii * Wl[T]
        for s in range(t + 1, T):
            w = lam ** (s - t - 1) * (1 - lam)
            qh = qh + w * Wh[s]
            ql = ql + w * Wl[s]
        Qh[t] = qh
        Ql[t] = ql
    return Qh, Ql


@pytest.mark.parametrize("T,a,nh", [(8, 3, 2), (16, 2, 3), (5, 1, 1)])
@pytest.mark.parametrize("lam", [0.95, 0.5, 1.0])
def test_gae_matches_oracle(T, a, nh, lam):
    rng = np.random.default_rng(0)
    hs = rng.normal(size=(T, a, nh)).astype(np.float32)
    l = rng.normal(size=(T,)).astype(np.float32)
    Vh = rng.normal(size=(T + 1, a, nh)).astype(np.float32)
    Vl = rng.normal(size=(T + 1,)).astype(np.float32)
    gamma = 0.99

    Qh, Ql = compute_dec_ocp_gae(hs, l, Vh, Vl, disc_gamma=gamma, gae_lambda=lam)
    Qh_o, Ql_o = oracle_gae(hs, l, Vh, Vl, gamma, lam)

    np.testing.assert_allclose(np.asarray(Qh), Qh_o, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Ql), Ql_o, rtol=1e-4, atol=1e-5)


def test_gae_no_discount_to_max():
    rng = np.random.default_rng(1)
    T, a, nh = 7, 2, 2
    hs = rng.normal(size=(T, a, nh)).astype(np.float32)
    l = rng.normal(size=(T,)).astype(np.float32)
    Vh = rng.normal(size=(T + 1, a, nh)).astype(np.float32)
    Vl = rng.normal(size=(T + 1,)).astype(np.float32)

    Qh, Ql = compute_dec_ocp_gae(
        hs, l, Vh, Vl, disc_gamma=0.9, gae_lambda=0.9, discount_to_max=False
    )
    Qh_o, Ql_o = oracle_gae(hs, l, Vh, Vl, 0.9, 0.9, discount_to_max=False)
    np.testing.assert_allclose(np.asarray(Qh), Qh_o, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Ql), Ql_o, rtol=1e-4, atol=1e-5)


def test_gae_accepts_per_agent_l():
    """The reference passes T_l as (T, a) with identical columns."""
    rng = np.random.default_rng(2)
    T, a, nh = 6, 3, 2
    hs = rng.normal(size=(T, a, nh)).astype(np.float32)
    l = rng.normal(size=(T,)).astype(np.float32)
    Vh = rng.normal(size=(T + 1, a, nh)).astype(np.float32)
    Vl = rng.normal(size=(T + 1,)).astype(np.float32)

    _, Ql_1 = compute_dec_ocp_gae(hs, l, Vh, Vl, disc_gamma=0.99, gae_lambda=0.95)
    l2 = np.repeat(l[:, None], a, axis=1)
    _, Ql_2 = compute_dec_ocp_gae(hs, l2, Vh, Vl, disc_gamma=0.99, gae_lambda=0.95)
    np.testing.assert_allclose(np.asarray(Ql_1), np.asarray(Ql_2))
