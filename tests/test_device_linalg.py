"""Blocked device factorizations vs LAPACK ground truth (CPU backend)."""

import numpy as np
import jax.numpy as jnp

from ipde_tpu.ops.device_linalg import (cholesky_blocked, lu_inverse_blocked,
                                        minnorm_compose, solve_lower,
                                        solve_lower_t, spd_solve)


def _spd(n, rng, cond=1e6):
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    s = np.logspace(0, -np.log10(cond), n)
    return (Q * s) @ Q.T


def test_cholesky_blocked_matches_numpy():
    rng = np.random.default_rng(0)
    for n in [64, 300, 513]:
        G = _spd(n, rng, cond=1e8)
        F = cholesky_blocked(G, block=128)
        L = np.asarray(F.L)[:n, :n]
        err = np.abs(L @ L.T - G).max()
        assert err < 1e-12 * np.abs(G).max(), (n, err)
        assert np.abs(np.triu(L, 1)).max() == 0.0


def test_triangular_solves():
    rng = np.random.default_rng(1)
    n = 300
    G = _spd(n, rng, cond=1e6)
    F = cholesky_blocked(G, block=128)
    L = np.asarray(F.L)[:n, :n]
    B = rng.standard_normal((n, 7))
    X = np.asarray(solve_lower(F, B))[:n]
    np.testing.assert_allclose(L @ X, B, atol=1e-10)
    Xt = np.asarray(solve_lower_t(F, B))[:n]
    np.testing.assert_allclose(L.T @ Xt, B, atol=1e-10)
    S = np.asarray(spd_solve(F, B))
    np.testing.assert_allclose(G @ S, B, atol=1e-8)
    # vector RHS path
    v = rng.standard_normal(n)
    sv = np.asarray(spd_solve(F, v))
    np.testing.assert_allclose(G @ sv, v, atol=1e-8)


def test_lu_inverse_blocked_second_kind():
    rng = np.random.default_rng(2)
    n = 300
    # second-kind structure: I/2 + compact (small smooth perturbation)
    K = rng.standard_normal((n, n)) / n
    A = 0.5 * np.eye(n) + K
    Ainv = np.asarray(lu_inverse_blocked(A, block=128))
    err = np.abs(Ainv @ A - np.eye(n)).max()
    assert err < 1e-11, err


def test_minnorm_compose_matches_lstsq():
    """QFS-like graded wide system: compare the composed maps' ACTION to the
    LAPACK lstsq pseudo-inverse (fields from either density must agree)."""
    rng = np.random.default_rng(3)
    m, n = 120, 360
    # graded singular values like a QFS system (cond ~ 3e4)
    U, _ = np.linalg.qr(rng.standard_normal((m, m)))
    V, _ = np.linalg.qr(rng.standard_normal((n, m)))
    s = np.logspace(0, -4.5, m)
    A = (U * s) @ V.T
    Bf = rng.standard_normal((m, m))
    (M,) = minnorm_compose(A, [Bf], refine=1, block=128)
    M = np.asarray(M)
    import scipy.linalg as sla
    X, _, _, _ = sla.lstsq(A, Bf, cond=1e-15, lapack_driver="gelsy")
    tau = rng.standard_normal(m)
    # compare the resulting CHECK VALUES A @ sigma (the physical field proxy)
    f_dev = A @ (M @ tau)
    f_ref = A @ (X @ tau)
    want = Bf @ tau
    assert np.abs(f_dev - want).max() < 1e-9 * np.abs(want).max()
    np.testing.assert_allclose(f_dev, f_ref, atol=1e-9 * np.abs(want).max())
