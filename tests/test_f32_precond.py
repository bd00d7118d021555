"""f32 GMRES preconditioner (IPDE_PRECOND_F32=1): same converged accuracy
as the f64 preconditioner, iteration count within a small margin.  Right
preconditioning makes any fixed linear M valid -- these tests pin that the
f32 cast neither degrades the final error nor blows up the iteration
count (annular scalar + Stokes)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ipde_tpu.geometry.annular import AnnularGeometry, AnnularMetric
from ipde_tpu.geometry.curve import star
from ipde_tpu.solvers.annular_scalar import AnnularModifiedHelmholtzSolver
from ipde_tpu.solvers.annular_stokes import AnnularStokesSolver


def _geometry(nb=128, M=12):
    bdy = star(nb, a=0.15, f=3)
    geom = AnnularGeometry(nb, M, -0.25, 0.0, 1.0)
    metric = AnnularMetric(bdy.speed, bdy.curvature, geom)
    return bdy, geom, metric


def test_tol_gate():
    """The f32 flag auto-falls back to f64 below the noise-floor tol
    (measured: f32 M costs a flat ~+20 iterations for tol <= 1e-8)."""
    import os
    from ipde_tpu.solvers.annular_scalar import use_f32_precond
    os.environ["IPDE_PRECOND_F32"] = "1"
    try:
        assert use_f32_precond(1e-6)
        assert not use_f32_precond(1e-12)
        os.environ["IPDE_PRECOND_F32_MIN_TOL"] = "1e-13"
        assert use_f32_precond(1e-12)
    finally:
        del os.environ["IPDE_PRECOND_F32"]
        os.environ.pop("IPDE_PRECOND_F32_MIN_TOL", None)
    assert not use_f32_precond(1e-6)


def test_scalar_f32_precond_matches(monkeypatch):
    bdy, geom, metric = _geometry()
    solver = AnnularModifiedHelmholtzSolver(geom, k=2.0)
    rng = np.random.default_rng(0)
    f = rng.standard_normal((geom.M, geom.n))
    g1 = rng.standard_normal(geom.n)
    g2 = rng.standard_normal(geom.n)

    monkeypatch.delenv("IPDE_PRECOND_F32", raising=False)
    u64, st64 = solver.solve_with_stats(metric, f, g1, g2, tol=1e-12)
    monkeypatch.setenv("IPDE_PRECOND_F32", "1")
    solver32 = AnnularModifiedHelmholtzSolver(geom, k=2.0)  # fresh jit trace
    # tol below the gate: identical f64 path, identical iteration count
    u32, st32 = solver32.solve_with_stats(metric, f, g1, g2, tol=1e-12)
    du = np.abs(np.asarray(u64) - np.asarray(u32)).max()
    scale = np.abs(np.asarray(u64)).max()
    assert du / scale < 1e-9, du / scale
    assert int(st32["iterations"]) == int(st64["iterations"]), (
        int(st32["iterations"]), int(st64["iterations"]))

    # loose tol: the true f32 path engages, same rate as f64
    monkeypatch.delenv("IPDE_PRECOND_F32", raising=False)
    ul64, sl64 = solver.solve_with_stats(metric, f, g1, g2, tol=1e-5)
    monkeypatch.setenv("IPDE_PRECOND_F32", "1")
    ul32, sl32 = solver32.solve_with_stats(metric, f, g1, g2, tol=1e-5)
    dul = np.abs(np.asarray(ul64) - np.asarray(ul32)).max()
    assert dul / scale < 1e-4, dul / scale
    assert int(sl32["iterations"]) <= int(sl64["iterations"]) + 3, (
        int(sl32["iterations"]), int(sl64["iterations"]))


def test_stokes_f32_precond_matches(monkeypatch):
    bdy, geom, metric = _geometry(nb=96, M=10)
    rng = np.random.default_rng(1)
    fr = rng.standard_normal((geom.M, geom.n))
    ft = rng.standard_normal((geom.M, geom.n))
    zb = np.zeros(geom.n)

    monkeypatch.delenv("IPDE_PRECOND_F32", raising=False)
    s64 = AnnularStokesSolver(geom)
    (ur0, ut0, p0), st64 = s64.solve_with_stats(
        metric, fr, ft, zb, zb, zb, zb, tol=1e-11)
    monkeypatch.setenv("IPDE_PRECOND_F32", "1")
    s32 = AnnularStokesSolver(geom)
    (ur1, ut1, p1), st32 = s32.solve_with_stats(
        metric, fr, ft, zb, zb, zb, zb, tol=1e-11)

    scale = np.abs(np.asarray(ur0)).max() + np.abs(np.asarray(ut0)).max()
    du = max(np.abs(np.asarray(ur0) - np.asarray(ur1)).max(),
             np.abs(np.asarray(ut0) - np.asarray(ut1)).max())
    assert du / scale < 1e-8, du / scale
    assert int(st32["iterations"]) <= int(st64["iterations"]) + 8, (
        int(st32["iterations"]), int(st64["iterations"]))


def test_flexible_gmres_matches_plain():
    """flexible=True with an exactly-linear preconditioner reproduces the
    plain right-GMRES solution (new code path regression)."""
    from ipde_tpu.ops.gmres import gmres
    rng = np.random.default_rng(2)
    n = 80
    A = np.eye(n) * 4.0 + 0.1 * rng.standard_normal((n, n))
    Md = np.diag(1.0 / np.diag(A))
    b = rng.standard_normal(n)
    Aj = jnp.asarray(A)
    Mj = jnp.asarray(Md)
    mv = lambda v: Aj @ v
    pc = lambda v: Mj @ v
    r0 = gmres(mv, jnp.asarray(b), precond=pc, tol=1e-13, maxiter=200,
               restart=25)
    r1 = gmres(mv, jnp.asarray(b), precond=pc, tol=1e-13, maxiter=200,
               restart=25, flexible=True)
    x = np.linalg.solve(A, b)
    assert np.abs(np.asarray(r0.x) - x).max() < 1e-11
    assert np.abs(np.asarray(r1.x) - x).max() < 1e-11
    assert abs(int(r0.iterations) - int(r1.iterations)) <= 1
