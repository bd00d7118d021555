"""MMS test for the annular Stokes solver (reference:
examples/annular_stokes.py; same manufactured streamfunction family)."""

import numpy as np
import pytest

from ipde_tpu.geometry.annular import AnnularGeometry, AnnularMetric
from ipde_tpu.geometry.curve import star
from ipde_tpu.solvers.annular_stokes import AnnularStokesSolver

A_, B_ = 2.0, 1.0
PA, PB = 1.0, 2.0


def u_func(x, y):
    return np.exp(np.sin(A_ * x)) * np.cos(B_ * y)


def v_func(x, y):
    return -A_ / B_ * np.cos(A_ * x) * np.exp(np.sin(A_ * x)) * np.sin(B_ * y)


def p_func(x, y):
    return np.cos(PA * x) + np.exp(np.sin(PB * y))


def fu_func(x, y):
    return ((A_**2 * (np.sin(A_ * x) - np.cos(A_ * x) ** 2) + B_**2)
            * u_func(x, y) - PA * np.sin(PA * x))


def fv_func(x, y):
    esin = np.exp(np.sin(A_ * x))
    return (-A_ * B_ * np.cos(A_ * x) * esin * np.sin(B_ * y)
            * (1 + (A_ / B_) ** 2 * np.sin(A_ * x) * (3 + np.sin(A_ * x)))
            + PB * np.cos(PB * y) * np.exp(np.sin(PB * y)))


def _to_rt(bdy, fu, fv):
    return (fu * bdy.normal_x + fv * bdy.normal_y,
            fu * bdy.tangent_x + fv * bdy.tangent_y)


def test_annular_stokes():
    nb, M = 300, 16
    bdy = star(nb, a=0.15, f=5)
    w = min(0.1, 0.5 / np.abs(bdy.curvature).max())
    geom = AnnularGeometry(nb, M, -w, 0.0, 1.0)
    metric = AnnularMetric(bdy.speed, bdy.curvature, geom)
    x = bdy.x + geom.rv0[:, None] * bdy.normal_x
    y = bdy.y + geom.rv0[:, None] * bdy.normal_y
    fr, ft = _to_rt(bdy, fu_func(x, y), fv_func(x, y))
    ur_a, ut_a = _to_rt(bdy, u_func(x, y), v_func(x, y))
    pa = p_func(x, y)
    # BCs at the exact edges
    lx, ly = bdy.x - w * bdy.normal_x, bdy.y - w * bdy.normal_y
    ux_, uy_ = bdy.x, bdy.y
    lbc_r, lbc_t = _to_rt(bdy, u_func(lx, ly), v_func(lx, ly))
    ubc_r, ubc_t = _to_rt(bdy, u_func(ux_, uy_), v_func(ux_, uy_))
    solver = AnnularStokesSolver(geom, mu=1.0)
    ur, ut, p = solver.solve(metric, fr, ft, lbc_r, lbc_t, ubc_r, ubc_t,
                             tol=1e-13, verbose=True)
    err_r = np.abs(np.asarray(ur) - ur_a).max()
    err_t = np.abs(np.asarray(ut) - ut_a).max()
    # pressure matches up to an additive constant
    pd = np.asarray(p) - pa
    err_p = np.abs(pd - pd.mean()).max()
    print(f"stokes errs: ur {err_r:.2e} ut {err_t:.2e} p {err_p:.2e}")
    assert err_r < 5e-10
    assert err_t < 5e-10
    assert err_p < 5e-8
    assert solver.iterations_last_call < 120


def test_batched_stokes_matches_sequential():
    """batched_stokes_solve (one vmapped GMRES over the boundary axis) must
    reproduce the per-boundary solve to roundoff on two DIFFERENT metrics
    of the same (M, n)."""
    import jax.numpy as jnp
    from ipde_tpu.solvers.annular_stokes import batched_stokes_solve

    nb, M = 128, 10
    solvers, metrics, rhss, seq = [], [], [], []
    for a, f in [(0.12, 4), (0.05, 3)]:
        bdy = star(nb, a=a, f=f)
        w = min(0.1, 0.5 / np.abs(bdy.curvature).max())
        geom = AnnularGeometry(nb, M, -w, 0.0, 1.0)
        metric = AnnularMetric(bdy.speed, bdy.curvature, geom)
        x = bdy.x + geom.rv0[:, None] * bdy.normal_x
        y = bdy.y + geom.rv0[:, None] * bdy.normal_y
        fr, ft = _to_rt(bdy, fu_func(x, y), fv_func(x, y))
        zero = np.zeros(nb)
        s = AnnularStokesSolver(geom, mu=1.0)
        solvers.append(s)
        metrics.append(metric)
        rhss.append(s.build_rhs(jnp.asarray(fr), jnp.asarray(ft),
                                zero, zero, zero, zero))
        seq.append(s.solve(metric, fr, ft, zero, zero, zero, zero,
                           tol=1e-13))
    outs, stats = batched_stokes_solve(solvers, metrics, rhss, 1e-13,
                                       200, 50)
    for (ur_b, ut_b, p_b), (ur_s, ut_s, p_s) in zip(outs, seq):
        assert np.abs(np.asarray(ur_b) - np.asarray(ur_s)).max() < 1e-11
        assert np.abs(np.asarray(ut_b) - np.asarray(ut_s)).max() < 1e-11
        assert np.abs(np.asarray(p_b) - np.asarray(p_s)).max() < 1e-9
    assert np.asarray(stats["iterations"]).shape == (2,)
