"""MMS tests for the annular scalar solvers (reference:
examples/annular_poisson.py, examples/annular_modified_helmholtz.py)."""

import numpy as np
import pytest

from ipde_tpu.geometry.annular import AnnularGeometry, AnnularMetric
from ipde_tpu.geometry.curve import star
from ipde_tpu.solvers.annular_scalar import (AnnularModifiedHelmholtzSolver,
                                             AnnularPoissonSolver)

KW = 2 * np.pi / 3


def sol_func(x, y):
    return np.exp(np.sin(KW * x)) * np.sin(KW * y)


def lap_sol_func(x, y):
    return (KW**2 * np.exp(np.sin(KW * x)) * np.sin(KW * y)
            * (np.cos(KW * x) ** 2 - np.sin(KW * x) - 1.0))


def _radial_grid(bdy, geom):
    x = bdy.x + geom.rv0[:, None] * bdy.normal_x
    y = bdy.y + geom.rv0[:, None] * bdy.normal_y
    return x, y


def _edge_points(bdy, r):
    return bdy.x + r * bdy.normal_x, bdy.y + r * bdy.normal_y


@pytest.mark.parametrize("interior", [True, False])
def test_annular_poisson(interior):
    nb, M = 400, 16
    bdy = star(nb, a=0.1, f=5)
    width = 0.15
    lb, ub = (-width, 0.0) if interior else (0.0, width)
    approx_r = np.hypot(bdy.x - bdy.x.mean(), bdy.y - bdy.y.mean()).mean()
    geom = AnnularGeometry(nb, M, lb, ub, approx_r)
    metric = AnnularMetric(bdy.speed, bdy.curvature, geom)
    x, y = _radial_grid(bdy, geom)
    force = lap_sol_func(x, y)
    ua = sol_func(x, y)
    g_lb = sol_func(*_edge_points(bdy, lb))
    g_ub = sol_func(*_edge_points(bdy, ub))
    solver = AnnularPoissonSolver(geom)
    u = solver.solve(metric, force, g_lb, g_ub, tol=1e-14, verbose=True)
    err = np.abs(np.asarray(u) - ua).max()
    assert err < 2e-12, f"annular Poisson err {err:.2e}"
    assert solver.iterations_last_call < 60


def test_annular_modified_helmholtz():
    nb, M = 400, 16
    k = 3.0
    bdy = star(nb, a=0.1, f=5)
    width = 0.15
    geom = AnnularGeometry(nb, M, -width, 0.0, 1.0)
    metric = AnnularMetric(bdy.speed, bdy.curvature, geom)
    x, y = _radial_grid(bdy, geom)
    ua = sol_func(x, y)
    force = k**2 * ua - lap_sol_func(x, y)
    solver = AnnularModifiedHelmholtzSolver(geom, k=k)
    g_lb = sol_func(*_edge_points(bdy, -width))
    g_ub = sol_func(*_edge_points(bdy, 0.0))
    u = solver.solve(metric, force, g_lb, g_ub, tol=1e-14)
    err = np.abs(np.asarray(u) - ua).max()
    assert err < 2e-12, f"annular MH err {err:.2e}"


def test_annular_neumann_bc():
    """Robin/Neumann at the outer edge: u_r = g at r=ub."""
    nb, M = 300, 16
    bdy = star(nb, a=0.1, f=3)
    width = 0.12
    geom = AnnularGeometry(nb, M, -width, 0.0, 1.0)
    metric = AnnularMetric(bdy.speed, bdy.curvature, geom)
    x, y = _radial_grid(bdy, geom)
    ua = sol_func(x, y)
    k = 2.0
    force = k**2 * ua - lap_sol_func(x, y)
    # normal derivative at r=0 (the boundary): grad(u) . n
    bx, by = _edge_points(bdy, 0.0)
    dudx = KW * np.cos(KW * bx) * np.exp(np.sin(KW * bx)) * np.sin(KW * by)
    dudy = KW * np.exp(np.sin(KW * bx)) * np.cos(KW * by)
    g_ub = dudx * bdy.normal_x + dudy * bdy.normal_y
    g_lb = sol_func(*_edge_points(bdy, -width))
    solver = AnnularModifiedHelmholtzSolver(geom, k=k, ua=0.0, ub_c=1.0)
    u = solver.solve(metric, force, g_lb, g_ub, tol=1e-14)
    err = np.abs(np.asarray(u) - ua).max()
    assert err < 5e-11, f"annular Neumann err {err:.2e}"
