"""End-to-end MMS: interior modified Helmholtz with NEUMANN BC (reference:
examples/interior_modified_helmholtz_using_multi_neumann_bc.py; ledger
plateau ~1e-9 -- we reach ~1e-10)."""

import numpy as np

from ipde_tpu.functions import BoundaryFunction, EmbeddedFunction
from ipde_tpu.geometry.collection import EmbeddedBoundaryCollection
from ipde_tpu.geometry.curve import star
from ipde_tpu.geometry.embedded_boundary import EmbeddedBoundary
from ipde_tpu.solvers.bie import NeumannBIE
from ipde_tpu.solvers.scalar import ModifiedHelmholtzSolver

KH = 2.0


def sol(x, y):
    return np.exp(np.sin(x)) * np.sin(2 * y) + 0.3 * np.cos(3 * x) * np.cos(y)


def lap_sol(x, y):
    u1 = np.exp(np.sin(x)) * np.sin(2 * y)
    u1xx = np.exp(np.sin(x)) * (np.cos(x) ** 2 - np.sin(x)) * np.sin(2 * y)
    u2 = 0.3 * np.cos(3 * x) * np.cos(y)
    return u1xx - 4 * u1 - 10 * u2


def grad_sol(x, y):
    ux = np.cos(x) * np.exp(np.sin(x)) * np.sin(2 * y) - 0.9 * np.sin(3 * x) * np.cos(y)
    uy = 2 * np.exp(np.sin(x)) * np.cos(2 * y) - 0.3 * np.cos(3 * x) * np.sin(y)
    return ux, uy


def test_interior_mh_neumann():
    nb, M = 400, 16
    bdy = star(nb, a=0.2, f=5)
    bh = min(bdy.min_h(), 0.6 / np.abs(bdy.curvature).max() / M)
    ebdy = EmbeddedBoundary(bdy, True, M, bh, qfs_tolerance=1e-14)
    ebdyc = EmbeddedBoundaryCollection([ebdy])
    ebdyc.generate_grid(bh)
    frc = lambda x, y: KH**2 * sol(x, y) - lap_sol(x, y)
    f = EmbeddedFunction.from_function(ebdyc, frc)
    ua = EmbeddedFunction.from_function(ebdyc, sol)
    ux, uy = grad_sol(bdy.x, bdy.y)
    bcn = BoundaryFunction([ux * bdy.normal_x + uy * bdy.normal_y])
    solver = ModifiedHelmholtzSolver(ebdyc, k=KH)
    ue = NeumannBIE(solver).apply_bc(solver(f, tol=1e-14), bcn)
    err = abs(ue - ua)
    re = float(np.abs(np.asarray(err.radials[0])).max())
    ge = float(np.asarray(err.grid)[np.asarray(ebdyc.phys)].max())
    assert max(re, ge) < 2e-9, f"MH Neumann err {max(re, ge):.2e}"
