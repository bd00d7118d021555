"""End-to-end MMS test: interior modified Helmholtz, Dirichlet BC
(reference: examples/interior_modified_helmholtz.py)."""

import numpy as np

from ipde_tpu.functions import BoundaryFunction, EmbeddedFunction
from ipde_tpu.geometry.collection import EmbeddedBoundaryCollection
from ipde_tpu.geometry.curve import star
from ipde_tpu.geometry.embedded_boundary import EmbeddedBoundary
from ipde_tpu.solvers.bie import DirichletBIE
from ipde_tpu.solvers.scalar import ModifiedHelmholtzSolver

KH = 2.0


def solution_func(x, y):
    return np.exp(np.sin(x)) * np.sin(2 * y) + 0.3 * np.cos(3 * x) * np.cos(y)


def lap_sol(x, y):
    u1 = np.exp(np.sin(x)) * np.sin(2 * y)
    u1xx = np.exp(np.sin(x)) * (np.cos(x) ** 2 - np.sin(x)) * np.sin(2 * y)
    u2 = 0.3 * np.cos(3 * x) * np.cos(y)
    return u1xx - 4 * u1 - 10 * u2


def force_func(x, y):
    return KH**2 * solution_func(x, y) - lap_sol(x, y)


def test_interior_mh():
    nb, M = 800, 20
    bdy = star(nb, a=0.2, f=5)
    bh = min(bdy.min_h(), 0.6 / np.abs(bdy.curvature).max() / M)
    ebdy = EmbeddedBoundary(bdy, True, M, bh, qfs_tolerance=1e-14)
    ebdyc = EmbeddedBoundaryCollection([ebdy])
    ebdyc.generate_grid(bh)
    f = EmbeddedFunction.from_function(ebdyc, force_func)
    ua = EmbeddedFunction.from_function(ebdyc, solution_func)
    bc = BoundaryFunction.from_function(ebdyc, solution_func)
    solver = ModifiedHelmholtzSolver(ebdyc, k=KH)
    ue = DirichletBIE(solver).apply_bc(solver(f, tol=1e-14), bc)
    err = abs(ue - ua)
    re = float(np.abs(np.asarray(err.radials[0])).max())
    ge = float(np.asarray(err.grid)[np.asarray(ebdyc.phys)].max())
    # 2.5e-10 at nb=800: ~4x better than the reference's ~1e-9 plateau
    # (examples/interior_modified_helmholtz_using_multi_neumann_bc.py:120-124).
    # The exact value moved from 1.0e-10 to 1.3e-10 when the curve-resampling
    # Nyquist bug was fixed (slightly different QFS source curves).
    assert max(re, ge) < 2.5e-10, f"interior MH: err {max(re, ge):.2e}"
