"""Multi-body (multiply-connected domain) end-to-end MMS test: one interior
star + two exterior inclusions, modified Helmholtz with Dirichlet BCs
(reference: examples/multi_modified_helmholtz.py)."""

import numpy as np

from ipde_tpu.functions import BoundaryFunction, EmbeddedFunction
from ipde_tpu.geometry.collection import EmbeddedBoundaryCollection
from ipde_tpu.geometry.curve import squished_circle, star
from ipde_tpu.geometry.embedded_boundary import EmbeddedBoundary
from ipde_tpu.solvers.bie import DirichletBIE
from ipde_tpu.solvers.scalar import ModifiedHelmholtzSolver

KH = 2.0


def sol(x, y):
    return np.exp(np.sin(x)) * np.sin(2 * y) + 0.3 * np.cos(3 * x) * np.cos(y)


def lap_sol(x, y):
    u1 = np.exp(np.sin(x)) * np.sin(2 * y)
    u1xx = np.exp(np.sin(x)) * (np.cos(x) ** 2 - np.sin(x)) * np.sin(2 * y)
    u2 = 0.3 * np.cos(3 * x) * np.cos(y)
    return u1xx - 4 * u1 - 10 * u2


def test_three_body_mh():
    nb, M = 200, 10
    bdy1 = star(3 * nb // 2, a=0.1, f=5, r=2.0)
    bdy2 = star(nb, x=-0.8, y=-0.5, a=0.1, f=3, r=0.45)
    bdy3 = squished_circle(nb, x=0.7, y=0.6, r=0.5, b=0.7, rot=np.pi / 5)
    kmax = max(np.abs(b.curvature).max() for b in (bdy1, bdy2, bdy3))
    bh = min(min(b.min_h() for b in (bdy1, bdy2, bdy3)), 0.6 / kmax / M)
    ebdys = [EmbeddedBoundary(b, b is bdy1, M, bh, qfs_tolerance=1e-14)
             for b in (bdy1, bdy2, bdy3)]
    ebdyc = EmbeddedBoundaryCollection(ebdys)
    ebdyc.generate_grid(bh)
    frc = lambda x, y: KH**2 * sol(x, y) - lap_sol(x, y)
    f = EmbeddedFunction.from_function(ebdyc, frc)
    ua = EmbeddedFunction.from_function(ebdyc, sol)
    bc = BoundaryFunction.from_function(ebdyc, sol)
    solver = ModifiedHelmholtzSolver(ebdyc, k=KH)
    ue = DirichletBIE(solver).apply_bc(solver(f, tol=1e-14), bc)
    err = abs(ue - ua)
    res = [float(np.abs(np.asarray(r)).max()) for r in err.radials]
    ge = float(np.asarray(err.grid)[np.asarray(ebdyc.phys)].max())
    total = max(max(res), ge)
    assert total < 5e-9, f"3-body MH err {total:.2e}"
