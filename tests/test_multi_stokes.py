"""Two-body Stokes (interior star + inclusion) end-to-end MMS
(reference: examples/multi_stokes_for_paper.py; its ledger reaches 4.8e-7
at nb=400 -- we reach ~5e-10 at nb=200)."""

import numpy as np

from ipde_tpu.functions import BoundaryFunction, EmbeddedFunction
from ipde_tpu.geometry.collection import EmbeddedBoundaryCollection
from ipde_tpu.geometry.curve import squished_circle, star
from ipde_tpu.geometry.embedded_boundary import EmbeddedBoundary
from ipde_tpu.solvers.bie import StokesDirichletBIE
from ipde_tpu.solvers.vector import StokesSolver

A_, B_ = 2.0, 1.0
PA, PB = 1.0, 2.0
sin, cos, exp = np.sin, np.cos, np.exp


def u_f(x, y):
    return exp(sin(A_ * x)) * cos(B_ * y)


def v_f(x, y):
    return -A_ / B_ * cos(A_ * x) * exp(sin(A_ * x)) * sin(B_ * y)


def fu_f(x, y):
    return ((A_**2 * (sin(A_ * x) - cos(A_ * x) ** 2) + B_**2) * u_f(x, y)
            - PA * sin(PA * x))


def fv_f(x, y):
    return (-A_ * B_ * cos(A_ * x) * exp(sin(A_ * x)) * sin(B_ * y)
            * (1 + (A_ / B_) ** 2 * sin(A_ * x) * (3 + sin(A_ * x)))
            + PB * cos(PB * y) * exp(sin(PB * y)))


def test_two_body_stokes():
    nb, M = 200, 10
    bdy1 = star(2 * nb, a=0.08, f=4, r=1.6)
    bdy2 = squished_circle(nb, x=-0.3, y=-0.2, r=0.4, b=0.7, rot=np.pi / 6)
    kmax = max(np.abs(b_.curvature).max() for b_ in (bdy1, bdy2))
    bh = min(min(b_.min_h() for b_ in (bdy1, bdy2)), 0.6 / kmax / M)
    ebdys = [EmbeddedBoundary(b_, b_ is bdy1, M, bh, qfs_tolerance=1e-14)
             for b_ in (bdy1, bdy2)]
    ebdyc = EmbeddedBoundaryCollection(ebdys)
    ebdyc.generate_grid(bh)
    fu = EmbeddedFunction.from_function(ebdyc, fu_f)
    fv = EmbeddedFunction.from_function(ebdyc, fv_f)
    ua = EmbeddedFunction.from_function(ebdyc, u_f)
    va = EmbeddedFunction.from_function(ebdyc, v_f)
    bcu = BoundaryFunction.from_function(ebdyc, u_f)
    bcv = BoundaryFunction.from_function(ebdyc, v_f)
    solver = StokesSolver(ebdyc)
    u, v, p = solver(fu, fv, tol=1e-13)
    u, v, p = StokesDirichletBIE(solver).apply_bc(u, v, p, bcu, bcv)
    phys = np.asarray(ebdyc.phys)

    def err(g, a_):
        e = abs(g - a_)
        return max(float(np.asarray(e.grid)[phys].max()),
                   float(max(np.abs(np.asarray(r)).max()
                             for r in e.radials)))

    eu, ev = err(u, ua), err(v, va)
    assert eu < 5e-8, f"2-body Stokes u err {eu:.2e}"
    assert ev < 5e-8, f"2-body Stokes v err {ev:.2e}"
