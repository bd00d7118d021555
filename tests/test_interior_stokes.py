"""End-to-end MMS test: interior Stokes with velocity Dirichlet BC
(reference: examples/interior_stokes.py; ledger comparison:
examples/multi_stokes_for_paper.py:249 gives 4.8e-7 at nb=400 and a
3.3e-10 plateau at nb=700 -- this config asserts the suite into that
plateau territory: measured 5.8e-10 velocity error at nb=600)."""

import numpy as np

from ipde_tpu.functions import BoundaryFunction, EmbeddedFunction
from ipde_tpu.geometry.collection import EmbeddedBoundaryCollection
from ipde_tpu.geometry.curve import star
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


def p_f(x, y):
    return cos(PA * x) + exp(sin(PB * y))


def fu_f(x, y):
    return ((A_**2 * (sin(A_ * x) - cos(A_ * x) ** 2) + B_**2) * u_f(x, y)
            - PA * sin(PA * x))


def fv_f(x, y):
    return (-A_ * B_ * cos(A_ * x) * exp(sin(A_ * x)) * sin(B_ * y)
            * (1 + (A_ / B_) ** 2 * sin(A_ * x) * (3 + sin(A_ * x)))
            + PB * cos(PB * y) * exp(sin(PB * y)))


def test_interior_stokes():
    nb, M = 600, 16
    bdy = star(nb, a=0.15, f=5)
    bh = min(bdy.min_h(), 0.6 / np.abs(bdy.curvature).max() / M)
    ebdy = EmbeddedBoundary(bdy, True, M, bh, qfs_tolerance=1e-14)
    ebdyc = EmbeddedBoundaryCollection([ebdy])
    ebdyc.generate_grid(bh)
    fu = EmbeddedFunction.from_function(ebdyc, fu_f)
    fv = EmbeddedFunction.from_function(ebdyc, fv_f)
    ua = EmbeddedFunction.from_function(ebdyc, u_f)
    va = EmbeddedFunction.from_function(ebdyc, v_f)
    pa = EmbeddedFunction.from_function(ebdyc, p_f)
    bcu = BoundaryFunction.from_function(ebdyc, u_f)
    bcv = BoundaryFunction.from_function(ebdyc, v_f)
    solver = StokesSolver(ebdyc)
    bie = StokesDirichletBIE(solver)
    u, v, p = solver(fu, fv, tol=1e-13)
    u, v, p = bie.apply_bc(u, v, p, bcu, bcv)
    phys = np.asarray(ebdyc.phys)

    def err(g, a_):
        e = abs(g - a_)
        return max(float(np.asarray(e.grid)[phys].max()),
                   float(max(np.abs(np.asarray(r)).max() for r in e.radials)))

    eu, ev = err(u, ua), err(v, va)
    dp = p - pa
    shift = float(np.asarray(dp.grid)[phys].mean())
    ep = err(dp, shift)
    print(f"interior stokes: u {eu:.2e} v {ev:.2e} p {ep:.2e}")
    assert eu < 2e-9, f"u err {eu:.2e}"  # measured 5.84e-10
    assert ev < 2e-9, f"v err {ev:.2e}"  # measured 6.25e-10
    assert ep < 1.5e-7, f"p err {ep:.2e}"  # measured 3.59e-8
