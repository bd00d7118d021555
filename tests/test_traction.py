"""Traction computation on the radial grid vs analytic stress
(reference: examples/test_traction_computation.py)."""

import numpy as np

from ipde_tpu.functions import EmbeddedFunction
from ipde_tpu.geometry.collection import EmbeddedBoundaryCollection
from ipde_tpu.geometry.curve import star
from ipde_tpu.geometry.embedded_boundary import EmbeddedBoundary
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


def grads(x, y):
    ux = A_ * cos(A_ * x) * exp(sin(A_ * x)) * cos(B_ * y)
    uy = -B_ * exp(sin(A_ * x)) * sin(B_ * y)
    vx = (A_**2 / B_) * (sin(A_ * x) - cos(A_ * x) ** 2) \
        * exp(sin(A_ * x)) * sin(B_ * y)
    vy = -A_ * cos(A_ * x) * exp(sin(A_ * x)) * cos(B_ * y)
    return ux, uy, vx, vy


def test_boundary_traction():
    nb, M = 300, 14
    bdy = star(nb, a=0.15, f=5)
    bh = min(bdy.min_h(), 0.6 / np.abs(bdy.curvature).max() / M)
    ebdy = EmbeddedBoundary(bdy, True, M, bh)
    ebdyc = EmbeddedBoundaryCollection([ebdy])
    ebdyc.generate_grid(bh)
    u = EmbeddedFunction.from_function(ebdyc, u_f)
    v = EmbeddedFunction.from_function(ebdyc, v_f)
    p = EmbeddedFunction.from_function(ebdyc, p_f)
    solver = StokesSolver(ebdyc)
    (tx, ty), = solver.get_boundary_tractions(u, v, p)
    # analytic traction: sigma.n with sigma = -p I + (grad u + grad u^T)
    ux, uy, vx, vy = grads(bdy.x, bdy.y)
    pb = p_f(bdy.x, bdy.y)
    nx, ny = bdy.normal_x, bdy.normal_y
    tx_a = (-pb + 2 * ux) * nx + (uy + vx) * ny
    ty_a = (uy + vx) * nx + (-pb + 2 * vy) * ny
    ex = np.abs(np.asarray(tx) - tx_a).max()
    ey = np.abs(np.asarray(ty) - ty_a).max()
    scale = max(np.abs(tx_a).max(), np.abs(ty_a).max())
    assert ex / scale < 1e-6, f"traction x rel err {ex/scale:.2e}"
    assert ey / scale < 1e-6, f"traction y rel err {ey/scale:.2e}"
