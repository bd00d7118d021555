"""Collection calculus parity: laplacian, FD derivative_type, and
interpolate_grid_to_radial (reference: ipde/ebdy_collection.py:630,711-792),
plus the 'fourth' solver_type end-to-end
(reference: ipde/solvers/multi_boundary/scalar.py:25,47)."""

import numpy as np

from ipde_tpu.functions import BoundaryFunction, EmbeddedFunction
from ipde_tpu.geometry.collection import EmbeddedBoundaryCollection
from ipde_tpu.geometry.curve import star
from ipde_tpu.geometry.embedded_boundary import EmbeddedBoundary


def _setup(nb=300, M=12):
    bdy = star(nb, a=0.1, f=3)
    bh = min(bdy.min_h(), 0.6 / np.abs(bdy.curvature).max() / M)
    ebdy = EmbeddedBoundary(bdy, True, M, bh, qfs_tolerance=1e-12)
    ebdyc = EmbeddedBoundaryCollection([ebdy])
    ebdyc.generate_grid(bh)
    return ebdyc


F = lambda x, y: np.exp(np.sin(x)) * np.sin(2 * y)
FX = lambda x, y: np.cos(x) * np.exp(np.sin(x)) * np.sin(2 * y)
FY = lambda x, y: 2 * np.exp(np.sin(x)) * np.cos(2 * y)
FLAP = lambda x, y: (np.exp(np.sin(x)) * (np.cos(x) ** 2 - np.sin(x))
                     * np.sin(2 * y) - 4 * F(x, y))


def test_gradient_and_laplacian():
    ebdyc = _setup()
    f = EmbeddedFunction.from_function(ebdyc, F)
    phys = np.asarray(ebdyc.phys)

    fx, fy = ebdyc.gradient(f)
    fxa = EmbeddedFunction.from_function(ebdyc, FX)
    fya = EmbeddedFunction.from_function(ebdyc, FY)
    assert float(abs(fx - fxa).max_on(ebdyc)) < 3e-6
    assert float(abs(fy - fya).max_on(ebdyc)) < 3e-6

    fl = ebdyc.laplacian(f)
    fla = EmbeddedFunction.from_function(ebdyc, FLAP)
    # radial part is exact-to-roundoff; the grid part differentiates the
    # ROLLED-OFF extension, so the Slepian truncation error is amplified by
    # k^2 (the reference's laplacian shares this; converges spectrally in
    # resolution: 2.8e-3 at nb=300 -> 2.8e-5 at nb=600)
    assert np.abs(np.asarray(fl.radials[0])
                  - np.asarray(fla.radials[0])).max() < 1e-8
    ge_lap = np.abs(np.asarray(fl.grid) - np.asarray(fla.grid))
    assert ge_lap[phys].max() < 1e-2

    # FD variants: 4th order; check only points whose 5-point stencil stays
    # inside the pna region (cells nearer the annulus see rolled-off values)
    fx4, fy4 = ebdyc.gradient(f, derivative_type="fourth")
    ge = np.abs(np.asarray(fx4.grid) - np.asarray(fxa.grid))
    pna = np.asarray(ebdyc.phys_not_in_annulus)
    core = pna.copy()
    for ax in (0, 1):
        for sh in (-2, -1, 1, 2):
            core &= np.roll(pna, sh, axis=ax)
    assert ge[core].max() < 3e-5
    fl4 = ebdyc.laplacian(f, derivative_type="fourth")
    gl = np.abs(np.asarray(fl4.grid) - np.asarray(fla.grid))
    assert gl[core].max() < 3e-3


def test_interpolate_grid_to_radial():
    ebdyc = _setup()
    g = ebdyc.grid
    # a function smooth across the WHOLE box (requirement of this helper)
    tx = (g.xg - g.x_bounds[0]) / g.x_period * 2 * np.pi
    ty = (g.yg - g.y_bounds[0]) / g.y_period * 2 * np.pi
    f = np.sin(tx) * np.cos(2 * ty)
    rads = ebdyc.interpolate_grid_to_radial(f, order=5)
    e = ebdyc.ebdys[0]
    rtx = (e.radial_x - g.x_bounds[0]) / g.x_period * 2 * np.pi
    rty = (e.radial_y - g.y_bounds[0]) / g.y_period * 2 * np.pi
    exact = np.sin(rtx) * np.cos(2 * rty)
    assert np.abs(np.asarray(rads[0]) - exact).max() < 2e-7


def test_fourth_solver_type_poisson():
    from ipde_tpu.solvers.bie import DirichletBIE
    from ipde_tpu.solvers.scalar import PoissonSolver

    sol = lambda x, y: -np.cos(x) * np.exp(np.sin(x)) * np.sin(y)
    frc = lambda x, y: ((2.0 * np.cos(x) + 3.0 * np.cos(x) * np.sin(x)
                         - np.cos(x) ** 3) * np.exp(np.sin(x)) * np.sin(y))
    ebdyc = _setup(nb=300, M=12)
    f = EmbeddedFunction.from_function(ebdyc, frc)
    ua = EmbeddedFunction.from_function(ebdyc, sol)
    bc = BoundaryFunction.from_function(ebdyc, sol)
    solver = PoissonSolver(ebdyc, solver_type="fourth")
    ue = DirichletBIE(solver).apply_bc(solver(f, tol=1e-12), bc)
    err = float(abs(ue - ua).max_on(ebdyc))
    # 4th-order interface data limits accuracy vs the spectral path
    assert err < 5e-6, f"fourth solver_type: err {err:.2e}"


def test_fourth_solver_type_stokes():
    """Stokes 'fourth' path (reference: multi_boundary/vector.py:7-47)."""
    from ipde_tpu.solvers.bie import StokesDirichletBIE
    from ipde_tpu.solvers.vector import StokesSolver

    usol = lambda x, y: np.sin(x) * np.cos(y) + 0.2 * np.cos(2 * y)
    vsol = lambda x, y: -np.cos(x) * np.sin(y) + 0.1 * np.sin(2 * x)
    fuf = lambda x, y: (2 * np.sin(x) * np.cos(y) + 0.8 * np.cos(2 * y)
                        - np.sin(x) * np.sin(y))
    fvf = lambda x, y: (-2 * np.cos(x) * np.sin(y) + 0.4 * np.sin(2 * x)
                        + np.cos(x) * np.cos(y))
    ebdyc = _setup(nb=300, M=12)
    fu = EmbeddedFunction.from_function(ebdyc, fuf)
    fv = EmbeddedFunction.from_function(ebdyc, fvf)
    ua = EmbeddedFunction.from_function(ebdyc, usol)
    bc_u = BoundaryFunction.from_function(ebdyc, usol)
    bc_v = BoundaryFunction.from_function(ebdyc, vsol)
    solver = StokesSolver(ebdyc, solver_type="fourth")
    bie = StokesDirichletBIE(solver)
    u, v, p = solver(fu, fv, tol=1e-12)
    u, v, p = bie.apply_bc(u, v, p, bc_u, bc_v)
    err = float(abs(u - ua).max_on(ebdyc))
    # 4th-order interface data limits accuracy vs the spectral path
    assert err < 2e-5, f"fourth solver_type stokes: err {err:.2e}"


def test_grid_value_accessors():
    """get_grid_value / get_smoothed_grid_value parity (reference:
    ipde/embedded_function.py:184-194): exterior zeroed; smoothed value
    equals grid * grid_step (1 deep inside, 0 outside, C^k across the
    annulus)."""
    ebdyc = _setup()
    f = EmbeddedFunction.from_function(ebdyc, F)
    phys = np.asarray(ebdyc.phys)
    g = ebdyc.grid

    gv = f.get_grid_value(ebdyc)
    assert gv.shape == phys.shape
    assert np.all(gv[~phys] == 0.0)
    assert np.allclose(gv[phys], np.asarray(f.grid)[phys])
    gm = f.get_grid_value(ebdyc, masked=True)
    assert bool(gm.mask[~phys].all()) and not bool(gm.mask[phys].any())

    sm = np.asarray(f.get_smoothed_grid_value(ebdyc))
    gs = np.asarray(ebdyc.grid_step)
    assert np.allclose(sm, np.asarray(f.grid) * gs)
    # deep interior: step == 1 so the smoothed value matches F exactly
    deep = gs == 1.0
    assert deep.any()
    assert np.allclose(sm[deep], F(g.xg, g.yg)[deep])
    assert np.all(sm[~phys] == 0.0)
