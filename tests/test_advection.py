"""Semi-Lagrangian advection test: rigid rotation (the FE departure map is
exact for linear velocity, so the one-step error isolates the geometry
rebuild + interpolation machinery; reference: ipde/advection/fe_advector.py)."""

import numpy as np

from ipde_tpu.advection.semi_lagrangian import SemiLagrangianAdvector
from ipde_tpu.functions import EmbeddedFunction
from ipde_tpu.geometry.collection import EmbeddedBoundaryCollection
from ipde_tpu.geometry.curve import star
from ipde_tpu.geometry.embedded_boundary import EmbeddedBoundary


def test_fe_advection_rigid_rotation():
    u_f = lambda x, y: -y
    v_f = lambda x, y: x
    f0 = lambda x, y: np.exp(np.sin(x)) * np.cos(y + 0.3)
    nb, M = 200, 10
    bdy = star(nb, a=0.1, f=3)
    bh = min(bdy.min_h(), 0.6 / np.abs(bdy.curvature).max() / M)
    ebdy = EmbeddedBoundary(bdy, True, M, bh, qfs_tolerance=1e-12)
    ebdyc = EmbeddedBoundaryCollection([ebdy])
    ebdyc.generate_grid(bh)
    u = EmbeddedFunction.from_function(ebdyc, u_f)
    v = EmbeddedFunction.from_function(ebdyc, v_f)
    f = EmbeddedFunction.from_function(ebdyc, f0)
    dt = 0.05
    adv = SemiLagrangianAdvector(ebdyc, u, v)
    new_ebdyc = adv.generate(dt)
    fn = adv(f)
    den = 1 + dt * dt
    fex = lambda x, y: f0((x + dt * y) / den, (y - dt * x) / den)
    fa = EmbeddedFunction.from_function(new_ebdyc, fex)
    err = abs(fn - fa)
    ge = float(np.asarray(err.grid)[np.asarray(new_ebdyc.phys)].max())
    re = max(float(np.abs(np.asarray(r)).max()) for r in err.radials)
    # error floor = rolloff resolvability at this coarse resolution
    assert max(ge, re) < 2e-6, f"advection err {max(ge, re):.2e}"
    # boundary moved exactly with the flow (then reparametrized)
    nb_curve = new_ebdyc.ebdys[0].bdy
    scale = np.hypot(nb_curve.x, nb_curve.y).max() / np.hypot(bdy.x, bdy.y).max()
    np.testing.assert_allclose(scale, np.sqrt(den), atol=1e-8)


def test_bdf2_advection_order():
    """BDF2 advector converges at second order in dt (reference analogue:
    examples/semi_lagrangian_experiments accuracy-order studies)."""
    from ipde_tpu.advection.semi_lagrangian import SecondOrderAdvector

    u_f = lambda x, y: -y
    v_f = lambda x, y: x
    f0 = lambda x, y: np.exp(np.sin(x)) * np.cos(y + 0.3)

    def exact(x, y, T):
        c, s = np.cos(T), np.sin(T)
        return f0(c * x + s * y, -s * x + c * y)

    def run(dt, steps, order2):
        nb, M = 200, 10
        bdy = star(nb, a=0.1, f=3)
        bh = min(bdy.min_h(), 0.6 / np.abs(bdy.curvature).max() / M)
        ebdy = EmbeddedBoundary(bdy, True, M, bh, qfs_tolerance=1e-12)
        ebdyc = EmbeddedBoundaryCollection([ebdy])
        ebdyc.generate_grid(bh)
        f = EmbeddedFunction.from_function(ebdyc, f0)
        f_prev = adv_prev = None
        T = 0.0
        for _ in range(steps):
            u = EmbeddedFunction.from_function(ebdyc, u_f)
            v = EmbeddedFunction.from_function(ebdyc, v_f)
            if order2 and adv_prev is not None:
                adv = SecondOrderAdvector(ebdyc, u, v, adv_prev)
                new_ebdyc = adv.generate(dt)
                fn = adv.advect_bdf2(f, f_prev)
            else:
                adv = SemiLagrangianAdvector(ebdyc, u, v)
                new_ebdyc = adv.generate(dt)
                fn = adv(f)
            f_prev, adv_prev = f, adv
            f, ebdyc = fn, new_ebdyc
            T += dt
        fa = EmbeddedFunction.from_function(ebdyc,
                                            lambda x, y: exact(x, y, T))
        err = abs(f - fa)
        ge = float(np.asarray(err.grid)[np.asarray(ebdyc.phys)].max())
        re = max(float(np.abs(np.asarray(r)).max()) for r in err.radials)
        return max(ge, re)

    e_coarse = run(0.1, 2, True)
    e_fine = run(0.05, 4, True)
    # observed: 8.7e-3 -> 2.4e-3 -> 6.2e-4 (ratio ~ 3.6-3.9 per halving)
    assert e_fine < e_coarse / 2.8, (e_coarse, e_fine)
    assert e_fine < 5e-3
