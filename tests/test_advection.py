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
