"""Window-derivative interface gradients (interface_values_and_grads):
must match the ik-mode interpolation route to near-roundoff on smooth
solver-like fields (the added error is the ES window's ~1e-14 kernel
error amplified by the data bandwidth)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ipde_tpu.geometry.collection import EmbeddedBoundaryCollection
from ipde_tpu.geometry.curve import star
from ipde_tpu.geometry.embedded_boundary import EmbeddedBoundary
from ipde_tpu.ops.cx import Cx


def _setup(nb=200, M=10):
    bdy = star(nb, a=0.2, f=3)
    bh = min(bdy.min_h(), 0.6 / np.abs(bdy.curvature).max() / M)
    ebdy = EmbeddedBoundary(bdy, True, M, bh, qfs_tolerance=1e-12)
    ebdyc = EmbeddedBoundaryCollection([ebdy])
    ebdyc.generate_grid(bh)
    return ebdyc


def test_ifc_grad_matches_ik_route(monkeypatch):
    ebdyc = _setup()
    g = ebdyc.grid
    # BOX-PERIODIC test field, built in the grid's own [0, 2pi) coords
    sx = 2 * np.pi / g.x_period
    sy = 2 * np.pi / g.y_period
    TX = lambda x: (x - g.x_bounds[0]) * sx
    TY = lambda y: (y - g.y_bounds[0]) * sy
    F = lambda x, y: (np.sin(2 * TX(x)) * np.cos(3 * TY(y))
                      + 0.5 * np.cos(TX(x) + 2 * TY(y)))
    FX = lambda x, y: sx * (2 * np.cos(2 * TX(x)) * np.cos(3 * TY(y))
                            - 0.5 * np.sin(TX(x) + 2 * TY(y)))
    FY = lambda x, y: sy * (-3 * np.sin(2 * TX(x)) * np.sin(3 * TY(y))
                            - np.sin(TX(x) + 2 * TY(y)))
    f = F(g.xg, g.yg)
    c = ebdyc.fft_plan.fft2(jnp.asarray(f))
    stack = Cx(c.re[None], c.im[None])

    monkeypatch.setenv("IPDE_IFC_GRAD", "1")
    v1, gx1, gy1 = [np.asarray(a) for a in
                    ebdyc.interface_values_and_grads(stack)]
    monkeypatch.setenv("IPDE_IFC_GRAD", "0")
    v0, gx0, gy0 = [np.asarray(a) for a in
                    ebdyc.interface_values_and_grads(stack)]
    # truth at the interface points
    ix, iy = ebdyc.all_interface_x, ebdyc.all_interface_y
    ft, fx, fy = F(ix, iy), FX(ix, iy), FY(ix, iy)
    for got, ref, truth, tol in ((v1, v0, ft, 1e-12),
                                 (gx1, gx0, fx, 1e-10),
                                 (gy1, gy0, fy, 1e-10)):
        assert np.abs(got[0] - truth).max() < tol, \
            np.abs(got[0] - truth).max()
        assert np.abs(got - ref).max() < tol, np.abs(got - ref).max()
