"""Serialization round trip (reference: examples/save_and_load.py +
load_test.py: save dict -> reload -> operators still work)."""

import numpy as np

from ipde_tpu.functions import EmbeddedFunction
from ipde_tpu.geometry.collection import (EmbeddedBoundaryCollection,
                                          load_collection)
from ipde_tpu.geometry.curve import star
from ipde_tpu.geometry.embedded_boundary import EmbeddedBoundary


def test_save_load_roundtrip():
    f0 = lambda x, y: np.exp(np.sin(x)) * np.cos(2 * y)
    bdy = star(200, a=0.1, f=3)
    M = 10
    bh = min(bdy.min_h(), 0.6 / np.abs(bdy.curvature).max() / M)
    ebdy = EmbeddedBoundary(bdy, True, M, bh)
    ebdyc = EmbeddedBoundaryCollection([ebdy])
    grid = ebdyc.generate_grid(bh)
    f = EmbeddedFunction.from_function(ebdyc, f0)

    d = ebdyc.save()
    fd = f.save()

    ebdyc2 = load_collection(d)
    ebdyc2.register_grid(grid)
    f2 = EmbeddedFunction.load(fd)
    # geometry reproduced exactly
    np.testing.assert_allclose(ebdyc2.ebdys[0].radial_x, ebdy.radial_x,
                               atol=1e-14)
    np.testing.assert_array_equal(ebdyc2.phys, ebdyc.phys)
    # data round trip
    np.testing.assert_allclose(np.asarray(f2.grid), np.asarray(f.grid))
    # calculus still works on the reloaded geometry
    fx, fy = ebdyc2.gradient(f2)
    gx_exact = np.cos(ebdy.radial_x) * np.exp(np.sin(ebdy.radial_x)) \
        * np.cos(2 * ebdy.radial_y)
    err = np.abs(np.asarray(fx.radials[0]) - gx_exact).max()
    assert err < 1e-7, f"gradient after reload err {err:.2e}"
