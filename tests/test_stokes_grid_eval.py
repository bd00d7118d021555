"""Stokeslet free-space FFT grid evaluator vs the dense Oseen-tensor sum.

Reference capability analogue: SFMM Stokes velocity+pressure evaluation at
ipde/solvers/internals/stokes.py:26-35 (here: Vico-Greengard truncated
biharmonic symbol + Hasimoto screen + radial-table local corrections).
"""

import numpy as np
import jax.numpy as jnp

from ipde_tpu.geometry.grid import Grid
from ipde_tpu.ops.grid_eval import (FreespaceGridEvaluator,
                                    StokesFreespaceGridEvaluator,
                                    biharmonic_truncated_symbol,
                                    _composite_gl)


def _dense(grid, sx, sy, fx, fy):
    dx = grid.xg[..., None] - sx
    dy = grid.yg[..., None] - sy
    r = np.maximum(np.hypot(dx, dy), 1e-300)
    r2 = r ** 2
    Gxx = (-np.log(r) + dx ** 2 / r2) / (4 * np.pi)
    Gxy = dx * dy / (4 * np.pi * r2)
    Gyy = (-np.log(r) + dy ** 2 / r2) / (4 * np.pi)
    u = Gxx @ fx + Gxy @ fy
    v = Gxy @ fx + Gyy @ fy
    p = (dx / (2 * np.pi * r2)) @ fx + (dy / (2 * np.pi * r2)) @ fy
    return u, v, p


def test_biharmonic_symbol_quadrature():
    from scipy.special import j0
    L = 2.7
    r, w = _composite_gl(0.0, L, 400, 16)
    for k in [0.0, 0.5, 3.0, 17.0]:
        direct = np.sum(r ** 3 * (np.log(r) - 1.0) / 4.0 * j0(k * r) * w)
        form = biharmonic_truncated_symbol(np.array([k]), L)[0]
        assert abs(direct - form) < 1e-13


def test_stokes_grid_evaluator_accuracy():
    rng = np.random.default_rng(3)
    N = 128
    grid = Grid([0.0, 2.0], N, [0.0, 2.0], N)
    S = 60
    th = np.linspace(0, 2 * np.pi, S, endpoint=False)
    sx = 1.0 + 0.55 * np.cos(th) + 0.003 * rng.standard_normal(S)
    sy = 1.0 + 0.55 * np.sin(th) + 0.003 * rng.standard_normal(S)
    fx = rng.standard_normal(S)
    fy = rng.standard_normal(S)
    sev = StokesFreespaceGridEvaluator(grid, sx, sy)
    u, v, p = [np.asarray(a) for a in sev(jnp.asarray(fx), jnp.asarray(fy))]
    ud, vd, pd = _dense(grid, sx, sy, fx, fy)
    assert np.abs(u - ud).max() < 1e-10
    assert np.abs(v - vd).max() < 1e-10
    assert np.abs(p - pd).max() < 1e-11


def test_scalar_grid_evaluator_radial_table_regression():
    """The radial-table setup path must keep the scalar evaluator exact."""
    rng = np.random.default_rng(5)
    N = 96
    grid = Grid([0.0, 2.0], N, [0.0, 2.0], N)
    S = 40
    th = np.linspace(0, 2 * np.pi, S, endpoint=False)
    # keep sources OFF exact grid nodes: the dense reference sum is
    # singular at coincident points (the evaluator guards them to zero)
    sx = 1.0 + 0.5 * np.cos(th) + 0.003 * rng.standard_normal(S)
    sy = 1.0 + 0.5 * np.sin(th) + 0.003 * rng.standard_normal(S)
    q = rng.standard_normal(S)
    ev = FreespaceGridEvaluator(grid, sx, sy, kernel="laplace")
    phi = np.asarray(ev(jnp.asarray(q)))
    dx = grid.xg[..., None] - sx
    dy = grid.yg[..., None] - sy
    r = np.maximum(np.hypot(dx, dy), 1e-300)
    phid = (-np.log(r) / (2 * np.pi)) @ q
    assert np.abs(phi - phid).max() < 1e-12
    evy = FreespaceGridEvaluator(grid, sx, sy, kernel="yukawa", kappa=3.0)
    phiy = np.asarray(evy(jnp.asarray(q)))
    from scipy.special import k0
    phidy = (k0(3.0 * r) / (2 * np.pi)) @ q
    assert np.abs(phiy - phidy).max() < 1e-12
