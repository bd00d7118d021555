"""PeriodicGridEvaluator vs independent references
(reference capability: the periodic branch of the Ewald grid evaluator,
ipde/grid_evaluators/scalar_grid_evaluator.py:246-264).

Laplace: checked against a from-scratch numpy Ewald sum with a DIFFERENT
splitting parameter (real-space images via scipy exp1 + a small k-lattice
sum + the background constant) -- independent of the evaluator's FFT/patch
machinery.  Yukawa: checked against the free-space kernel summed over
periodic images (exact to e^{-kappa L} ~ 1e-11 at kappa = 4)."""

import numpy as np

from ipde_tpu.geometry.grid import Grid
from ipde_tpu.ops.grid_eval import PeriodicGridEvaluator


def _sources(rng, n=24, neutral=True):
    sx = rng.uniform(1.0, 5.0, n)
    sy = rng.uniform(1.2, 5.5, n)
    q = rng.standard_normal(n)
    if neutral:
        q -= q.mean()
    return sx, sy, q


def _ewald_ref_laplace(tx, ty, sx, sy, q, L, eta=1.0, nk=14, nimg=3):
    """Zero-mean periodic Laplace potential, independent Ewald sum."""
    from scipy.special import exp1
    A = L * L
    out = np.zeros_like(tx)
    # real-space screened part over images
    for mx in range(-nimg, nimg + 1):
        for my in range(-nimg, nimg + 1):
            dx = tx[:, None] - sx[None, :] + mx * L
            dy = ty[:, None] - sy[None, :] + my * L
            r2 = dx * dx + dy * dy
            out += (exp1(eta**2 * r2) / (4 * np.pi)) @ q
    # k-space smooth part over the integer lattice (L = 2 pi -> k integers)
    ks = np.arange(-nk, nk + 1) * (2 * np.pi / L)
    for kx in ks:
        for ky in ks:
            k2 = kx * kx + ky * ky
            if k2 == 0:
                continue
            rho = (q * np.exp(-1j * (kx * sx + ky * sy))).sum()
            out += (np.exp(-k2 / (4 * eta**2)) / k2 / A
                    * (rho * np.exp(1j * (kx * tx + ky * ty)))).real
    # neutralizing-background constant
    out -= q.sum() / (4 * eta**2 * A)
    return out


def test_periodic_laplace_vs_independent_ewald():
    rng = np.random.default_rng(0)
    L = 2 * np.pi
    grid = Grid((0.0, L), 128, (0.0, L), 128)
    # NON-neutral charges: exercises the background/mean term too
    sx, sy, q = _sources(rng, neutral=False)
    ev = PeriodicGridEvaluator(grid, sx, sy, kernel="laplace")
    got = np.asarray(ev(np.asarray(q)))
    # spot-check a row of grid points away from all sources
    ii = np.arange(0, 128, 11)
    jj = np.arange(3, 128, 11)[: ii.size]
    ii = ii[: jj.size]
    tx, ty = grid.xv[ii], grid.yv[jj]
    d2 = ((tx[:, None] - sx) ** 2 + (ty[:, None] - sy) ** 2).min(1)
    keep = d2 > (6 * grid.xh) ** 2
    want = _ewald_ref_laplace(tx[keep], ty[keep], sx, sy, q, L)
    err = np.abs(got[ii[keep], jj[keep]] - want).max()
    assert err < 1e-9, err


def test_periodic_yukawa_vs_image_sum():
    from scipy.special import k0 as K0
    rng = np.random.default_rng(1)
    L = 2 * np.pi
    kappa = 4.0
    grid = Grid((0.0, L), 128, (0.0, L), 128)
    sx, sy, q = _sources(rng, neutral=False)
    ev = PeriodicGridEvaluator(grid, sx, sy, kernel="yukawa", kappa=kappa)
    got = np.asarray(ev(np.asarray(q)))
    ii = np.arange(0, 128, 11)
    jj = np.arange(3, 128, 11)[: ii.size]
    ii = ii[: jj.size]
    tx, ty = grid.xv[ii], grid.yv[jj]
    d2 = ((tx[:, None] - sx) ** 2 + (ty[:, None] - sy) ** 2).min(1)
    keep = d2 > (6 * grid.xh) ** 2
    want = np.zeros(keep.sum())
    for mx in range(-2, 3):
        for my in range(-2, 3):
            dx = tx[keep][:, None] - sx[None, :] + mx * L
            dy = ty[keep][:, None] - sy[None, :] + my * L
            want += (K0(kappa * np.hypot(dx, dy)) / (2 * np.pi)) @ q
    err = np.abs(got[ii[keep], jj[keep]] - want).max()
    assert err < 1e-9, err
