"""Stratified source subsampling of dense radial applies (ops/stratified):
the subsampled apply must match the full dense apply to ~1e-12 for a
band-limited density, and must actually subsample on realistic geometry."""

import numpy as np

from ipde_tpu.geometry.curve import star
from ipde_tpu.geometry.embedded_boundary import EmbeddedBoundary
from ipde_tpu.ops import kernels
from ipde_tpu.ops import stokes_kernels as sk
from ipde_tpu.ops.stratified import StratifiedRadialApply


def _setup(nb=200, M=12):
    bdy = star(nb, a=0.2, f=5)
    bh = min(bdy.min_h(), 0.6 / np.abs(bdy.curvature).max() / M)
    ebdy = EmbeddedBoundary(bdy, True, M, bh, qfs_tolerance=1e-14)
    src = ebdy.qfs_source_for_side("interface", interior_eval=False)
    return ebdy, src


def test_stratified_matches_dense_laplace():
    ebdy, src = _setup()
    plan = StratifiedRadialApply(src, ebdy.radial_x, ebdy.radial_y,
                                 k_density=ebdy.bdy.N // 2)
    # realistic smooth band-limited density
    t = 2 * np.pi * np.arange(src.N) / src.N
    sigma = np.sin(3 * t) + 0.3 * np.cos(7 * t)
    import jax.numpy as jnp
    sig = jnp.asarray(sigma)
    w = jnp.asarray(np.asarray(src.weights))
    full = kernels.laplace_slp_apply(
        jnp.asarray(src.x), jnp.asarray(src.y), sig * w,
        jnp.asarray(ebdy.radial_x.ravel()),
        jnp.asarray(ebdy.radial_y.ravel())).reshape(ebdy.radial_shape)
    sub = plan.apply(lambda sx, sy, ws, f, tx, ty:
                     kernels.laplace_slp_apply(sx, sy, sig[::f] * ws, tx, ty))
    scale = float(np.abs(np.asarray(full)).max())
    err = float(np.abs(np.asarray(sub) - np.asarray(full)).max()) / scale
    assert err < 5e-13, err


def test_qfs_source_spectrum_clean():
    """The QFS source-curve coordinates must have spectrally-decaying
    (noise-free) spectra: complex_offset amplifies fft-roundoff junk by
    e^{a k} unless thresholded (measured 5e-12 near-Nyquist tails breaking
    the subsampled radial quadrature before the fix in curve.py)."""
    _, src = _setup(nb=800, M=8)
    xh = np.abs(np.fft.fft(np.asarray(src.x))) / src.N
    top = xh[int(0.9 * src.N // 2):src.N // 2]
    assert top.max() < 1e-14 * xh.max(), top.max()


def test_stratified_coarsens_and_stays_accurate_at_scale():
    """At bench-like aspect ratios (annulus width << curve scale) far rows
    must coarsen (stride >= 2) while matching the dense apply."""
    ebdy, src = _setup(nb=800, M=8)
    plan = StratifiedRadialApply(src, ebdy.radial_x, ebdy.radial_y,
                                 k_density=ebdy.bdy.N // 2)
    assert plan.strides.max() >= 2, plan.strides
    assert plan.pair_fraction < 0.95, plan.pair_fraction
    t = 2 * np.pi * np.arange(src.N) / src.N
    # include a HIGH mode: QFS effective densities carry large near-Nyquist
    # content by design, the subsampling must stay exact for it
    kc = ebdy.bdy.N // 2
    sigma = (np.sin(3 * t) + 0.3 * np.cos(7 * t)
             + 1e3 * np.cos((kc - 2) * t))
    import jax.numpy as jnp
    sig = jnp.asarray(sigma)
    w = jnp.asarray(np.asarray(src.weights))
    full = kernels.laplace_slp_apply(
        jnp.asarray(src.x), jnp.asarray(src.y), sig * w,
        jnp.asarray(ebdy.radial_x.ravel()),
        jnp.asarray(ebdy.radial_y.ravel())).reshape(ebdy.radial_shape)
    sub = plan.apply(lambda sx, sy, ws, f, tx, ty:
                     kernels.laplace_slp_apply(sx, sy, sig[::f] * ws, tx, ty))
    scale = float(np.abs(np.asarray(full)).max())
    err = float(np.abs(np.asarray(sub) - np.asarray(full)).max()) / scale
    # the probe's near-Nyquist mode has 1e3 amplitude: 2e-11 here is
    # 2e-14 per unit density amplitude
    assert err < 2e-11, err


def test_stratified_matches_dense_stokes():
    ebdy, src = _setup()
    plan = StratifiedRadialApply(src, ebdy.radial_x, ebdy.radial_y,
                                 k_density=ebdy.bdy.N // 2)
    t = 2 * np.pi * np.arange(src.N) / src.N
    fx = np.cos(2 * t) + 0.2 * np.sin(5 * t)
    fy = np.sin(4 * t) - 0.1 * np.cos(3 * t)
    import jax.numpy as jnp
    fxd, fyd = jnp.asarray(fx), jnp.asarray(fy)
    w = jnp.asarray(np.asarray(src.weights))
    tx = jnp.asarray(ebdy.radial_x.ravel())
    ty = jnp.asarray(ebdy.radial_y.ravel())
    full = sk.stokes_slp_apply(jnp.asarray(src.x), jnp.asarray(src.y),
                               fxd * w, fyd * w, tx, ty)
    sub = plan.apply(
        lambda sx, sy, ws, f, txg, tyg: sk.stokes_slp_apply(
            sx, sy, fxd[::f] * ws, fyd[::f] * ws, txg, tyg), n_out=3)
    for a, b in zip(sub, full):
        b = np.asarray(b).reshape(ebdy.radial_shape)
        scale = max(float(np.abs(b).max()), 1e-30)
        err = float(np.abs(np.asarray(a) - b).max()) / scale
        assert err < 5e-13, err
