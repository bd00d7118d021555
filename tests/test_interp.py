"""Unit tests for the fixed-target spectral interpolators (the framework's
finufft type-2 replacement; reference call sites ipde/embedded_boundary.py:419-434,
ipde/ebdy_collection.py:604-647).  Every class must agree with the direct
trigonometric sum to near roundoff."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ipde_tpu.ops.cx import Cx
from ipde_tpu.ops.interp import (ExactInterp2D, HybridInterp2D,
                                 PeriodicInterpolator2D, make_interpolator,
                                 nufft2d2_exact)


def _smooth_field(rng, nx, ny):
    f = rng.standard_normal((nx, ny))
    kx = np.fft.fftfreq(nx, 1 / nx)
    ky = np.fft.fftfreq(ny, 1 / ny)
    fh = np.fft.fft2(f) * np.exp(
        -0.05 * (np.abs(kx)[:, None] ** 2 + np.abs(ky)[None, :] ** 2))
    return np.real(np.fft.ifft2(fh))


@pytest.mark.parametrize("cls,nx,ny,xo", [
    (PeriodicInterpolator2D, 40, 300, 0.0),
    (PeriodicInterpolator2D, 40, 300, np.pi / 40),
    (HybridInterp2D, 40, 300, np.pi / 40),
    (HybridInterp2D, 48, 257, 0.0),       # odd ny, direct-DFT fine axis
    (ExactInterp2D, 40, 300, np.pi / 40),
])
def test_interp_matches_exact(cls, nx, ny, xo):
    rng = np.random.default_rng(3)
    f = _smooth_field(rng, nx, ny)
    T = 1500
    tx = rng.uniform(0, 2 * np.pi, T)
    ty = rng.uniform(0, 2 * np.pi, T)
    c = Cx(jnp.asarray(np.real(np.fft.fft2(f))),
           jnp.asarray(np.imag(np.fft.fft2(f))))
    exact = nufft2d2_exact(c, tx - xo, ty)
    interp = cls(nx, ny, tx, ty, x_offset=xo)
    scale = float(jnp.max(jnp.abs(exact)))
    err = float(jnp.max(jnp.abs(interp.from_modes(c) - exact))) / scale
    assert err < 5e-13
    # grid-values entry point
    err2 = float(jnp.max(jnp.abs(interp(jnp.asarray(f)) - exact))) / scale
    assert err2 < 5e-13
    # batched modes
    cb = Cx(jnp.stack([c.re, 2 * c.re]), jnp.stack([c.im, 2 * c.im]))
    vb = interp.from_modes(cb)
    assert float(jnp.max(jnp.abs(vb[1] - 2 * exact))) / scale < 1e-12


def test_pad_modes_half_matches_symmetric_upsampling():
    """irfft2_real(_pad_modes_half(c)) must equal the canonical symmetric
    zero-pad upsampling (Nyquist lines split half/half) exactly, even for
    rough fields with full Nyquist content."""
    from ipde_tpu.ops.fourier import FourierPlan2D
    from ipde_tpu.ops.interp import _pad_modes_half
    rng = np.random.default_rng(11)
    for nx, ny, nfx, nfy in [(16, 12, 40, 30), (16, 13, 40, 33)]:
        f = rng.standard_normal((nx, ny))
        F = np.fft.fft2(f)
        c = Cx(jnp.asarray(F.real), jnp.asarray(F.imag))
        plan = FourierPlan2D(nfx, nfy, native=False)
        half = plan.irfft2_real(_pad_modes_half(c, nx, ny, nfx, nfy))
        P = np.zeros((nfx, nfy), complex)
        fx = np.fft.fftfreq(nx, 1 / nx).astype(int)
        fy = np.fft.fftfreq(ny, 1 / ny).astype(int)
        for i, ki in enumerate(fx):
            for j, kj in enumerate(fy):
                ti = ([ki % nfx] if abs(ki) != nx // 2 or nx % 2
                      else [ki % nfx, (-ki) % nfx])
                tj = ([kj % nfy] if abs(kj) != ny // 2 or ny % 2
                      else [kj % nfy, (-kj) % nfy])
                for a in ti:
                    for b in tj:
                        P[a, b] += F[i, j] / (len(ti) * len(tj))
        oracle = np.fft.ifft2(P).real
        assert np.abs(np.asarray(half) - oracle).max() < 1e-13


def test_low_upsampling_window_matches_exact():
    """sigma=1.25 / w=24 (the few-targets-on-big-grid configuration) must
    hold the same ~1e-14 accuracy as sigma=2 / w=16."""
    rng = np.random.default_rng(7)
    nx, ny = 256, 288
    f = _smooth_field(rng, nx, ny)
    T = 700
    tx = rng.uniform(0, 2 * np.pi, T)
    ty = rng.uniform(0, 2 * np.pi, T)
    c = Cx(jnp.asarray(np.real(np.fft.fft2(f))),
           jnp.asarray(np.imag(np.fft.fft2(f))))
    exact = nufft2d2_exact(c, tx, ty)
    p = PeriodicInterpolator2D(nx, ny, tx, ty, sigma=1.25, w=24)
    err = float(jnp.max(jnp.abs(p.from_modes(c) - exact)))
    assert err / float(jnp.max(jnp.abs(exact))) < 5e-13
    # the chooser picks this configuration for few targets on a big grid
    m = make_interpolator(nx, ny, tx, ty, exact_max_modes=0,
                          exact_max_targets=0)
    assert isinstance(m, PeriodicInterpolator2D) and m.w == 24


def test_make_interpolator_picks_hybrid_for_radial_shapes():
    rng = np.random.default_rng(5)
    nx, ny = 40, 2048       # 2M x nb beyond the exact-path mode budget
    tx = rng.uniform(0, 2 * np.pi, 9000)
    ty = rng.uniform(0, 2 * np.pi, 9000)
    interp = make_interpolator(nx, ny, tx, ty, x_offset=np.pi / nx)
    assert isinstance(interp, HybridInterp2D)
    f = _smooth_field(rng, nx, ny)
    c = Cx(jnp.asarray(np.real(np.fft.fft2(f))),
           jnp.asarray(np.imag(np.fft.fft2(f))))
    exact = nufft2d2_exact(c, tx - np.pi / nx, ty)
    err = float(jnp.max(jnp.abs(interp.from_modes(c) - exact)))
    assert err / float(jnp.max(jnp.abs(exact))) < 5e-13
