"""Fourier transforms and spectral operators, TPU-native.

TPU v5e has no complex128 FFT, so all transforms here are built from real
float64 matmuls against precomputed DFT matrices (MXU-friendly at the sizes
this framework needs: boundary/annular transforms are n <= ~4096).  On
backends with complex128 support (CPU) a native ``jnp.fft`` fast path is used
when ``native=True``.

This module replaces the reference's mkl_fft usage and the Nyquist-handling
helpers (reference: ipde/utilities.py:78-124) with one design: transforms are
exposed as *plans* holding the DFT matrices; spectral differentiation is a
precomputed real circulant matrix applied by matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ipde_tpu.ops.cx import Cx, matmul

_HIGH = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jnp.matmul(a, b, precision=_HIGH)


# ---------------------------------------------------------------------------
# host-side matrix builders (numpy, float64)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _dft_mats_np(n: int):
    """Forward DFT matrix F = C + iS with F[k, j] = exp(-2i pi k j / n)."""
    kj = np.outer(np.arange(n), np.arange(n)) % n
    ang = -2.0 * np.pi * kj / n
    return np.cos(ang), np.sin(ang)


@functools.lru_cache(maxsize=64)
def _rdft_mats_np(n: int):
    """Real-input DFT: rows k = 0..n//2 of the DFT matrix."""
    nk = n // 2 + 1
    kj = np.outer(np.arange(nk), np.arange(n)) % n
    ang = -2.0 * np.pi * kj / n
    return np.cos(ang), np.sin(ang)


@functools.lru_cache(maxsize=64)
def _irdft_mats_np(n: int):
    """Inverse of the real DFT: maps nk=n//2+1 complex coeffs -> n reals.

    x_j = (1/n) sum_k w_k [Re F_k cos(2 pi k j/n) - Im F_k sin(2 pi k j/n)]
    with w_k = 2 except w_0 = 1 and (n even) w_{n/2} = 1.
    """
    nk = n // 2 + 1
    w = np.full(nk, 2.0)
    w[0] = 1.0
    if n % 2 == 0:
        w[-1] = 1.0
    jk = np.outer(np.arange(n), np.arange(nk))
    ang = 2.0 * np.pi * jk / n
    cr = np.cos(ang) * w / n
    ci = -np.sin(ang) * w / n
    return cr, ci


def rfftfreq_np(n: int, h: float = 1.0) -> np.ndarray:
    return np.fft.rfftfreq(n, h)


def fftfreq_np(n: int, h: float = 1.0) -> np.ndarray:
    return np.fft.fftfreq(n, h)


@functools.lru_cache(maxsize=64)
def spectral_diff_matrix_np(n: int, order: int = 1, length: float = 2.0 * np.pi):
    """Real n x n Fourier spectral differentiation matrix on a periodic grid.

    Built exactly as D = ifft(diag((ik)^order) fft(I)).real, with the Nyquist
    mode zeroed for odd derivative orders (standard choice; the reference drops
    or zeroes the Nyquist mode throughout, e.g. ipde/utilities.py:78-124).
    """
    k = np.fft.fftfreq(n, 1.0 / n) * (2.0 * np.pi / length)
    ik = (1j * k) ** order
    if order % 2 == 1 and n % 2 == 0:
        ik[n // 2] = 0.0
    D = np.fft.ifft(ik[:, None] * np.fft.fft(np.eye(n), axis=0), axis=0).real
    return D


# ---------------------------------------------------------------------------
# 1D plans
# ---------------------------------------------------------------------------

class FourierPlan1D:
    """Matmul-based 1D DFT along the LAST axis of an array.

    ``rfft`` maps a real array (..., n) to a Cx (..., nk); ``irfft`` inverts.
    ``tderiv`` applies the real spectral differentiation circulant.
    """

    def __init__(self, n: int, length: float = 2.0 * np.pi):
        self.n = n
        self.nk = n // 2 + 1
        self.length = length
        cr, sr = _rdft_mats_np(n)
        self.RC = jnp.asarray(cr.T)   # (n, nk): right-multiply
        self.RS = jnp.asarray(sr.T)
        icr, ici = _irdft_mats_np(n)
        self.IRC = jnp.asarray(icr.T)  # (nk, n)
        self.IRI = jnp.asarray(ici.T)
        self.D1 = jnp.asarray(spectral_diff_matrix_np(n, 1, length).T)
        self.D2 = jnp.asarray(spectral_diff_matrix_np(n, 2, length).T)
        self.k = jnp.asarray(rfftfreq_np(n, length / (2.0 * np.pi * n)))

    def rfft(self, x) -> Cx:
        return Cx(_dot(x, self.RC), _dot(x, self.RS))

    def irfft(self, c: Cx):
        return _dot(c.re, self.IRC) + _dot(c.im, self.IRI)

    def tderiv(self, x):
        """d/dt along the last axis (period ``length``)."""
        return _dot(x, self.D1)

    def tderiv2(self, x):
        return _dot(x, self.D2)


# ---------------------------------------------------------------------------
# 2D plan
# ---------------------------------------------------------------------------

class FourierPlan2D:
    """2D DFT on real (nx, ny) arrays, complex output as Cx.

    fft2(x) = Fx @ x @ Fy^T computed with real f64 matmuls.  ``native=True``
    uses jnp.fft (requires complex128 support; auto-selected on the CPU
    backend where it is both supported and much faster to compile).

    The flagship use is the periodic box solve
    (reference: ipde/solvers/multi_boundary/poisson.py:30-37):
        u = ifft2(fft2(f) * symbol)   with a real, even symbol.
    ``solve_symbol`` fuses that path.
    """

    def __init__(self, nx: int, ny: int, native=None):
        self.nx, self.ny = nx, ny
        if native is None:
            native = jax.default_backend() == "cpu"
        self.native = native
        if not native:
            cx_, sx_ = _dft_mats_np(nx)
            cy_, sy_ = _dft_mats_np(ny)
            self.CxM = jnp.asarray(cx_)      # (nx, nx), left multiply
            self.SxM = jnp.asarray(sx_)
            self.CyT = jnp.asarray(cy_.T)    # (ny, ny), right multiply
            self.SyT = jnp.asarray(sy_.T)

    def fft2(self, x) -> Cx:
        if self.native:
            z = jnp.fft.fft2(x)
            return Cx(jnp.real(z), jnp.imag(z))
        # a = Fx @ x  (complex), then a @ Fy^T
        ar = _dot(self.CxM, x)
        ai = _dot(self.SxM, x)
        return Cx(_dot(ar, self.CyT) - _dot(ai, self.SyT),
                  _dot(ar, self.SyT) + _dot(ai, self.CyT))

    def ifft2_real(self, c: Cx):
        """Real part of the inverse 2D DFT of c."""
        if self.native:
            z = jax.lax.complex(c.re, c.im)
            return jnp.real(jnp.fft.ifft2(z))
        # ifft = conj(F) / n; real(ifft2(c)) for general c:
        # b = conj(Fx) @ c; out = real(b @ conj(Fy)^T) / (nx ny)
        br = _dot(self.CxM, c.re) + _dot(self.SxM, c.im)
        bi = _dot(self.CxM, c.im) - _dot(self.SxM, c.re)
        out = _dot(br, self.CyT) + _dot(bi, self.SyT)
        return out / (self.nx * self.ny)

    def solve_symbol(self, f, symbol):
        """ifft2(fft2(f) * symbol).real for real f and real symbol."""
        c = self.fft2(f)
        return self.ifft2_real(Cx(c.re * symbol, c.im * symbol))

    def deriv_x(self, f, kx):
        """Spectral x-derivative of real f; kx is fftfreq column (nx, 1)."""
        c = self.fft2(f)
        return self.ifft2_real(Cx(-c.im * kx, c.re * kx))

    def deriv_y(self, f, ky):
        c = self.fft2(f)
        return self.ifft2_real(Cx(-c.im * ky, c.re * ky))


class SimpleFourierFilter:
    """Fourier-space filter on periodic 1D data (reference: ipde/utilities.py:126-162)."""

    def __init__(self, n: int, filter_type: str = "fraction", **kwargs):
        self.plan = FourierPlan1D(n)
        k = np.abs(rfftfreq_np(n, 1.0 / n))
        max_k = k.max()
        if filter_type == "fraction":
            filt = np.ones_like(k)
            filt[k > max_k * kwargs["fraction"]] = 0.0
        elif filter_type == "rule 36":
            p = kwargs.get("power", 36)
            filt = np.exp(-p * (k / max_k) ** p)
        else:
            raise ValueError(f"unknown filter type {filter_type}")
        self.filt = jnp.asarray(filt)

    def __call__(self, f):
        c = self.plan.rfft(f)
        return self.plan.irfft(Cx(c.re * self.filt, c.im * self.filt))
