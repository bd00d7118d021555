"""Spectral interpolation from periodic grids to fixed scattered targets.

This is the framework's NUFFT replacement (the reference calls finufft's
type-2 transform everywhere: radial->grid, grid->interface, grid->points;
SURVEY.md section 2.2, finufft row).  TPU-native design: target sets are
geometry-static, so we precompute (host, numpy) the window indices and
weights of an exponential-of-semicircle (ES) kernel interpolation; the
device-side apply is
    modes -> deconvolve -> zero-pad -> inverse FFT (f64 matmul DFT) ->
    one flat gather of (T, w, w) patches -> weighted reduction,
which is a handful of MXU matmuls plus a single big gather.

Accuracy: sigma=2 upsampling with w=16 gives ~1e-14 in f64 (validated in
tests against direct trigonometric evaluation).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ipde_tpu.ops.cx import Cx
from ipde_tpu.ops.fourier import FourierPlan2D

_HIGH = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# ES kernel (host)
# ---------------------------------------------------------------------------

def _es_kernel(z, beta):
    """phi(z) = exp(beta (sqrt(1-z^2) - 1)) on |z|<=1, else 0."""
    z = np.asarray(z)
    out = np.zeros_like(z)
    good = np.abs(z) < 1.0
    out[good] = np.exp(beta * (np.sqrt(1.0 - z[good] ** 2) - 1.0))
    return out


def _es_kernel_deriv(z, beta):
    """phi'(z) = -beta z / sqrt(1-z^2) * phi(z) on |z|<1, else 0 (the
    exponential kills the sqrt singularity)."""
    z = np.asarray(z)
    out = np.zeros_like(z)
    good = np.abs(z) < 1.0 - 1e-12
    s = np.sqrt(1.0 - z[good] ** 2)
    out[good] = -beta * z[good] / s * np.exp(beta * (s - 1.0))
    return out


@functools.lru_cache(maxsize=32)
def _es_kernel_ft_table(w: int, beta: float, half_width: float, nk: int):
    """Continuous FT phi_hat(k) = int_{-a}^{a} phi(y/a) e^{-iky} dy for
    k = 0..nk-1 (integer wavenumbers), a = half_width. Gauss-Legendre."""
    a = half_width
    xq, wq = np.polynomial.legendre.leggauss(max(200, 4 * w))
    y = a * xq
    vals = _es_kernel(xq, beta) * (a * wq)
    k = np.arange(nk)
    # even kernel -> cosine transform
    return (np.cos(np.outer(k, y)) * vals).sum(axis=1)


class NufftPlan(NamedTuple):
    """Device-side plan for fixed-target type-2 interpolation."""
    flat_idx: jax.Array    # (T, w*w) int32 indices into the fine grid raveled
    wx: jax.Array          # (T, w)
    wy: jax.Array          # (T, w)
    wxd: jax.Array         # (T, w) d/dt of wx in the plan's [0, 2pi) units
    wyd: jax.Array         # (T, w)
    deconv: jax.Array      # (nx, ny) real deconvolution of the mode array
    nx: int
    ny: int
    nfx: int
    nfy: int


def _es_beta(w: int, sigma: float) -> float:
    """ES shape parameter: finufft's rule beta = 2.30 w at sigma = 2,
    scaled like pi w (1 - 1/(2 sigma)) for other upsampling factors."""
    return 2.30 * w * (1.0 - 0.5 / sigma) / 0.75


def build_nufft_plan(nx: int, ny: int, tx: np.ndarray, ty: np.ndarray,
                     sigma: float = 2, w: int = 16,
                     x_offset: float = 0.0, y_offset: float = 0.0) -> NufftPlan:
    """Precompute interpolation structure for targets (tx, ty) in [0, 2pi)^2.

    The mode array to be interpolated has shape (nx, ny) in fftfreq order.
    x_offset/y_offset shift the fine grid's origin (used for half-node-offset
    Chebyshev reflections in the radial interpolation).
    """
    tx = np.mod(np.asarray(tx, np.float64).ravel() - x_offset, 2 * np.pi)
    ty = np.mod(np.asarray(ty, np.float64).ravel() - y_offset, 2 * np.pi)
    nfx, nfy = int(np.ceil(sigma * nx)), int(np.ceil(sigma * ny))
    hx, hy = 2 * np.pi / nfx, 2 * np.pi / nfy
    beta = _es_beta(w, sigma)
    half_w = w / 2.0
    # nearest fine-grid index and window start
    jx = np.floor(tx / hx).astype(np.int64)
    jy = np.floor(ty / hy).astype(np.int64)
    ox = jx - (w // 2 - 1)   # window covers [ox, ox + w)
    oy = jy - (w // 2 - 1)
    px = (ox[:, None] + np.arange(w)[None, :])
    py = (oy[:, None] + np.arange(w)[None, :])
    # kernel arguments: distance in fine-grid units / half-width
    zx = (tx[:, None] / hx - px) / half_w
    zy = (ty[:, None] / hy - py) / half_w
    wx = _es_kernel(zx, beta)
    wy = _es_kernel(zy, beta)
    # window derivatives in the plan's t-units (dz/dt = 1/(h half_w)):
    # differentiating the interpolant u(t) = sum fine_j wx wy is exact for
    # the band-limited approximant (see from_modes_grad)
    wxd = _es_kernel_deriv(zx, beta) / (hx * half_w)
    wyd = _es_kernel_deriv(zy, beta) / (hy * half_w)
    pxm = np.mod(px, nfx)
    pym = np.mod(py, nfy)
    flat = (pxm[:, :, None] * nfy + pym[:, None, :]).reshape(tx.size, w * w)
    # deconvolution: divide mode (kx, ky) by phat(kx) phat(ky) / (hx hy)
    kx = np.abs(np.fft.fftfreq(nx, 1.0 / nx)).astype(int)
    ky = np.abs(np.fft.fftfreq(ny, 1.0 / ny)).astype(int)
    phx = _es_kernel_ft_table(w, beta, half_w * hx, int(kx.max()) + 1)
    phy = _es_kernel_ft_table(w, beta, half_w * hy, int(ky.max()) + 1)
    deconv = (hx / phx[kx])[:, None] * (hy / phy[ky])[None, :]
    # fold target phase offsets into deconv?  offsets are handled by shifting
    # targets; the fine grid starts at x_offset, so modes pick up a phase.
    return NufftPlan(
        flat_idx=jnp.asarray(flat, jnp.int32),
        wx=jnp.asarray(wx), wy=jnp.asarray(wy),
        wxd=jnp.asarray(wxd), wyd=jnp.asarray(wyd),
        deconv=jnp.asarray(deconv), nx=nx, ny=ny, nfx=nfx, nfy=nfy,
    )


def _pad_modes_half(c: Cx, nx, ny, nfx, nfy) -> Cx:
    """Zero-pad fft2 modes of a REAL (nx, ny) field to the HALF spectrum
    (nfx//2 + 1, nfy) of the fine grid (even nx only).

    Satisfies irfft2_real(this) == Re(ifft2(full zero-padding)): taking
    the real part Hermitian-symmetrizes the full padded array, which
    SPLITS each input Nyquist line (row nx/2, and column ny/2 when ny is
    even) half-and-half between +/- placements -- exact for real-field
    inputs, whose Nyquist lines are self-conjugate."""
    hx, hy = nx // 2, ny // 2

    def cols(row):
        """Column placement with the +/-hy Nyquist split (even ny) or the
        correct positive/negative mapping (odd ny)."""
        out = jnp.zeros((nfy,), row.dtype)
        if ny % 2 == 0:
            out = out.at[:hy].set(row[:hy])
            out = out.at[hy].set(0.5 * row[hy])
            out = out.at[nfy - hy].set(0.5 * row[hy])
            out = out.at[nfy - hy + 1:].set(row[hy + 1:])
        else:
            out = out.at[:hy + 1].set(row[:hy + 1])
            out = out.at[nfy - hy:].set(row[hy + 1:])
        return out

    def pad(a):
        rows = jax.vmap(cols)(a)                     # (nx, nfy) placed
        out = jnp.zeros((nfx // 2 + 1, nfy), a.dtype)
        out = out.at[:hx].set(rows[:hx])
        out = out.at[hx].set(0.5 * rows[hx])
        return out

    return Cx(pad(c.re), pad(c.im))


def _pad_modes(c: Cx, nx, ny, nfx, nfy) -> Cx:
    """Zero-pad an (nx, ny) fftfreq-ordered mode array to (nfx, nfy)."""
    def pad(a):
        out = jnp.zeros((nfx, nfy), a.dtype)
        hx, hy = nx // 2, ny // 2
        rx = nx - hx
        ry = ny - hy
        out = out.at[:hx, :hy].set(a[:hx, :hy])
        out = out.at[:hx, nfy - ry:].set(a[:hx, hy:])
        out = out.at[nfx - rx:, :hy].set(a[hx:, :hy])
        out = out.at[nfx - rx:, nfy - ry:].set(a[hx:, hy:])
        return out
    return Cx(pad(c.re), pad(c.im))


class PeriodicInterpolator2D:
    """Interpolates real periodic grid data (or given modes) to fixed targets.

    Usage:
        interp = PeriodicInterpolator2D(nx, ny, tx, ty)     # host precompute
        vals = interp(f)            # f real (nx, ny) grid values -> (T,)
        vals = interp.from_modes(c) # c = Cx fft2 modes (with 1/(nx ny) conv.)

    The x_offset/y_offset arguments place the data grid's first sample at
    that coordinate (needed for the Chebyshev-reflection radial grids).
    """

    def __init__(self, nx: int, ny: int, tx, ty, sigma: float = 2, w: int = 16,
                 x_offset: float = 0.0, y_offset: float = 0.0,
                 native_fft=None):
        self.plan = build_nufft_plan(nx, ny, tx, ty, sigma, w,
                                     x_offset, y_offset)
        self.fine_plan = FourierPlan2D(self.plan.nfx, self.plan.nfy,
                                       native=native_fft)
        self.base_plan = FourierPlan2D(nx, ny, native=native_fft)
        self.T = np.asarray(tx).size
        self.w = w

    def from_modes(self, c: Cx):
        """c: (nx, ny) or (B, nx, ny) Cx of *unnormalized* fft2 modes."""
        batched = c.re.ndim == 3
        if not batched:
            c = Cx(c.re[None], c.im[None])
        out = jax.vmap(self._one_from_modes)(c)
        return out if batched else out[0]

    def _fine_patches(self, c: Cx):
        p = self.plan
        scale = 1.0 / (p.nx * p.ny)
        cd = Cx(c.re * p.deconv * scale, c.im * p.deconv * scale)
        if p.nx % 2 == 0:
            # real-field inputs: half-spectrum inverse (column-pair packed
            # x-pass) costs ~half of the full complex fine iFFT
            cp = _pad_modes_half(cd, p.nx, p.ny, p.nfx, p.nfy)
            fine = self.fine_plan.irfft2_real(cp) * (p.nfx * p.nfy)
        else:
            cp = _pad_modes(cd, p.nx, p.ny, p.nfx, p.nfy)
            fine = self.fine_plan.ifft2_real(cp) * (p.nfx * p.nfy)
        patches = jnp.take(fine.ravel(), p.flat_idx, axis=0)
        return patches.reshape(self.T, self.w, self.w)

    def _one_from_modes(self, c: Cx):
        p = self.plan
        patches = self._fine_patches(c)
        return jnp.einsum("tp,tq,tpq->t", p.wx, p.wy, patches,
                          precision=_HIGH)

    def _one_from_modes_grad(self, c: Cx):
        """(value, d/dtx, d/dty) at the targets from ONE fine transform.

        The derivatives differentiate the window interpolant itself
        (weights wxd/wyd): exact for the band-limited approximant, so the
        added error is the window's own ~1e-14 kernel error amplified by
        the local data bandwidth -- measured ~1e-12 relative on solver
        fields, vs THREE mode-multiplied interpolations (3x the fine
        transforms) on the old path.  Derivatives are in the plan's
        [0, 2pi) coordinates; callers scale by 2pi/period."""
        p = self.plan
        patches = self._fine_patches(c)
        val = jnp.einsum("tp,tq,tpq->t", p.wx, p.wy, patches,
                         precision=_HIGH)
        ddx = jnp.einsum("tp,tq,tpq->t", p.wxd, p.wy, patches,
                         precision=_HIGH)
        ddy = jnp.einsum("tp,tq,tpq->t", p.wx, p.wyd, patches,
                         precision=_HIGH)
        return val, ddx, ddy

    def from_modes_grad(self, c: Cx):
        """(vals, d/dtx, d/dty), each (T,) or (B, T) for batched input."""
        batched = c.re.ndim == 3
        if not batched:
            return self._one_from_modes_grad(c)
        return jax.vmap(self._one_from_modes_grad)(c)

    def __call__(self, f):
        """f: real (nx, ny) or (B, nx, ny) grid values."""
        batched = f.ndim == 3
        fs = f if batched else f[None]
        cs = jax.vmap(self.base_plan.fft2)(fs)
        out = jax.vmap(self._one_from_modes)(cs)
        return out if batched else out[0]


def _axis_ifft(n: int):
    """Axis-0 inverse-DFT plan: four-step for large factorable n."""
    from ipde_tpu.ops.fourier import (DirectDFT1D, FourStepFFT1D,
                                      FourierPlan2D, _best_factor)
    if n >= FourierPlan2D.FOURSTEP_MIN and _best_factor(n)[0] > 1:
        return FourStepFFT1D(n)
    return DirectDFT1D(n)


class HybridInterp2D:
    """Exact (factorized trig matmul) evaluation along the FIRST axis,
    windowed ES-kernel NUFFT along the LAST axis.

    Built for the radial (Chebyshev-reflection) -> grid transfer where the
    first axis holds only 2M <= ~48 Fourier modes while targets number in
    the hundreds of thousands: the full window NUFFT's flat gather touches
    w*w = 256 SCATTERED f64 elements per target (each pulling a whole TPU
    tile from HBM), whereas here a target costs w CONTIGUOUS row slices of
    the (nfy, nx) fine-in-y array plus an (nx,)-long real dot -- O(T*w*nx)
    sequential reads and flops, both tiny for nx ~ 40.

    Shares the plan interface of PeriodicInterpolator2D (reference finufft
    call sites: ipde/embedded_boundary.py:419-434, ebdy_collection.py:604).
    """

    def __init__(self, nx: int, ny: int, tx, ty, sigma: float = 2, w: int = 16,
                 x_offset: float = 0.0, y_offset: float = 0.0,
                 native_fft=None):
        txa = np.asarray(tx, np.float64).ravel() - x_offset
        tya = np.mod(np.asarray(ty, np.float64).ravel() - y_offset,
                     2 * np.pi)
        self.nx, self.ny = nx, ny
        nfy = int(np.ceil(sigma * ny))
        hy = 2 * np.pi / nfy
        beta = _es_beta(w, sigma)
        half_w = w / 2.0
        jy = np.floor(tya / hy).astype(np.int64)
        oy = jy - (w // 2 - 1)
        py = oy[:, None] + np.arange(w)[None, :]
        zy = (tya[:, None] / hy - py) / half_w
        self.wy = jnp.asarray(_es_kernel(zy, beta))
        self.row_idx = jnp.asarray(np.mod(py, nfy), jnp.int32)   # (T, w)
        ky = np.abs(np.fft.fftfreq(ny, 1.0 / ny)).astype(int)
        phy = _es_kernel_ft_table(w, beta, half_w * hy, int(ky.max()) + 1)
        self.deconv_y = jnp.asarray(hy / phy[ky])                # (ny,)
        kxn = np.fft.fftfreq(nx, 1.0 / nx)
        # exact first-axis phases, built on host (TPU f64 trig is inaccurate)
        self.Er = jnp.asarray(np.cos(np.outer(txa, kxn)))        # (T, nx)
        self.Ei = jnp.asarray(np.sin(np.outer(txa, kxn)))
        self.nfy = nfy
        self.T = txa.size
        self.w = w
        self.base_plan = FourierPlan2D(nx, ny, native=native_fft)
        self.fine_y = _axis_ifft(nfy)

    def _one_from_modes(self, c: Cx):
        return self._many_from_modes(Cx(c.re[None], c.im[None]))[0]

    def _many_from_modes(self, c: Cx):
        """Batched evaluation of B mode arrays (B, nx, ny) -> (B, T).

        The fields ride the GEMM/gather minor axis: the fine y-pass is ONE
        matmul of width B*nx instead of B, and each stencil row-gather
        serves every field (the gather's row fetch already pays a full
        128-lane tile, so widening nx -> B*nx is nearly free on TPU)."""
        B = c.re.shape[0]
        scale = self.nfy / (self.nx * self.ny)
        d = self.deconv_y * scale
        # (B, nx, ny) -> (ny, B*nx) with per-field column groups
        dre = (c.re * d[None, None, :]).transpose(2, 0, 1)\
            .reshape(self.ny, B * self.nx)
        dim_ = (c.im * d[None, None, :]).transpose(2, 0, 1)\
            .reshape(self.ny, B * self.nx)
        hy = self.ny // 2
        ry = self.ny - hy
        zre = jnp.zeros((self.nfy, B * self.nx), dre.dtype)
        pre = zre.at[:hy].set(dre[:hy]).at[self.nfy - ry:].set(dre[hy:])
        pim = zre.at[:hy].set(dim_[:hy]).at[self.nfy - ry:].set(dim_[hy:])
        F = self.fine_y.ifft(Cx(pre, pim))     # (nfy, B*nx) fine in y
        acc = jnp.zeros((self.T, B), F.re.dtype)
        # stencil-axis loop with (T, B*nx) intermediates: [T, w, nx] stacks
        # would tile to (8,128) minor blocks and blow up HBM traffic
        for q in range(self.w):
            idx = self.row_idx[:, q]
            pr = jnp.take(F.re, idx, axis=0).reshape(self.T, B, self.nx)
            pi = jnp.take(F.im, idx, axis=0).reshape(self.T, B, self.nx)
            val = jnp.sum(pr * self.Er[:, None, :] - pi * self.Ei[:, None, :],
                          axis=2)              # (T, B)
            acc = acc + self.wy[:, q, None] * val
        return acc.T

    def from_modes(self, c: Cx):
        batched = c.re.ndim == 3
        if not batched:
            return self._one_from_modes(c)
        return self._many_from_modes(c)

    def __call__(self, f):
        batched = f.ndim == 3
        fs = f if batched else f[None]
        cs = jax.vmap(self.base_plan.fft2)(fs)
        out = self._many_from_modes(cs)
        return out if batched else out[0]


def nufft2d2_exact(c: Cx, tx, ty):
    """Direct (exact) evaluation sum_k C_k e^{i k.x} / (nx ny) at targets.

    O(T nx ny); for validation and small mode grids.  Host/numpy-free:
    operates on jnp arrays.
    """
    nx, ny = c.shape[-2:]
    kx = jnp.asarray(np.fft.fftfreq(nx, 1.0 / nx))
    ky = jnp.asarray(np.fft.fftfreq(ny, 1.0 / ny))
    tx = jnp.asarray(tx).ravel()
    ty = jnp.asarray(ty).ravel()
    # G[t, kx] = sum_ky C[kx, ky] e^{i ky ty}
    ey_re = jnp.cos(ty[:, None] * ky[None, :])
    ey_im = jnp.sin(ty[:, None] * ky[None, :])
    g_re = jnp.matmul(ey_re, c.re.T, precision=_HIGH) - jnp.matmul(ey_im, c.im.T, precision=_HIGH)
    g_im = jnp.matmul(ey_re, c.im.T, precision=_HIGH) + jnp.matmul(ey_im, c.re.T, precision=_HIGH)
    ex_re = jnp.cos(tx[:, None] * kx[None, :])
    ex_im = jnp.sin(tx[:, None] * kx[None, :])
    out = jnp.sum(ex_re * g_re - ex_im * g_im, axis=1)
    return out / (nx * ny)


# ---------------------------------------------------------------------------
# periodic polynomial (Lagrange) interpolation to fixed targets
# ---------------------------------------------------------------------------

class PolyInterpolator2D:
    """k-th order Lagrange stencil interpolation on a periodic uniform grid.

    Replaces fast_interp.interp2d (reference: ipde/ebdy_collection.py:602,
    advection paths).  Host precompute of stencil indices + weights; device
    apply is one gather + small einsum, same shape as the NUFFT apply.
    """

    def __init__(self, x0, y0, xh, yh, nx, ny, tx, ty, order: int = 7):
        tx = (np.asarray(tx, np.float64).ravel() - x0) / xh
        ty = (np.asarray(ty, np.float64).ravel() - y0) / yh
        k = order
        half = (k - 1) // 2
        jx = np.floor(tx).astype(np.int64) - half
        jy = np.floor(ty).astype(np.int64) - half
        offs = np.arange(k)
        px = jx[:, None] + offs
        py = jy[:, None] + offs
        wx = _lagrange_weights(tx[:, None] - px)
        wy = _lagrange_weights(ty[:, None] - py)
        flat = (np.mod(px, nx)[:, :, None] * ny + np.mod(py, ny)[:, None, :])
        self.flat_idx = jnp.asarray(flat.reshape(tx.size, k * k), jnp.int32)
        self.wx = jnp.asarray(wx)
        self.wy = jnp.asarray(wy)
        self.k = k
        self.T = tx.size

    def __call__(self, f):
        patches = jnp.take(f.ravel(), self.flat_idx, axis=0)
        patches = patches.reshape(self.T, self.k, self.k)
        return jnp.einsum("tp,tq,tpq->t", self.wx, self.wy, patches,
                          precision=_HIGH)


def _lagrange_weights(d):
    """Lagrange basis weights for nodes at integer offsets given distances d
    (T, k) where d[:, j] = t - node_j; nodes are 0..k-1 shifted."""
    T, k = d.shape
    w = np.ones((T, k))
    for j in range(k):
        for m in range(k):
            if m != j:
                w[:, j] *= d[:, m] / (d[:, m] - d[:, j])
    return w


class ExactInterp2D:
    """Exact type-2 evaluation for SMALL mode grids via factorized matmuls.

    For radial (Chebyshev-reflection) grids the mode count is tiny
    (2M x n_b), so the exact trigonometric sum -- two tall matmuls on the
    MXU -- beats the window NUFFT's gather on TPU and is exact to roundoff.
    Same interface as PeriodicInterpolator2D.
    """

    # precompute phase matrices when their footprint is modest: trades
    # ~200MB HBM for removing all f64 trig from the hot path
    PRECOMP_MAX = 32 * 1024 * 1024  # elements per matrix

    def __init__(self, nx: int, ny: int, tx, ty, x_offset: float = 0.0,
                 y_offset: float = 0.0, native_fft=None):
        self.nx, self.ny = nx, ny
        txa = np.asarray(tx, np.float64).ravel() - x_offset
        tya = np.asarray(ty, np.float64).ravel() - y_offset
        self.tx = jnp.asarray(txa)
        self.ty = jnp.asarray(tya)
        kxn = np.fft.fftfreq(nx, 1.0 / nx)
        kyn = np.fft.fftfreq(ny, 1.0 / ny)
        self.kx = jnp.asarray(kxn)
        self.ky = jnp.asarray(kyn)
        self.base_plan = FourierPlan2D(nx, ny, native=native_fft)
        self.T = self.tx.shape[0]
        self.precomp = (self.T * max(nx, ny)) <= self.PRECOMP_MAX
        if self.precomp:
            self.EYr = jnp.asarray(np.cos(np.outer(tya, kyn)))
            self.EYi = jnp.asarray(np.sin(np.outer(tya, kyn)))
            self.EXr = jnp.asarray(np.cos(np.outer(txa, kxn)))
            self.EXi = jnp.asarray(np.sin(np.outer(txa, kxn)))

    def _one_from_modes(self, c: Cx):
        return self._many_from_modes(Cx(c.re[None], c.im[None]))[0]

    def _many_from_modes(self, c: Cx):
        """Batched evaluation of (B, nx, ny) mode arrays -> (B, T): the
        (T, ny)/(T, nx) trig phase matrices (the dominant cost when not
        precomputed -- f64 transcendentals are emulated on TPU) are built
        ONCE and shared by every field via column-stacked GEMMs."""
        B = c.re.shape[0]
        if self.precomp:
            ey_re, ey_im = self.EYr, self.EYi
            ex_re, ex_im = self.EXr, self.EXi
        else:
            ey_re = jnp.cos(self.ty[:, None] * self.ky[None, :])
            ey_im = jnp.sin(self.ty[:, None] * self.ky[None, :])
            ex_re = jnp.cos(self.tx[:, None] * self.kx[None, :])
            ex_im = jnp.sin(self.tx[:, None] * self.kx[None, :])
        # (B, nx, ny) -> (ny, B*nx) with per-field column groups
        CR = c.re.transpose(2, 0, 1).reshape(self.ny, B * self.nx)
        CI = c.im.transpose(2, 0, 1).reshape(self.ny, B * self.nx)
        g_re = (jnp.matmul(ey_re, CR, precision=_HIGH)
                - jnp.matmul(ey_im, CI, precision=_HIGH))
        g_im = (jnp.matmul(ey_re, CI, precision=_HIGH)
                + jnp.matmul(ey_im, CR, precision=_HIGH))
        g_re = g_re.reshape(self.T, B, self.nx)
        g_im = g_im.reshape(self.T, B, self.nx)
        out = jnp.sum(ex_re[:, None, :] * g_re - ex_im[:, None, :] * g_im,
                      axis=2)                   # (T, B)
        return out.T / (self.nx * self.ny)

    def from_modes(self, c: Cx):
        batched = c.re.ndim == 3
        if not batched:
            return self._one_from_modes(c)
        return self._many_from_modes(c)

    def _one_from_modes_grad(self, c: Cx):
        """(value, d/dtx, d/dty): exact trigonometric differentiation
        (the ik factors fold into the phase matrices; 2 extra matmuls +
        1 extra reduction vs the value path)."""
        if self.precomp:
            ey_re, ey_im = self.EYr, self.EYi
            ex_re, ex_im = self.EXr, self.EXi
        else:
            ey_re = jnp.cos(self.ty[:, None] * self.ky[None, :])
            ey_im = jnp.sin(self.ty[:, None] * self.ky[None, :])
            ex_re = jnp.cos(self.tx[:, None] * self.kx[None, :])
            ex_im = jnp.sin(self.tx[:, None] * self.kx[None, :])
        CR, CI = c.re.T, c.im.T
        mm = lambda a, b: jnp.matmul(a, b, precision=_HIGH)
        g_re = mm(ey_re, CR) - mm(ey_im, CI)
        g_im = mm(ey_re, CI) + mm(ey_im, CR)
        kyr = self.ky[None, :]
        dg_re = -mm(ey_im * kyr, CR) - mm(ey_re * kyr, CI)
        dg_im = -mm(ey_im * kyr, CI) + mm(ey_re * kyr, CR)
        norm = 1.0 / (self.nx * self.ny)
        kxr = self.kx[None, :]
        val = jnp.sum(ex_re * g_re - ex_im * g_im, axis=1) * norm
        ddx = jnp.sum(-(kxr * ex_im) * g_re - (kxr * ex_re) * g_im,
                      axis=1) * norm
        ddy = jnp.sum(ex_re * dg_re - ex_im * dg_im, axis=1) * norm
        return val, ddx, ddy

    def from_modes_grad(self, c: Cx):
        batched = c.re.ndim == 3
        if not batched:
            return self._one_from_modes_grad(c)
        return jax.vmap(self._one_from_modes_grad)(c)

    def __call__(self, f):
        batched = f.ndim == 3
        fs = f if batched else f[None]
        cs = jax.vmap(self.base_plan.fft2)(fs)
        out = self._many_from_modes(cs)
        return out if batched else out[0]


def make_interpolator(nx: int, ny: int, tx, ty, x_offset: float = 0.0,
                      y_offset: float = 0.0, exact_max_modes: int = 65536,
                      exact_max_targets: int = 8192):
    """Pick the cheaper evaluation: exact factorized trig matmuls when the
    mode grid is small (radial grids) OR the target count is small relative
    to the mode grid (boundary/interface points vs the full box); the
    window NUFFT (upsampled FFT + gather) otherwise."""
    T = np.asarray(tx).size
    exact_flops = T * nx * ny
    nufft_flops = 40 * (2 * nx) * (2 * ny) * (np.log2(max(nx * ny, 2)))
    # The exact path materializes (T, max(nx, ny)) temps per field and per
    # re/im product -- at 2048^2 grids with thousands of interface targets
    # that is GBs of HLO temp (measured: a 1.32 GB broadcast OOMed the
    # 2048^2 Stokes step on a 16 GB chip).  Bound the intermediate size,
    # not just the flops.
    exact_mem_ok = T * max(nx, ny) <= 2 ** 21
    # radial-style plans (nx = 2M <= 64) with MANY targets: the exact
    # path's on-the-fly (T, ny) f64 trig dominates (measured 208.9 ms for
    # 3 fields at nb=1200, T~1e5, tools/profile_stokes.py 2026-08-20);
    # the hybrid window path replaces it with one small fine transform
    # plus w row-gathers.
    exact_T_ok = T <= 4 * exact_max_targets
    if ((nx * ny <= exact_max_modes and (nx > 64 or exact_T_ok))
            or (T <= exact_max_targets and exact_flops < nufft_flops
                and exact_mem_ok)):
        return ExactInterp2D(nx, ny, tx, ty, x_offset, y_offset)
    if nx <= 64:
        # radial (2M-row) mode grids: exact-in-x + row-gather NUFFT-in-y
        # beats the (T, w*w) scattered-element gather on TPU
        return HybridInterp2D(nx, ny, tx, ty, x_offset=x_offset,
                              y_offset=y_offset)
    if T * 8 <= nx * ny:
        # few targets on a big grid (interface points vs the full box):
        # the fine iFFT dominates, so trade a wider window (w 16 -> 24,
        # still ~1e-15 kernel error) for 1.25x instead of 2x upsampling
        # -- 2.56x less fine-grid area per transform
        return PeriodicInterpolator2D(nx, ny, tx, ty, sigma=1.25, w=24,
                                      x_offset=x_offset, y_offset=y_offset)
    return PeriodicInterpolator2D(nx, ny, tx, ty, x_offset=x_offset,
                                  y_offset=y_offset)
