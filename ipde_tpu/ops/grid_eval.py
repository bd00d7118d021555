"""Free-space layer-potential evaluation on ALL grid points via FFT.

The dense O(T*S) kernel sum is replaced, for uniform-grid targets, by a
Vico-Greengard truncated-Green's-function convolution on a 2x-padded grid
plus exact local corrections near the sources:

    phi(x) = ifft2( Ghat_L(k) * rho_hat(k) ) / A
           + sum_{|x - s_j| < r_cut} [G(x - s_j) - T(x - s_j)] q_j

where rho_hat is the type-1 (spreading) NUFFT of the point sources,
Ghat_L the analytic Fourier transform of the radially TRUNCATED kernel
(exact free-space convolution for all distances < L: no periodic images),
and T the band-limited kernel the FFT actually applied (evaluated exactly
at the static near-pair offsets during host setup).

Reference analogue: the Ewald-style grid evaluators
(ipde/grid_evaluators/scalar_grid_evaluator.py:130-307,
laplace_grid_evaluator.py:21-33).  TPU design: sources are geometry-static,
so spreading indices/weights and the near-correction sparse matrix are host
precomputes; the device path is one scatter-add, one padded FFT round trip,
and one gather-scatter.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from scipy.special import j0, j1, k0 as K0, k1 as K1

from ipde_tpu.geometry.grid import Grid
from ipde_tpu.ops.cx import Cx
from ipde_tpu.ops.fourier import FourierPlan2D
from ipde_tpu.ops.interp import _es_kernel, _es_kernel_ft_table

_HIGH = jax.lax.Precision.HIGHEST


def laplace_truncated_symbol(kk: np.ndarray, L: float) -> np.ndarray:
    """FT of G_L = -log(r)/(2pi) * 1_{r<L}:
    Ghat_L(k) = [(1 - J0(kL)) - kL log(L) J1(kL)] / k^2, k != 0;
    Ghat_L(0) = -(L^2/2)(log L - 1/2)."""
    out = np.empty_like(kk)
    nz = kk > 0
    z = kk[nz] * L
    out[nz] = ((1.0 - j0(z)) - z * np.log(L) * j1(z)) / kk[nz] ** 2
    out[~nz] = -(L**2 / 2.0) * (np.log(L) - 0.5)
    return out


def yukawa_truncated_symbol(kk: np.ndarray, L: float, kappa: float) -> np.ndarray:
    """FT of G_L = K0(kappa r)/(2pi) * 1_{r<L} (Lommel integral):
    Ghat_L(k) = [1 + kL J1(kL) K0(kappa L)
                   - kappa L J0(kL) K1(kappa L)] / (k^2 + kappa^2)."""
    z = kk * L
    return ((1.0 + z * j1(z) * K0(kappa * L)
             - kappa * L * j0(z) * K1(kappa * L)) / (kk**2 + kappa**2))


def _host_nufft2(modes: np.ndarray, gx: np.ndarray, gy: np.ndarray,
                 Px: int, Py: int, sigma: int = 2, w: int = 16) -> np.ndarray:
    """Host (numpy) type-2 evaluation of sum_k modes[k] e^{i k.x} at targets
    given in grid-index units (gx, gy) of the (Px, Py) mode grid."""
    beta = 2.30 * w
    half_w = w / 2.0
    nfx, nfy = sigma * Px, sigma * Py
    # deconvolve with the window FT on the mode grid (index-unit coordinates:
    # wavenumbers are 2 pi k / P, window half-width half_w fine-cells = half_w/sigma
    # index units -> use the same normalized machinery as build_nufft_plan)
    kx = np.abs(np.fft.fftfreq(Px, 1.0 / Px)).astype(int)
    ky = np.abs(np.fft.fftfreq(Py, 1.0 / Py)).astype(int)
    phx = _es_kernel_ft_table(w, beta, (2 * np.pi / nfx) * half_w, int(kx.max()) + 1)
    phy = _es_kernel_ft_table(w, beta, (2 * np.pi / nfy) * half_w, int(ky.max()) + 1)
    hx_a, hy_a = 2 * np.pi / nfx, 2 * np.pi / nfy
    deconv = (hx_a / phx[kx])[:, None] * (hy_a / phy[ky])[None, :]
    padded = np.zeros((nfx, nfy), dtype=complex)
    hxm, hym = Px // 2, Py // 2
    m = modes * deconv
    padded[:hxm, :hym] = m[:hxm, :hym]
    padded[:hxm, nfy - (Py - hym):] = m[:hxm, hym:]
    padded[nfx - (Px - hxm):, :hym] = m[hxm:, :hym]
    padded[nfx - (Px - hxm):, nfy - (Py - hym):] = m[hxm:, hym:]
    fine = np.fft.ifft2(padded).real * (nfx * nfy)
    # window weights at the targets (fine-grid index units)
    fx = np.mod(gx, Px) * sigma
    fy = np.mod(gy, Py) * sigma
    jx = np.floor(fx).astype(np.int64) - (w // 2 - 1)
    jy = np.floor(fy).astype(np.int64) - (w // 2 - 1)
    offs = np.arange(w)
    out = np.empty(gx.size)
    chunk = 200000
    fine_flat = fine.ravel()
    for s0 in range(0, gx.size, chunk):
        sl = slice(s0, min(s0 + chunk, gx.size))
        px_ = jx[sl, None] + offs
        py_ = jy[sl, None] + offs
        wx_ = _es_kernel((fx[sl, None] - px_) / half_w, beta)
        wy_ = _es_kernel((fy[sl, None] - py_) / half_w, beta)
        flat = (np.mod(px_, nfx)[:, :, None] * nfy
                + np.mod(py_, nfy)[:, None, :])
        patches = fine_flat[flat]
        out[sl] = np.einsum("tp,tq,tpq->t", wx_, wy_, patches)
    return out


class FreespaceGridEvaluator:
    """phi(grid) = sum_j G(x - s_j) q_j for fixed sources s_j inside the box.

    kernel: 'laplace' (G = -log r / 2pi) or 'yukawa' (G = K0(kappa r)/2pi).
    Returned values live on the full (Nx, Ny) grid.
    """

    def __init__(self, grid: Grid, src_x, src_y, kernel: str = "laplace",
                 kappa: float = 1.0, pad: int = None, w: int = 16,
                 r_cut_h: float = 22.0, target_bounds=None):
        """target_bounds: ((x0, x1), (y0, y1)) bounding box of the grid
        points whose values are actually USED (e.g. the physical region);
        shrinking it reduces the truncation radius and often the padding."""
        src_x = np.asarray(src_x, np.float64).ravel()
        src_y = np.asarray(src_y, np.float64).ravel()
        self.S = src_x.size
        self.grid = grid
        Nx, Ny = grid.Nx, grid.Ny
        hx, hy = grid.xh, grid.yh
        Lx, Ly = Nx * hx, Ny * hy
        # maximum USED-target-to-source distance
        if target_bounds is None:
            target_bounds = (grid.x_bounds, grid.y_bounds)
        (tx0, tx1), (ty0, ty1) = target_bounds
        corners = [(tx0, ty0), (tx0, ty1), (tx1, ty0), (tx1, ty1)]
        maxdist = max(np.hypot(src_x - cx, src_y - cy).max()
                      for cx, cy in corners)
        # truncation radius must cover every pair WITH margin for the
        # Gaussian screen's blur width (several 1/eta), AND the nearest
        # periodic image pair must be beyond it: pad*min(Lx,Ly) >= L + maxdist
        L = maxdist + 60.0 * max(hx, hy) / np.pi
        if pad is None:
            pad = int(np.ceil((L + maxdist) / min(Lx, Ly)))
            pad = max(pad, 2)
        if pad * min(Lx, Ly) < L + maxdist - 1e-12:
            raise ValueError("padding insufficient to exclude periodic images")
        Px, Py = pad * Nx, pad * Ny
        self.Px, self.Py = Px, Py
        self.L = L
        # ---- symbol on the padded modes -------------------------------
        kx = 2 * np.pi * np.fft.fftfreq(Px, hx)
        ky = 2 * np.pi * np.fft.fftfreq(Py, hy)
        kk = np.hypot(kx[:, None], ky[None, :])
        if kernel == "laplace":
            sym = laplace_truncated_symbol(kk, L)
            gfun = lambda r: -np.log(np.maximum(r, 1e-300)) / (2 * np.pi)
        elif kernel == "yukawa":
            sym = yukawa_truncated_symbol(kk, L, kappa)
            gfun = lambda r: K0(kappa * np.maximum(r, 1e-300)) / (2 * np.pi)
        else:
            raise ValueError(kernel)
        self.kernel = kernel
        # ---- type-1 spreading plan (sources -> padded grid) -----------
        beta = 2.30 * w
        half_w = w / 2.0
        # source coordinates in padded-grid index units
        gx = (src_x - grid.x_bounds[0]) / hx
        gy = (src_y - grid.y_bounds[0]) / hy
        jx = np.floor(gx).astype(np.int64) - (w // 2 - 1)
        jy = np.floor(gy).astype(np.int64) - (w // 2 - 1)
        px = jx[:, None] + np.arange(w)[None, :]
        py = jy[:, None] + np.arange(w)[None, :]
        wx = _es_kernel((gx[:, None] - px) / half_w, beta)
        wy = _es_kernel((gy[:, None] - py) / half_w, beta)
        flat = (np.mod(px, Px)[:, :, None] * Py + np.mod(py, Py)[:, None, :])
        self.spread_idx = jnp.asarray(flat.reshape(self.S, w * w), jnp.int32)
        self.spread_w = jnp.asarray((wx[:, :, None] * wy[:, None, :])
                                    .reshape(self.S, w * w))
        # deconvolution of the spreading window (continuous FT at the
        # padded wavenumbers, by quadrature)
        xq, wq = np.polynomial.legendre.leggauss(max(200, 4 * w))
        ax = half_w * hx
        ay = half_w * hy
        phx = (np.cos(np.outer(kx, ax * xq)) * (_es_kernel(xq, beta) * ax * wq)).sum(1)
        phy = (np.cos(np.outer(ky, ay * xq)) * (_es_kernel(xq, beta) * ay * wq)).sum(1)
        A = (pad * Lx) * (pad * Ly)
        # Gaussian screen: point sources have flat spectra, so the truncated
        # symbol's slowly-decaying k-tail (Gibbs ring of the sharp r=L cutoff)
        # would alias at ~1e-3.  Splitting off a Gaussian-screened far field
        # kills the tail; the complementary near interaction is folded into
        # the local corrections below (classical particle-mesh structure;
        # reference analogue: ipde/grid_evaluators/scalar_grid_evaluator.py).
        h_eff = max(hx, hy)
        eta = np.pi / (11.4 * h_eff)
        # for the Yukawa operator the exact Ewald screen is
        # exp(-(k^2+kappa^2)/4 eta^2): the complementary near part is then
        # exponentially localized (a plain Gaussian blur is only exact for
        # HARMONIC kernels, via the mean-value property)
        kap2 = kappa**2 if kernel == "yukawa" else 0.0
        gauss = np.exp(-(kk**2 + kap2) / (4.0 * eta**2))
        sym = sym * gauss
        # full multiplier: (hx hy / (phx phy)) [type-1 deconv] * sym / A,
        # and the ifft2 we use is unnormalized-sum / (Px Py) -> multiply back
        self.mult = jnp.asarray(
            (hx * hy / (phx[:, None] * phy[None, :])) * sym / A * (Px * Py))
        self.fft_plan = FourierPlan2D(Px, Py)
        # ---- near corrections ------------------------------------------
        r_cut = r_cut_h * max(hx, hy)
        rows, cols, offx, offy = [], [], [], []
        for j in range(self.S):
            ix0 = int(np.ceil((src_x[j] - r_cut - grid.x_bounds[0]) / hx))
            ix1 = int(np.floor((src_x[j] + r_cut - grid.x_bounds[0]) / hx))
            iy0 = int(np.ceil((src_y[j] - r_cut - grid.y_bounds[0]) / hy))
            iy1 = int(np.floor((src_y[j] + r_cut - grid.y_bounds[0]) / hy))
            ix = np.arange(max(ix0, 0), min(ix1 + 1, Nx))
            iy = np.arange(max(iy0, 0), min(iy1 + 1, Ny))
            if ix.size == 0 or iy.size == 0:
                continue
            XX = grid.x_bounds[0] + ix * hx
            YY = grid.y_bounds[0] + iy * hy
            dx = (XX[:, None] - src_x[j])
            dy = (YY[None, :] - src_y[j])
            sel = (dx**2 + dy**2) <= r_cut**2
            ii, jj = np.nonzero(sel)
            rows.append(ix[ii] * Ny + iy[jj])
            cols.append(np.full(ii.size, j))
            offx.append(dx[ii, 0 * jj])
            offy.append(dy[0 * ii, jj])
        rows = np.concatenate(rows)
        cols = np.concatenate(cols)
        offx = np.concatenate(offx)
        offy = np.concatenate(offy)
        r = np.hypot(offx, offy)
        # T at the static offsets: the band-limited kernel the FFT applies,
        # evaluated by a one-time window-NUFFT of the symbol itself
        # (pure host numpy: this is setup, and the target count can reach
        # millions which the device compiler need not see)
        T_off = _host_nufft2(sym / A, offx / hx, offy / hy, Px, Py)
        corr = gfun(r) - T_off
        # a source exactly on a grid point would make G singular; the QFS
        # source curves never touch grid points, but guard anyway
        corr[r < 1e-13] = 0.0
        # pack corrections as per-source dense patches: the device-side
        # accumulation is a lax.scan of dynamic-slice updates (a raw 1M-pair
        # scatter-add costs ~140ms on TPU; the patch scan is a few ms)
        wc = int(np.ceil(r_cut / min(hx, hy))) + 1
        P = 2 * wc + 1
        self.patch_P = P
        self.margin = wc
        patches = np.zeros((self.S, P, P))
        ox0 = np.empty(self.S, np.int32)
        oy0 = np.empty(self.S, np.int32)
        six = np.round((src_x - grid.x_bounds[0]) / hx).astype(int)
        siy = np.round((src_y - grid.y_bounds[0]) / hy).astype(int)
        for j in range(self.S):
            ox0[j] = six[j] - wc + wc          # origin in the EXTENDED grid
            oy0[j] = siy[j] - wc + wc
        sel_rows_x = rows // Ny
        sel_rows_y = rows % Ny
        px_loc = sel_rows_x - (six[cols] - wc)
        py_loc = sel_rows_y - (siy[cols] - wc)
        ok = ((px_loc >= 0) & (px_loc < P) & (py_loc >= 0) & (py_loc < P))
        if not ok.all():
            raise RuntimeError("near pair outside its source patch")
        patches[cols, px_loc, py_loc] = corr
        self.patches = jnp.asarray(patches)
        self.patch_x0 = jnp.asarray(ox0, jnp.int32)
        self.patch_y0 = jnp.asarray(oy0, jnp.int32)

    def __call__(self, q):
        """q: (S,) weighted charges -> (Nx, Ny) potential grid."""
        spread = jnp.zeros(self.Px * self.Py)
        vals = (self.spread_w * q[:, None]).ravel()
        spread = spread.at[self.spread_idx.ravel()].add(vals)
        spread = spread.reshape(self.Px, self.Py)
        c = self.fft_plan.fft2(spread)
        c = Cx(c.re * self.mult, c.im * self.mult)
        phi = self.fft_plan.ifft2_real(c)[: self.grid.Nx, : self.grid.Ny]
        # near corrections: scan of dense patch updates on an extended grid
        m = self.margin
        Pp = self.patch_P
        ext = jnp.zeros((self.grid.Nx + 2 * m, self.grid.Ny + 2 * m))

        def body(acc, inp):
            patch, x0, y0 = inp
            cur = jax.lax.dynamic_slice(acc, (x0, y0), (Pp, Pp))
            return jax.lax.dynamic_update_slice(acc, cur + patch,
                                                (x0, y0)), None

        ext, _ = jax.lax.scan(
            body, ext, (self.patches * q[:, None, None],
                        self.patch_x0, self.patch_y0))
        phi = phi + ext[m:-m, m:-m]
        return phi
