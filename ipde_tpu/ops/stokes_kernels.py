"""Stokes layer-potential kernels: naive forms, Kress self-forms, device
applies (mu = 1 throughout; reference surface: pybie2d Stokes_Layer_* rows in
SURVEY.md 2.2).

Conventions (verified against Green identities in tests):
  Stokeslet (SLP) velocity: G_ij = (1/4pi)(-delta_ij log r + r_i r_j / r^2)
  Stokeslet pressure:       P_j  = r_j / (2 pi r^2)
  Stresslet (DLP) velocity: K_ij = (1/pi) r_i r_j (r.n_y) / r^4
  Stresslet pressure:       Q_j  = (1/pi) (-n_j / r^2 + 2 r_j (r.n_y) / r^4)
with r = x - y (target minus source), n_y the source outward normal.

Interior Green representation (Lorentz):  for a Stokes solution (u, p) inside
a closed curve with traction t = sigma.n on it (outward n),
    u(x) = SLP[t](x) - DLP[u](x)           x inside
    p(x) = SLPp[t](x) - DLPp[u](x)
with one-sided limits DLP -> PV - u/2 (inside), PV + u/2 (outside); on-surface
this reads SLP_self[t] - DLP_self[u] = u/2 (verified in tests).

Vector densities are packed [fx (N,) ; fy (N,)] -> matrices are (2T, 2S).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ipde_tpu.geometry.curve import BoundaryCurve
from ipde_tpu.ops.kernels import accurate_log, kernel_matvec
from ipde_tpu.ops.singular import log_quad_circulant

_HIGH = jax.lax.Precision.HIGHEST
_CHUNK = 32768


def _geom(src: BoundaryCurve, tx, ty):
    dx = np.asarray(tx).ravel()[:, None] - src.x[None, :]
    dy = np.asarray(ty).ravel()[:, None] - src.y[None, :]
    r2 = dx * dx + dy * dy
    return dx, dy, r2


def _block(axx, axy, ayx, ayy):
    return np.block([[axx, axy], [ayx, ayy]])


# ---------------------------------------------------------------------------
# naive (smooth-quadrature) forms
# ---------------------------------------------------------------------------

def stokes_slp_naive(src: BoundaryCurve, tx, ty) -> np.ndarray:
    """(2T, 2S) velocity matrix of the single layer."""
    dx, dy, r2 = _geom(src, tx, ty)
    ilr = -0.5 * np.log(r2)
    ir2 = 1.0 / r2
    w = src.weights[None, :] / (4 * np.pi)
    return _block((ilr + dx * dx * ir2) * w, (dx * dy * ir2) * w,
                  (dx * dy * ir2) * w, (ilr + dy * dy * ir2) * w)


def stokes_slp_pressure_naive(src: BoundaryCurve, tx, ty) -> np.ndarray:
    """(T, 2S) pressure matrix of the single layer."""
    dx, dy, r2 = _geom(src, tx, ty)
    w = src.weights[None, :] / (2 * np.pi)
    return np.hstack([dx / r2 * w, dy / r2 * w])


def stokes_dlp_naive(src: BoundaryCurve, tx, ty) -> np.ndarray:
    """(2T, 2S) velocity matrix of the double layer (stresslet)."""
    dx, dy, r2 = _geom(src, tx, ty)
    rn = dx * src.normal_x[None, :] + dy * src.normal_y[None, :]
    c = rn / (r2 * r2) * (src.weights[None, :] / np.pi)
    return _block(c * dx * dx, c * dx * dy, c * dy * dx, c * dy * dy)


def stokes_dlp_pressure_naive(src: BoundaryCurve, tx, ty) -> np.ndarray:
    """(T, 2S) pressure matrix of the double layer."""
    dx, dy, r2 = _geom(src, tx, ty)
    rn = dx * src.normal_x[None, :] + dy * src.normal_y[None, :]
    w = src.weights[None, :] / np.pi
    px = (-src.normal_x[None, :] / r2 + 2 * dx * rn / r2**2) * w
    py = (-src.normal_y[None, :] / r2 + 2 * dy * rn / r2**2) * w
    return np.hstack([px, py])


# ---------------------------------------------------------------------------
# Kress self-evaluation forms
# ---------------------------------------------------------------------------

def stokes_slp_self(curve: BoundaryCurve) -> np.ndarray:
    """(2N, 2N) spectrally accurate on-surface SLP velocity matrix."""
    n = curve.N
    dx, dy, r2 = _geom(curve, curve.x, curve.y)
    t = curve.t
    s2 = 4.0 * np.sin((t[:, None] - t[None, :]) / 2.0) ** 2
    off = ~np.eye(n, dtype=bool)
    # log part: coefficient -delta_ij/(8 pi) (since -log r = -(1/2) log r^2)
    W = log_quad_circulant(n)
    logA = -W / (8 * np.pi)
    # smooth remainders
    Sd = np.empty((n, n))       # the -(1/2) log(r^2/4sin^2) delta part
    Sd[off] = -0.5 * np.log(r2[off] / s2[off]) / (4 * np.pi)
    np.fill_diagonal(Sd, -np.log(curve.speed) / (4 * np.pi))
    ir2 = np.zeros((n, n))
    ir2[off] = 1.0 / r2[off]
    rxx = dx * dx * ir2
    rxy = dx * dy * ir2
    ryy = dy * dy * ir2
    np.fill_diagonal(rxx, curve.tangent_x**2)
    np.fill_diagonal(rxy, curve.tangent_x * curve.tangent_y)
    np.fill_diagonal(ryy, curve.tangent_y**2)
    dt = curve.dt / (4 * np.pi)
    sp = curve.speed[None, :]
    # logA already includes its quadrature weights; smooth parts use dt
    Axx = (logA + (Sd * curve.dt + rxx * dt)) * sp
    Axy = (rxy * dt) * sp
    Ayy = (logA + (Sd * curve.dt + ryy * dt)) * sp
    return _block(Axx, Axy, Axy, Ayy)


def stokes_dlp_self(curve: BoundaryCurve) -> np.ndarray:
    """(2N, 2N) on-surface DLP (stresslet) velocity matrix: kernel is smooth
    with diagonal limit -(kappa/2pi) tau_i tau_j."""
    n = curve.N
    dx, dy, r2 = _geom(curve, curve.x, curve.y)
    off = ~np.eye(n, dtype=bool)
    rn = dx * curve.normal_x[None, :] + dy * curve.normal_y[None, :]
    c = np.zeros((n, n))
    c[off] = rn[off] / (r2[off] ** 2)
    Axx = c * dx * dx
    Axy = c * dx * dy
    Ayy = c * dy * dy
    lim = -curve.curvature / 2.0
    np.fill_diagonal(Axx, lim * curve.tangent_x**2)
    np.fill_diagonal(Axy, lim * curve.tangent_x * curve.tangent_y)
    np.fill_diagonal(Ayy, lim * curve.tangent_y**2)
    w = curve.weights[None, :] / np.pi
    return _block(Axx * w, Axy * w, Axy * w, Ayy * w)


def stokes_pressure_fix(src: BoundaryCurve, tx_n, ty_n) -> np.ndarray:
    """Rank completion n(x) (n(y).)/|Gamma| curing the DLP normal-flux
    nullspace (reference: examples/multi_stokes_for_paper.py Stokes_Pressure_Fix).
    tx_n, ty_n: target normal components (arrays)."""
    wx = src.normal_x * src.weights
    wy = src.normal_y * src.weights
    scale = 1.0 / np.sum(src.weights)  # 1/|Gamma|
    nxx = np.asarray(tx_n)[:, None] * wx[None, :]
    nxy = np.asarray(tx_n)[:, None] * wy[None, :]
    nyx = np.asarray(ty_n)[:, None] * wx[None, :]
    nyy = np.asarray(ty_n)[:, None] * wy[None, :]
    return _block(nxx, nxy, nyx, nyy) * scale


# ---------------------------------------------------------------------------
# device applies (velocity + pressure from packed forces [fx; fy])
# ---------------------------------------------------------------------------

def stokes_slp_apply(sx, sy, wfx, wfy, tx, ty):
    """Velocity (u, v) and pressure p at targets from weighted forces."""
    from ipde_tpu.ops.kernels import use_pallas
    if use_pallas():
        from ipde_tpu.ops import pallas_ds
        return pallas_ds.stokes_slp_apply(sx, sy, wfx, wfy, tx, ty)
    sx = jnp.asarray(sx)
    sy = jnp.asarray(sy)
    wfx = jnp.asarray(wfx)
    wfy = jnp.asarray(wfy)

    def chunk(cx, cy):
        dx = cx[:, None] - sx[None, :]
        dy = cy[:, None] - sy[None, :]
        r2 = dx * dx + dy * dy
        ilr = -0.5 * accurate_log(r2)
        ir2 = 1.0 / r2
        mm = kernel_matvec      # TPU-safe contraction (see ops/kernels.py)
        u = (mm(ilr + dx * dx * ir2, wfx) + mm(dx * dy * ir2, wfy)) / (4 * jnp.pi)
        v = (mm(dx * dy * ir2, wfx) + mm(ilr + dy * dy * ir2, wfy)) / (4 * jnp.pi)
        p = (mm(dx * ir2, wfx) + mm(dy * ir2, wfy)) / (2 * jnp.pi)
        return u, v, p

    T = jnp.asarray(tx).shape[0]
    from ipde_tpu.ops.kernels import _chunk_size
    csz = _chunk_size(T, int(sx.shape[0]))
    nch = -(-T // csz)
    pad = nch * csz - T
    txc = jnp.pad(jnp.asarray(tx), (0, pad)).reshape(nch, csz)
    tyc = jnp.pad(jnp.asarray(ty), (0, pad)).reshape(nch, csz)
    u, v, p = jax.lax.map(lambda ab: chunk(ab[0], ab[1]), (txc, tyc))
    return u.ravel()[:T], v.ravel()[:T], p.ravel()[:T]
