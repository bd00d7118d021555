"""Pallas double-single dense-apply kernels vs the exact f64 path.

Runs the kernels in interpret mode (same f32 instruction sequence the TPU
executes, minus hardware quirks) and checks against direct f64 sums.
Reference behavior: the dense quadrature applies that replace the
reference's FMM backends (SURVEY.md 2.2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ipde_tpu.ops import pallas_ds as pds


def _ds_round(x):
    """Round to double-single (hi+lo f32, ~48-bit) so the f64 reference
    sees exactly the coordinates the kernel sees; TPU f64 storage has the
    same 48-bit precision, so this isolates algorithmic error."""
    hi = x.astype(np.float32).astype(np.float64)
    lo = (x - hi).astype(np.float32).astype(np.float64)
    return hi + lo


def _cloud(T=700, S=300, seed=0, near=True):
    rng = np.random.default_rng(seed)
    sx = np.cos(2 * np.pi * np.arange(S) / S) * (1 + 0.05 * rng.standard_normal(S))
    sy = np.sin(2 * np.pi * np.arange(S) / S) * (1 + 0.05 * rng.standard_normal(S))
    r = 0.8 * np.sqrt(rng.uniform(0.01, 1, T))
    th = rng.uniform(0, 2 * np.pi, T)
    tx = r * np.cos(th)
    ty = r * np.sin(th)
    if near:
        # targets as close as the solver ever puts them (QFS sources sit
        # >= ~h from every target; at the largest bench h ~ 1e-3).  Below
        # ~1e-5 separation the 48-bit double-single COORDINATES themselves
        # limit dx to ~1e-15 absolute -- same for the XLA-f64-on-TPU path.
        k = min(32, T)
        tx[:k] = sx[:k] + 10.0 ** rng.uniform(-4, -2, k)
        ty[:k] = sy[:k] + 10.0 ** rng.uniform(-4, -2, k)
    q = rng.standard_normal(S) / S
    return (_ds_round(sx), _ds_round(sy), _ds_round(q),
            _ds_round(tx), _ds_round(ty))


def test_log_ds_accuracy():
    # _log_ds is pure jnp: evaluate directly on f32 ds pairs.  The bound
    # is the double-single representation floor |log| * 2^-47 (same
    # storage as XLA's emulated f64 on TPU) plus a small constant.
    r2 = np.concatenate([10.0 ** np.linspace(-26, 6, 4001),
                         1.0 + 1e-5 * np.linspace(-1, 1, 101)])
    hi = r2.astype(np.float32)
    lo = (r2 - hi.astype(np.float64)).astype(np.float32)
    oh, ol = pds._log_ds(jnp.asarray(hi), jnp.asarray(lo))
    got = np.asarray(oh, np.float64) + np.asarray(ol, np.float64)
    want = np.log(r2)
    bound = 2e-14 + np.abs(want) * 2.0 ** -47
    worst = (np.abs(got - want) / bound).max()
    assert worst < 1.0, f"worst ratio {worst}"


def test_laplace_slp_matches_f64():
    sx, sy, q, tx, ty = _cloud()
    got = np.asarray(pds.laplace_slp_apply(sx, sy, q, tx, ty,
                                           interpret=True))
    r2 = (tx[:, None] - sx) ** 2 + (ty[:, None] - sy) ** 2
    want = (-np.log(r2) @ q) / (4 * np.pi)
    assert np.abs(got - want).max() < 1e-12


def test_laplace_grad_matches_f64():
    sx, sy, q, tx, ty = _cloud(seed=1)
    gx, gy = pds.laplace_slp_grad_apply(sx, sy, q, tx, ty, interpret=True)
    dx = tx[:, None] - sx
    dy = ty[:, None] - sy
    ir2 = 1.0 / (dx * dx + dy * dy)
    wx = (-dx * ir2) @ q / (2 * np.pi)
    wy = (-dy * ir2) @ q / (2 * np.pi)
    # near-coincident rows have |grad| ~ 1e7: compare relative to row scale
    scale = np.maximum(1.0, np.abs(wx) + np.abs(wy))
    assert (np.abs(np.asarray(gx) - wx) / scale).max() < 1e-12
    assert (np.abs(np.asarray(gy) - wy) / scale).max() < 1e-12


def test_stokes_slp_matches_f64():
    sx, sy, qx, tx, ty = _cloud(seed=2)
    rng = np.random.default_rng(3)
    qy = rng.standard_normal(qx.shape[0]) / qx.shape[0]
    u, v, p = pds.stokes_slp_apply(sx, sy, qx, qy, tx, ty, interpret=True)
    dx = tx[:, None] - sx
    dy = ty[:, None] - sy
    r2 = dx * dx + dy * dy
    ilr = -0.5 * np.log(r2)
    ir2 = 1.0 / r2
    uu = ((ilr + dx * dx * ir2) @ qx + (dx * dy * ir2) @ qy) / (4 * np.pi)
    vv = ((dx * dy * ir2) @ qx + (ilr + dy * dy * ir2) @ qy) / (4 * np.pi)
    pp = ((dx * ir2) @ qx + (dy * ir2) @ qy) / (2 * np.pi)
    scale = np.maximum(1.0, np.abs(uu).max())
    assert np.abs(np.asarray(u) - uu).max() / scale < 1e-12
    assert np.abs(np.asarray(v) - vv).max() / scale < 1e-12
    pscale = np.maximum(1.0, np.abs(pp))
    assert (np.abs(np.asarray(p) - pp) / pscale).max() < 1e-12


def test_ds_sqrt_exp_building_blocks():
    x = np.concatenate([10.0 ** np.linspace(-12, 4, 1001),
                        np.linspace(0.5, 2.0, 101)])
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    sh, sl = pds._ds_sqrt(jnp.asarray(hi), jnp.asarray(lo))
    got = np.asarray(sh, np.float64) + np.asarray(sl, np.float64)
    rel = np.abs(got / np.sqrt(x) - 1.0)
    assert rel.max() < 1e-14, rel.max()
    z = np.linspace(0.0, 36.0, 2001)
    zh = z.astype(np.float32)
    zl = (z - zh.astype(np.float64)).astype(np.float32)
    eh, el = pds._ds_exp_neg(jnp.asarray(zh), jnp.asarray(zl))
    egot = np.asarray(eh, np.float64) + np.asarray(el, np.float64)
    # floor: d(e^-z)/e^-z = dz, and the ds input carries |z| 2^-48
    ebound = 5e-15 + np.abs(z) * 2.0 ** -47
    erel = np.abs(egot / np.exp(-z) - 1.0)
    assert (erel / ebound).max() < 1.0, (erel / ebound).max()


def test_k0_ds_accuracy():
    from scipy.special import k0 as scipy_k0
    z = np.concatenate([10.0 ** np.linspace(-8, 0.3, 1001),
                        np.linspace(0.5, 40.0, 2001)])
    zh = z.astype(np.float32)
    zl = (z - zh.astype(np.float64)).astype(np.float32)
    zds = zh.astype(np.float64) + zl.astype(np.float64)
    q = zds * zds / 4.0
    qh = q.astype(np.float32)
    ql = (q - qh.astype(np.float64)).astype(np.float32)
    oh, ol = pds._k0_ds(jnp.asarray(qh), jnp.asarray(ql),
                        jnp.asarray(zh), jnp.asarray(zl))
    got = np.asarray(oh, np.float64) + np.asarray(ol, np.float64)
    want = scipy_k0(zds)
    # bound: the dense-apply target is ~1e-14 absolute per term, plus the
    # double-single log floor |log q| 2^-47 at tiny z (z > 36 rounds to 0,
    # K0 there < 4e-17); identical floor to the XLA accurate_log path
    err = np.abs(got - np.where(zds > 36.0, 0.0, want))
    bound = 2e-14 + np.abs(np.log(zds * zds / 4.0)) * 2.0 ** -47
    assert (err / bound).max() < 1.0, (err / bound).max()


def test_mh_slp_matches_f64():
    from scipy.special import k0 as scipy_k0
    for k in (1.0, 20.0):
        sx, sy, q, tx, ty = _cloud(seed=5)
        got = np.asarray(pds.mh_slp_apply(sx, sy, q, tx, ty, k,
                                          interpret=True))
        r = np.sqrt((tx[:, None] - sx) ** 2 + (ty[:, None] - sy) ** 2)
        want = (scipy_k0(k * r) @ q) / (2 * np.pi)
        assert np.abs(got - want).max() < 1e-12, (k, np.abs(got - want).max())


def test_matches_existing_device_applies():
    """Same answers as the XLA-path applies the solvers currently use."""
    from ipde_tpu.ops import kernels as K
    from ipde_tpu.ops import stokes_kernels as SK
    sx, sy, q, tx, ty = _cloud(T=400, S=200, seed=4, near=False)
    a = np.asarray(K.laplace_slp_apply(sx, sy, q, tx, ty))
    b = np.asarray(pds.laplace_slp_apply(sx, sy, q, tx, ty, interpret=True))
    assert np.abs(a - b).max() < 1e-12
    u0, v0, p0 = SK.stokes_slp_apply(sx, sy, q, q[::-1], tx, ty)
    u1, v1, p1 = pds.stokes_slp_apply(sx, sy, q, q[::-1], tx, ty,
                                      interpret=True)
    assert np.abs(np.asarray(u0) - np.asarray(u1)).max() < 1e-12
    assert np.abs(np.asarray(v0) - np.asarray(v1)).max() < 1e-12
    assert np.abs(np.asarray(p0) - np.asarray(p1)).max() < 1e-12
