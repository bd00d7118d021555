"""Singular quadrature + QFS accuracy tests.

Strategy: Green's representation identities give exact on-surface values for
known PDE solutions; fine upsampled native quadrature gives exact near-curve
references for QFS (reference test strategy: SURVEY.md section 4)."""

import numpy as np
from scipy.special import k0, k1

from ipde_tpu.geometry.curve import star
from ipde_tpu.ops import singular as sq
from ipde_tpu.qfs.qfs import laplace_qfs, mh_qfs


def _upsampled_eval(form_naive, curve, tx, ty, dens, factor=64, **kw):
    """Reference: evaluate a layer potential at (tx, ty) with upsampled
    native quadrature (valid at distance >~ 2 fine-h from the curve)."""
    fine = curve.resampled(factor * curve.N)
    # Fourier upsample the density
    dh = np.fft.fft(dens)
    dfh = np.zeros(factor * curve.N, dtype=complex)
    h = curve.N // 2
    dfh[:h] = dh[:h]
    dfh[-h:] = dh[-h:]
    dfine = np.fft.ifft(dfh).real * factor
    A = form_naive(fine, tx, ty, **kw)
    return A @ dfine


def test_gauss_identity_laplace_dlp():
    c = star(256, a=0.2, f=5)
    ones = np.ones(c.N)
    # interior point
    v_in = (sq.laplace_dlp_naive(c, np.array([0.1]), np.array([0.05])) @ ones)[0]
    np.testing.assert_allclose(v_in, -1.0, atol=1e-12)
    # exterior point
    v_out = (sq.laplace_dlp_naive(c, np.array([2.5]), np.array([0.1])) @ ones)[0]
    np.testing.assert_allclose(v_out, 0.0, atol=1e-12)
    # principal value on surface
    v_pv = sq.laplace_dlp_self(c) @ ones
    np.testing.assert_allclose(v_pv, -0.5, atol=1e-12)


def test_greens_identity_laplace():
    """u harmonic inside: SLP[du/dn] - DLP[u] = u/2 on the curve (PV)."""
    c = star(300, a=0.2, f=5)
    z = c.x + 1j * c.y
    u = np.real(z**3)
    gu = 3 * z**2  # du/dx - i du/dy = f'(z) conj trick: grad of Re f
    ux, uy = np.real(gu), -np.imag(gu)
    un = ux * c.normal_x + uy * c.normal_y
    lhs = sq.laplace_slp_self(c) @ un - sq.laplace_dlp_self(c) @ u
    np.testing.assert_allclose(lhs, u / 2, atol=1e-12)


def _mh_exact_from_ring(c, k, offset=0.1):
    """Exact (k^2-lap)u=0 field inside c: sum of K0 sources on a nearby
    exterior offset curve (keeps the dynamic range of u along c bounded so
    relative error is meaningful at large k)."""
    ring = c.normal_offset(offset)
    q = np.cos(3 * ring.t) + 1.5
    dx = c.x[:, None] - ring.x[None, :]
    dy = c.y[:, None] - ring.y[None, :]
    r = np.hypot(dx, dy)
    u = (k0(k * r) @ q) / (2 * np.pi)
    kern = -k * k1(k * r) / (2 * np.pi)
    un = ((kern * (dx * c.normal_x[:, None] + dy * c.normal_y[:, None]) / r)
          @ q)
    return u, un


def test_greens_identity_mh():
    """(k^2 - lap)u = 0 inside: SLP[du/dn] - DLP[u] = u/2 on the curve."""
    # thresholds track the resolution requirement N ~ k * L / pi plus the
    # test field's own spectral content (ring sources at distance 0.1)
    for k, N, tol in ((1.0, 400, 5e-12), (10.0, 800, 5e-10),
                      (10.0, 1600, 1e-12), (50.0, 1600, 3e-6)):
        c = star(N, a=0.2, f=5)
        u, un = _mh_exact_from_ring(c, k)
        lhs = sq.mh_slp_self(c, k) @ un - sq.mh_dlp_self(c, k) @ u
        err = np.abs(lhs - u / 2).max() / np.abs(u).max()
        assert err < tol, f"MH Green identity k={k}: rel err {err:.2e}"


def test_qfs_near_boundary_eval():
    """QFS effective sources reproduce SLP+DLP arbitrarily close to the curve."""
    c = star(300, a=0.2, f=5)
    h = c.max_h()
    tau = np.exp(np.sin(c.t)) * np.cos(2 * c.t)
    sig = np.cos(3 * c.t) + 0.5
    # interior-side evaluation: sources shifted outward
    src = c.resampled(2 * c.N).complex_offset(3 * 2 * np.pi / c.N)
    q = laplace_qfs(c, src, interior=True, slp=True, dlp=True)
    xi = np.asarray(q([sig, tau]))
    # targets: very close to the curve (h/5 inside) and moderately inside
    for dist in (0.2, 2 * h, 0.2 * h):
        tx = c.x - dist * c.normal_x
        ty = c.y - dist * c.normal_y
        qfs_vals = sq.laplace_slp_naive(src, tx, ty) @ xi
        ref = (_upsampled_eval(sq.laplace_slp_naive, c, tx, ty, sig)
               + _upsampled_eval(sq.laplace_dlp_naive, c, tx, ty, tau))
        err = np.abs(qfs_vals - ref).max()
        assert err < 1e-10, f"laplace qfs at dist {dist:.2e}: err {err:.2e}"


def test_qfs_u2s():
    """u2s: given boundary values of a field smooth on the evaluation side,
    find effective sources reproducing it there."""
    c = star(300, a=0.2, f=5)
    # field harmonic INSIDE: u = Re((z/2)^4)
    z = c.x + 1j * c.y
    u_b = np.real((0.5 * z) ** 4)
    src = c.resampled(2 * c.N).complex_offset(3 * 2 * np.pi / c.N)
    q = laplace_qfs(c, src, interior=True)
    xi = np.asarray(q.u2s(u_b))
    # evaluate inside
    tx = 0.6 * c.x
    ty = 0.6 * c.y
    vals = sq.laplace_slp_naive(src, tx, ty) @ xi
    zi = tx + 1j * ty
    exact = np.real((0.5 * zi) ** 4)
    np.testing.assert_allclose(vals, exact, atol=1e-11)


def test_qfs_mh():
    c = star(300, a=0.2, f=5)
    k = 5.0
    h = c.max_h()
    tau = np.cos(c.t) + 0.2 * np.sin(3 * c.t)
    sig = np.exp(np.cos(c.t))
    src = c.resampled(2 * c.N).complex_offset(3 * 2 * np.pi / c.N)
    q = mh_qfs(c, src, interior=True, k=k)
    xi = np.asarray(q([sig, tau]))
    for dist in (2 * h, 0.2 * h):
        tx = c.x - dist * c.normal_x
        ty = c.y - dist * c.normal_y
        qfs_vals = sq.mh_slp_naive(src, tx, ty, k) @ xi
        ref = (_upsampled_eval(sq.mh_slp_naive, c, tx, ty, sig, k=k)
               + _upsampled_eval(sq.mh_dlp_naive, c, tx, ty, tau, k=k))
        err = np.abs(qfs_vals - ref).max()
        assert err < 2e-9, f"mh qfs at dist {dist:.2e}: err {err:.2e}"
