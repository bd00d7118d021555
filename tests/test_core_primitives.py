"""Unit tests for the kernel-layer primitives: matmul DFTs, Chebyshev ops,
GMRES, and spectral curves (reference test strategy: SURVEY.md section 4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ipde_tpu.geometry.curve import BoundaryCurve, arc_length_parameterize, circle, star
from ipde_tpu.ops.cx import Cx, from_np, to_np
from ipde_tpu.ops.fourier import FourierPlan1D, FourierPlan2D, spectral_diff_matrix_np
from ipde_tpu.ops.gmres import gmres
from ipde_tpu.utils.cheb import (ChebyshevOperators, chebyshev_gauss_nodes,
                                 fejer_1_weights, get_chebyshev_nodes)


def test_rfft_matches_numpy():
    rng = np.random.default_rng(0)
    for n in (16, 17, 64):
        plan = FourierPlan1D(n)
        x = rng.standard_normal((3, n))
        c = plan.rfft(jnp.asarray(x))
        ref = np.fft.rfft(x, axis=-1)
        np.testing.assert_allclose(to_np(c), ref, rtol=0, atol=1e-12)
        back = plan.irfft(c)
        np.testing.assert_allclose(np.asarray(back), x, atol=1e-13)


def test_spectral_derivative():
    n = 64
    plan = FourierPlan1D(n)
    t = np.arange(n) * 2 * np.pi / n
    f = np.exp(np.sin(t))
    df = np.cos(t) * f
    out = plan.tderiv(jnp.asarray(f))
    np.testing.assert_allclose(np.asarray(out), df, atol=1e-11)
    out2 = plan.tderiv2(jnp.asarray(f))
    d2f = (np.cos(t) ** 2 - np.sin(t)) * f
    np.testing.assert_allclose(np.asarray(out2), d2f, atol=1e-9)


def test_fft2_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((24, 32))
    for native in (False,):
        plan = FourierPlan2D(24, 32, native=native)
        c = plan.fft2(jnp.asarray(x))
        np.testing.assert_allclose(to_np(c), np.fft.fft2(x), atol=1e-11)
        back = plan.ifft2_real(c)
        np.testing.assert_allclose(np.asarray(back), x, atol=1e-13)


def test_rfft2_half_spectrum_matches_numpy():
    # both axis-plan kinds (direct: n < 256; four-step: n >= 256 composite),
    # odd and even column counts (the packed path pads a column)
    rng = np.random.default_rng(2)
    for nx, ny in [(24, 32), (320, 288), (288, 321)]:
        x = rng.standard_normal((nx, ny))
        plan = FourierPlan2D(nx, ny, native=False)
        nk = nx // 2 + 1
        ref = np.fft.fft2(x)[:nk]
        c = plan.rfft2(jnp.asarray(x))
        np.testing.assert_allclose(to_np(c), ref,
                                   atol=1e-11 * np.abs(ref).max())
        back = plan.irfft2_real(c)
        np.testing.assert_allclose(np.asarray(back), x, atol=1e-12)
        sym = np.hypot(np.fft.fftfreq(nx)[:, None],
                       np.fft.fftfreq(ny)[None, :])
        want = np.fft.ifft2(np.fft.fft2(x) * sym).real
        got = plan.solve_symbol_r(jnp.asarray(x), jnp.asarray(sym[:nk]))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-12)


def test_rfft2_prefix_odd_columns():
    # regression: FourStepFFT1D.rfft_packed padded the odd-column case with
    # a zeros((n, 1)) column, but prefix inputs have nz < n rows -- the
    # 2048^2 Stokes bench hit exactly this ((2020, 2099) vs (6144, 1)).
    rng = np.random.default_rng(7)
    for (nx, ny), (nzx, nzy) in [((384, 288), (130, 99)),
                                 ((320, 320), (101, 101)),
                                 ((24, 32), (10, 7))]:
        x = rng.standard_normal((nzx, nzy))
        plan = FourierPlan2D(nx, ny, native=False)
        xp = np.zeros((nx, ny))
        xp[:nzx, :nzy] = x
        ref = np.fft.fft2(xp)[: nx // 2 + 1]
        c = plan.rfft2(jnp.asarray(x))
        np.testing.assert_allclose(to_np(c), ref, atol=1e-11)


def test_irfft2_real_corner_truncation():
    # regression: four-step ifft_trunc returns ceil(n_out/n1)*n1 rows; the
    # y-pass must be sliced to ny_out before the x-pass or the corner output
    # has extra columns (advisor r2, high). (32, 288) with ny_out=125:
    # 288's four-step factor n1 does not divide 125.
    rng = np.random.default_rng(3)
    for (nx, ny), (nxo, nyo) in [((32, 288), (20, 125)),
                                 ((320, 288), (200, 125)),
                                 ((24, 32), (20, 30))]:
        x = rng.standard_normal((nx, ny))
        plan = FourierPlan2D(nx, ny, native=False)
        c = plan.rfft2(jnp.asarray(x))
        got = plan.irfft2_real_corner(c, nxo, nyo)
        assert got.shape == (nxo, nyo)
        np.testing.assert_allclose(np.asarray(got), x[:nxo, :nyo], atol=1e-12)


def test_fft2_solve_symbol_poisson():
    # periodic Poisson solve on [0, 2pi)^2
    n = 64
    t = np.arange(n) * 2 * np.pi / n
    X, Y = np.meshgrid(t, t, indexing="ij")
    u = np.sin(3 * X) * np.cos(2 * Y)
    f = -(9 + 4) * u  # lap u
    kx = np.fft.fftfreq(n, 1.0 / n)[:, None]
    ky = np.fft.fftfreq(n, 1.0 / n)[None, :]
    lap = -(kx**2) - ky**2
    lap[0, 0] = np.inf
    ilap = 1.0 / lap
    plan = FourierPlan2D(n, n)
    out = plan.solve_symbol(jnp.asarray(f), jnp.asarray(ilap))
    np.testing.assert_allclose(np.asarray(out), u, atol=1e-12)


def test_fejer_weights():
    for n in (8, 21, 50):
        x = chebyshev_gauss_nodes(n)
        w = fejer_1_weights(n)
        # integrates polynomials up to degree ~n-1 exactly on [-1, 1]
        np.testing.assert_allclose(w.sum(), 2.0, atol=1e-14)
        np.testing.assert_allclose((w * x**2).sum(), 2.0 / 3, atol=1e-13)
        np.testing.assert_allclose((w * x**5).sum(), 0.0, atol=1e-13)
        f = np.exp(x)
        np.testing.assert_allclose((w * f).sum(), np.e - 1 / np.e, atol=1e-12)


def test_chebyshev_operators():
    M = 16
    lb, ub = -0.3, 0.0
    _, r0, rat = get_chebyshev_nodes(lb, ub, M)
    _, r1, _ = get_chebyshev_nodes(lb, ub, M - 1)
    _, r2, _ = get_chebyshev_nodes(lb, ub, M - 2)
    CO = ChebyshevOperators(M, rat)
    f = np.exp(r0)
    np.testing.assert_allclose(CO.D01 @ f, np.exp(r1), atol=1e-11)
    np.testing.assert_allclose(CO.D12 @ (CO.D01 @ f), np.exp(r2), atol=1e-9)
    np.testing.assert_allclose(CO.R01 @ f, np.exp(r1), atol=1e-12)
    np.testing.assert_allclose(CO.R02 @ f, np.exp(r2), atol=1e-12)
    np.testing.assert_allclose(CO.P10 @ np.exp(r1), f, atol=1e-12)
    np.testing.assert_allclose((CO.ibc_dirichlet @ f)[0], np.exp(ub), atol=1e-12)
    np.testing.assert_allclose((CO.obc_dirichlet @ f)[0], np.exp(lb), atol=1e-12)
    np.testing.assert_allclose((CO.ibc_neumann @ f)[0], np.exp(ub), atol=1e-10)


def test_gmres_dense():
    rng = np.random.default_rng(2)
    n = 60
    A = np.eye(n) + 0.1 * rng.standard_normal((n, n))
    xex = rng.standard_normal(n)
    b = A @ xex
    Aj = jnp.asarray(A)
    res = gmres(lambda v: Aj @ v, jnp.asarray(b), tol=1e-14, maxiter=100,
                restart=25)
    np.testing.assert_allclose(np.asarray(res.x), xex, atol=1e-10)
    # with a (right) preconditioner: exact inverse -> 1-2 iterations
    Ainv = jnp.asarray(np.linalg.inv(A))
    res2 = gmres(lambda v: Aj @ v, jnp.asarray(b), precond=lambda v: Ainv @ v,
                 tol=1e-14, maxiter=100, restart=25)
    np.testing.assert_allclose(np.asarray(res2.x), xex, atol=1e-10)
    assert int(res2.iterations) <= 3


def test_curve_geometry():
    # circle: exact speed/normal/curvature
    c = circle(128, r=2.0)
    np.testing.assert_allclose(c.speed, 2.0, atol=1e-13)
    np.testing.assert_allclose(c.curvature, 0.5, atol=1e-12)
    # outward normal
    np.testing.assert_allclose(c.normal_x, c.x / 2.0, atol=1e-13)
    np.testing.assert_allclose(c.normal_y, c.y / 2.0, atol=1e-13)
    # weights integrate arclength
    np.testing.assert_allclose(c.weights.sum(), 4 * np.pi, atol=1e-12)
    # star curve: eval_position consistency
    s = star(256, a=0.2, f=5)
    x, y = s.eval_position(s.t[:10])
    np.testing.assert_allclose(x, s.x[:10], atol=1e-13)
    np.testing.assert_allclose(y, s.y[:10], atol=1e-13)


def test_arc_length_parameterize():
    s = star(256, a=0.2, f=3)
    r = arc_length_parameterize(s.x, s.y)
    assert np.abs(r.speed - r.speed.mean()).max() < 1e-8 * r.speed.mean()
    # total length preserved
    np.testing.assert_allclose(r.weights.sum(), s.weights.sum(), rtol=1e-10)


def test_normal_and_complex_offset():
    s = star(256, a=0.2, f=5)
    o = s.normal_offset(0.05)
    d = np.hypot(o.x - s.x, o.y - s.y)
    np.testing.assert_allclose(d, 0.05, atol=1e-14)
    # complex offset of a circle = scaled circle
    c = circle(128, r=1.0)
    co = c.complex_offset(0.1)
    rad = np.hypot(co.x, co.y)
    np.testing.assert_allclose(rad, np.exp(0.1), atol=1e-12)
