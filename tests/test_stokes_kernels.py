"""Stokes layer-potential kernel tests via Gauss and Lorentz-Green
identities (reference test strategy: SURVEY.md section 4)."""

import numpy as np

from ipde_tpu.geometry.curve import star
from ipde_tpu.ops import stokes_kernels as sk


def test_stokes_gauss_identities():
    c = star(400, a=0.2, f=5)
    N = c.N
    q = np.concatenate([np.ones(N), np.zeros(N)])
    v_in = sk.stokes_dlp_naive(c, np.array([0.1]), np.array([0.05])) @ q
    np.testing.assert_allclose(v_in, [-1.0, 0.0], atol=1e-12)
    v_out = sk.stokes_dlp_naive(c, np.array([2.5]), np.array([0.1])) @ q
    np.testing.assert_allclose(v_out, [0.0, 0.0], atol=1e-12)
    v_pv = sk.stokes_dlp_self(c) @ q
    np.testing.assert_allclose(v_pv[:N], -0.5, atol=1e-12)
    np.testing.assert_allclose(v_pv[N:], 0.0, atol=1e-12)
    p_in = sk.stokes_dlp_pressure_naive(c, np.array([0.1]), np.array([0.05])) @ q
    np.testing.assert_allclose(p_in, 0.0, atol=1e-12)


def test_stokes_green_identity():
    """Homogeneous Stokes flow u=(y^2, 0), p=2x: SLP[t]-DLP[u] = u/2 on the
    curve, = u inside; same for pressure."""
    c = star(400, a=0.2, f=5)
    N = c.N
    u, v, p = c.y**2, np.zeros(N), 2 * c.x
    tx = -p * c.normal_x + 2 * c.y * c.normal_y
    ty = 2 * c.y * c.normal_x - p * c.normal_y
    t_pack = np.concatenate([tx, ty])
    u_pack = np.concatenate([u, v])
    lhs = sk.stokes_slp_self(c) @ t_pack - sk.stokes_dlp_self(c) @ u_pack
    np.testing.assert_allclose(lhs, u_pack / 2, atol=1e-12)
    xi, yi = np.array([0.2]), np.array([-0.3])
    vi = (sk.stokes_slp_naive(c, xi, yi) @ t_pack
          - sk.stokes_dlp_naive(c, xi, yi) @ u_pack)
    np.testing.assert_allclose(vi, [yi[0]**2, 0.0], atol=1e-12)
    pi = (sk.stokes_slp_pressure_naive(c, xi, yi) @ t_pack
          - sk.stokes_dlp_pressure_naive(c, xi, yi) @ u_pack)
    np.testing.assert_allclose(pi, [2 * xi[0]], atol=1e-12)


def test_stokes_apply_matches_form():
    import jax.numpy as jnp
    c = star(200, a=0.1, f=3)
    rng = np.random.default_rng(0)
    fx, fy = rng.standard_normal(c.N), rng.standard_normal(c.N)
    tx = rng.uniform(-0.5, 0.5, 300)
    ty = rng.uniform(-0.5, 0.5, 300)
    u, v, p = sk.stokes_slp_apply(c.x, c.y, fx * c.weights, fy * c.weights,
                                  jnp.asarray(tx), jnp.asarray(ty))
    A = sk.stokes_slp_naive(c, tx, ty)
    want = A @ np.concatenate([fx, fy])
    np.testing.assert_allclose(np.asarray(u), want[:300], atol=1e-12)
    np.testing.assert_allclose(np.asarray(v), want[300:], atol=1e-12)
    P = sk.stokes_slp_pressure_naive(c, tx, ty)
    np.testing.assert_allclose(np.asarray(p),
                               P @ np.concatenate([fx, fy]), atol=1e-12)
