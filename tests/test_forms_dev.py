"""Device-formed dense matrices must equal the numpy builders (CPU exact)."""

import numpy as np

from ipde_tpu.geometry.curve import star
from ipde_tpu.ops import forms_dev as fd
from ipde_tpu.ops import singular as sq
from ipde_tpu.ops import stokes_kernels as sk


def _curves():
    c = star(128, a=0.15, f=4)
    s = star(96, a=0.1, f=3, r=1.4)
    tx = 1.9 * np.cos(np.linspace(0, 2 * np.pi, 37))
    ty = 1.9 * np.sin(np.linspace(0, 2 * np.pi, 37))
    return c, s, tx, ty


def test_naive_forms_match():
    c, s, tx, ty = _curves()
    pairs = [
        (fd.laplace_slp_naive_dev(s, tx, ty), sq.laplace_slp_naive(s, tx, ty)),
        (fd.laplace_dlp_naive_dev(s, tx, ty), sq.laplace_dlp_naive(s, tx, ty)),
        (fd.mh_slp_naive_dev(s, tx, ty, 2.5), sq.mh_slp_naive(s, tx, ty, 2.5)),
        (fd.mh_dlp_naive_dev(s, tx, ty, 2.5), sq.mh_dlp_naive(s, tx, ty, 2.5)),
        (fd.stokes_slp_naive_dev(s, tx, ty), sk.stokes_slp_naive(s, tx, ty)),
        (fd.stokes_dlp_naive_dev(s, tx, ty), sk.stokes_dlp_naive(s, tx, ty)),
    ]
    for got, want in pairs:
        scale = np.abs(want).max()
        assert np.abs(np.asarray(got) - want).max() < 1e-12 * scale


def test_self_forms_match():
    c, _, _, _ = _curves()
    pairs = [
        (fd.laplace_slp_self_dev(c), sq.laplace_slp_self(c)),
        (fd.laplace_dlp_self_dev(c), sq.laplace_dlp_self(c)),
        (fd.laplace_slp_normal_self_dev(c), sq.laplace_slp_normal_self(c)),
        (fd.stokes_slp_self_dev(c), sk.stokes_slp_self(c)),
        (fd.stokes_dlp_self_dev(c), sk.stokes_dlp_self(c)),
    ]
    for got, want in pairs:
        scale = np.abs(want).max()
        assert np.abs(np.asarray(got) - want).max() < 1e-12 * scale


def test_pressure_fix_matches():
    c, _, _, _ = _curves()
    got = fd.stokes_pressure_fix_dev(c, c.normal_x, c.normal_y)
    want = sk.stokes_pressure_fix(c, c.normal_x, c.normal_y)
    assert np.abs(np.asarray(got) - want).max() < 1e-13


def test_rule36_filters_match():
    rng = np.random.default_rng(0)
    n = 64
    B = rng.standard_normal((2 * n, 3 * n))
    from ipde_tpu.qfs.qfs import _filter_rows, _filter_cols
    got = np.asarray(fd.filter_rows_dev(B, n))
    want = _filter_rows(B, n)
    np.testing.assert_allclose(got, want, atol=1e-13)
    got = np.asarray(fd.filter_cols_dev(B, n))
    want = _filter_cols(B, n)
    np.testing.assert_allclose(got, want, atol=1e-13)
