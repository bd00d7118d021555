"""Ozaki error-free-slice GEMM (ops/ozaki.py): correctness of the slice
decomposition and recombination, run on CPU (the TPU dispatch path is the
same jitted program; hardware validation lives in tools/qfs_decompose.py
and tools/exactmm_probe.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ipde_tpu.ops.ozaki import NSLICE, SBITS, _ozaki_mm_impl, _slices, ozaki_mm


def test_slices_reconstruct():
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (40, 64))
    sl = _slices(jnp.asarray(x))
    acc = np.zeros_like(x)
    for p, s in enumerate(sl):
        s = np.asarray(s, np.float64)
        assert np.all(np.abs(s) <= 2.0 ** SBITS)
        assert np.all(s == np.round(s)), "slices must be exact integers"
        acc += s * 2.0 ** (-(p + 1) * SBITS)
    assert np.abs(acc - x).max() < 2.0 ** (-NSLICE * SBITS + 2)


@pytest.mark.parametrize("spread", [0, 6])
def test_ozaki_matches_f64(spread):
    rng = np.random.default_rng(0)
    m, k, n = 120, 500, 90
    A = -np.log(rng.uniform(1e-8, 4.0, (m, k)))
    B = rng.standard_normal((k, n)) / k
    if spread:
        A *= np.exp(rng.normal(0, spread, (m, 1)))
        B *= np.exp(rng.normal(0, spread, (1, n)))
    ref = A @ B
    out = np.asarray(_ozaki_mm_impl(jnp.asarray(A), jnp.asarray(B), 8))
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    # CPU reference carries 53-bit inputs vs the 48-bit double-single
    # slicing floor; ~2^-48 * k growth
    assert rel < 3e-12, rel


def test_ozaki_edges():
    rng = np.random.default_rng(1)
    m, k, n = 33, 257, 41
    A = rng.standard_normal((m, k))
    B = rng.standard_normal((k, n))
    A[0] = 0.0                       # zero row (scale guard)
    B[:, 0] = 0.0                    # zero column
    A[1] = np.arange(k) % 7          # small integers: exactly sliceable
    B[:, 1] = 1.0
    ref = A @ B
    out = np.asarray(_ozaki_mm_impl(jnp.asarray(A), jnp.asarray(B), 8))
    assert np.abs(out[0]).max() == 0.0
    assert np.abs(out[:, 0]).max() == 0.0
    # integer row x ones column is exactly representable
    assert abs(out[1, 1] - ref[1, 1]) < 1e-9 * abs(ref[1, 1])
    assert np.abs(out - ref).max() / np.abs(ref).max() < 3e-12


def test_ozaki_blocked_contraction():
    """k > KMAX splits into chunks whose partials add in f64; the split
    must be invisible (CPU runs the plain-matmul fallback, so this pins
    the chunking arithmetic through _ozaki_mm_impl directly)."""
    from ipde_tpu.ops.ozaki import KMAX
    rng = np.random.default_rng(2)
    m, n = 8, 8
    k = 700
    A = rng.standard_normal((m, k))
    B = rng.standard_normal((k, n)) / k
    ref = A @ B
    kc = 256  # emulate the chunking at a test-friendly bound
    acc = None
    for lo in range(0, k, kc):
        part = np.asarray(_ozaki_mm_impl(jnp.asarray(A[:, lo:lo + kc]),
                                         jnp.asarray(B[lo:lo + kc]), 8))
        acc = part if acc is None else acc + part
    assert np.abs(acc - ref).max() / np.abs(ref).max() < 3e-12
    # and the public entry point handles k > KMAX without raising
    out = ozaki_mm(jnp.zeros((4, KMAX + 16)), jnp.zeros((KMAX + 16, 3)))
    assert out.shape == (4, 3)
