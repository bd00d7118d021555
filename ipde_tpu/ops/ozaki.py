"""Accurate f64 GEMM on TPU via error-free bf16 slice decomposition
(Ozaki-scheme matmul on the MXU).

Why this exists: the TPU's emulated-f64 ``dot_general`` is erratically
wrong at ~2^-24 absolute for kernel-matrix operands (ops/kernels.py:85-96;
the failure tracks operand exponent alignment).  That floors the device
QFS compose at ~7e-7 residual (measured, tools/qfs_decompose.py), while
the multiply+reduce workaround (device_linalg.exact_mm) streams the full
left operand once per output COLUMN -- terabytes of HBM traffic at
compose shapes.

Scheme (classic Ozaki error-free splitting, adapted to the ds-f64 TPU):

  1. Normalize rows of A (columns of B) by powers of two so every element
     lies in [-1, 1]: exact, and gives each row a COMMON fixed-point grid.
  2. Slice each normalized element's 48-bit double-single mantissa into
     SBITS-bit integer slices on that grid:  a = sum_p i_p 2^{-(p+1) SBITS}
     with |i_p| <= 2^SBITS.  The slicing loop is native f32 arithmetic
     (round / subtract of bit-subset values: exact).
  3. Partial products i_p(A) * i_q(B) are integers <= 2^{2 SBITS}; a
     k-term MXU dot of bf16 slices accumulates integers < k 2^{2 SBITS}
     in f32 -- EXACT while k 2^{2 SBITS} <= 2^24 (SBITS=5 -> k <= 16384).
  4. Recombine in f64: result = sum_{p+q <= PMAX} M_pq 2^{-(p+q+2) SBITS}
     scaled back by the row/col powers of two.  The dropped tail is below
     2^{-(PMAX+2) SBITS} relative to the row x col scale.

Accuracy: bounded by the double-single input floor (~2^-48 per element,
the same floor as every other f64 path on this chip) plus the truncation
tail ~ k 2^{-50}: measured 1e-13-scale absolute on bench-size kernel
matrices, vs 6e-7 for the emulated dot_general.

Cost: pairs with p + q <= PMAX and p, q < NSLICE = 79 bf16 MXU matmuls
at defaults (45 at the former PMAX=8 default) -- ~0.3 s for
(5400, 16200) x (16200, 5400) at v5e bf16 throughput, ~5000x less HBM
traffic than the column-scan exact_mm.

Reference analogue: none (the reference's LAPACK runs in hardware f64);
this is TPU-native infrastructure enabling device-side setup factorization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

import os

SBITS = 5          # slice bits: k 2^{2 SBITS} <= 2^24 for k <= 16384
NSLICE = int(os.environ.get("IPDE_OZAKI_NSLICE", "10"))
# 10 x 5 = 50 bits >= the 48-bit double-single mantissa
PMAX = int(os.environ.get("IPDE_OZAKI_PMAX", "12"))
# keep pairs p + q <= PMAX.  The dropped tail is the DOMINANT error term
# for large-norm operands (QFS maps, |M| ~ 1e5): at PMAX=8 the device
# compose refine-stalled at ~5e-10 matrix residual (6.6e-9 applied,
# tools/qfs_decompose.py nb=600); PMAX=12 reaches 5e-12 / 3.2e-11 --
# equal to the exact column-scan products -- for 79 vs 45 bf16 matmuls.


def _pow2_scales(m):
    """Per-row power-of-two scale R with |m| <= R, as an exact f64 array.

    frexp is unavailable/untrusted in emulated f64; exponents are derived
    from log2 with a one-ulp guard and verified by construction (R >= max
    enforced with a where)."""
    mx = jnp.max(jnp.abs(m), axis=1)
    mx = jnp.where(mx > 0, mx, 1.0)
    e = jnp.ceil(jnp.log2(mx) + 1e-9)
    # exp2 in emulated f64 is approximate (~1e-10 rel): an inexact R makes
    # the normalization multiply inexact and silently spends slice bits on
    # noise.  f32 exp2 of an INTEGER is exact (and exactly converts to
    # f64/double-single); scales beyond f32's exponent range don't occur in
    # kernel matrices (guarded by the clamp + R >= mx check below).
    e = jnp.clip(e, -126.0, 127.0)
    R = jnp.exp2(e.astype(jnp.float32)).astype(m.dtype)
    # guard: log2 in emulated f64 is approximate; enforce mx <= R <= 2 mx
    R = jnp.where(R < mx, R * 2.0, R)
    R = jnp.where(R > 2.0 * mx, R * 0.5, R)
    return R


def _slices(An):
    """48-bit double-single mantissa of normalized |An| <= 1 as NSLICE
    SBITS-bit integer slices (f32 arrays holding exact small integers):
    An = sum_p slices[p] * 2^{-(p+1) SBITS} + O(2^{-NSLICE*SBITS})."""
    hi = An.astype(jnp.float32)
    lo = (An - hi.astype(jnp.float64)).astype(jnp.float32)
    out = []
    c = hi
    lo_folded = False
    for p in range(NSLICE):
        scale = np.float32(2.0 ** ((p + 1) * SBITS))
        t = jnp.round(c * scale)
        out.append(t)
        c = c - t * np.float32(2.0 ** (-(p + 1) * SBITS))
        if not lo_folded and (p + 1) * SBITS >= 25:
            # hi's 24-bit mantissa is exhausted; residue continues in lo
            c = c + lo
            lo_folded = True
    return out


@functools.partial(jax.jit, static_argnames=("pmax",))
def _ozaki_mm_impl(A, B, pmax: int):
    R = _pow2_scales(A)                      # (m,)
    C = _pow2_scales(B.T)                    # (n,)
    An = A * (1.0 / R)[:, None]
    Bn = B * (1.0 / C)[None, :]
    asl = _slices(An)
    bsl = _slices(Bn.T)                      # sliced along rows of B^T
    acc = jnp.zeros(A.shape[:1] + B.shape[1:], jnp.float64)
    for p in range(min(NSLICE, pmax + 1)):
        ab = asl[p].astype(jnp.bfloat16)
        for q in range(min(NSLICE, pmax + 1 - p)):
            Mpq = jnp.matmul(ab, bsl[q].astype(jnp.bfloat16).T,
                             preferred_element_type=jnp.float32)
            acc = acc + Mpq.astype(jnp.float64) \
                * (2.0 ** (-(p + q + 2) * SBITS))
    return acc * R[:, None] * C[None, :]


KMAX = 16384       # exact-f32-accumulation bound: k 2^{2 SBITS} <= 2^24


def ozaki_mm(A, B, pmax: int = PMAX):
    """Accurate A @ B for f64 matrices on TPU (see module docstring).

    Falls back to a plain HIGHEST-precision matmul off-TPU (hardware f64
    is exact there).  Contractions beyond the 16384-term exact-f32-
    accumulation bound are split into k-chunks whose partial results add
    in f64 (one 2^-48-scale rounding per chunk -- negligible)."""
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    if jax.default_backend() != "tpu":
        return jnp.matmul(A, B, precision=jax.lax.Precision.HIGHEST)
    k = A.shape[1]
    if k <= KMAX:
        return _ozaki_mm_impl(A, B, pmax)
    nchunk = -(-k // KMAX)
    kc = -(-k // nchunk)
    acc = None
    for c in range(nchunk):
        lo, hi = c * kc, min((c + 1) * kc, k)
        part = _ozaki_mm_impl(A[:, lo:hi], B[lo:hi], pmax)
        acc = part if acc is None else acc + part
    return acc
