"""Fused double-single (hi/lo f32) Pallas TPU kernels for the dense
layer-potential applies (VERDICT r2 item 1: the first real Pallas kernels,
replacing the XLA-emulated-f64 chunked applies in ops/kernels.py /
ops/stokes_kernels.py on the hot path).

Why double-single: Mosaic (Pallas TPU) has no f64.  XLA's own f64 on this
chip is ALREADY a hi+lo-f32 ("double-single", ~2^-48) emulation, but it
emulates every intermediate at full generality and materializes chunked
(T, S) f64 intermediates through HBM.  Here the whole pairwise kernel is
one VMEM-resident Pallas program in explicit double-single arithmetic:
per (target-tile, source) step all (8,256) intermediates live in
registers/VMEM, and the only HBM traffic is targets in / sums out, i.e.
O(T + S) instead of O(T*S).

Accuracy: the log kernel is computed exp/seed-free via exponent extraction
(integer bit ops) + an atanh-series in double-single, giving ~1e-14
absolute on log(r2) -- measured against mpmath on [1e-30, 1e6] (see
tests/test_pallas_ds.py).  This dodges both TPU-f64 pitfalls recorded in
the project notes: the ~1.4e-10 f64 transcendentals and the erratic
2^-24-scale dot_general (no MXU contraction appears at all; each target
accumulates in place in its own lane, so no cross-lane reduction exists
either).

Exactness requirements on the hardware: f32 add/sub/mul must be IEEE
round-to-nearest, and the compiler must not contract a*b +/- c into an
fma (which would break the error-free transforms).  The Dekker split is
implemented with integer mantissa masking (bitcast + and), which is
contraction-proof; two_sum uses only adds/subs.  A correctness test vs
the XLA f64 path guards this assumption per backend.

Reference parity: these produce the same sums as the dense quadrature
applies replacing the reference's FMM backends (SURVEY.md 2.2:
pyfmmlib2d/fmm2dpy/flexmm rows; reference call sites
ipde/solvers/internals/scalar.py:87-113).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = jnp.float32
i32 = jnp.int32

# ---------------------------------------------------------------------------
# double-single primitives on f32 arrays (error-free transforms)
# ---------------------------------------------------------------------------

def _two_sum(a, b):
    """a + b = s + e exactly (Knuth; 6 flops, adds only)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _fast_two_sum(a, b):
    """a + b = s + e exactly, REQUIRES |a| >= |b| (3 flops)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    """Dekker split via mantissa masking (contraction-proof): a = hi + lo
    with hi carrying the top 12 mantissa bits, both halves exact."""
    bits = jax.lax.bitcast_convert_type(a, i32)
    hi = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(bits, jnp.int32(-4096)), f32)  # ~0xFFF = -4096
    return hi, a - hi


def _split_const(c: float):
    """Host-side Dekker split of an f32-representable constant: Mosaic's
    tpu.bitcast only accepts vectors, so the in-kernel _split cannot be
    fed a scalar constant -- and for a trace-time-known float the split
    is itself a pair of trace-time constants."""
    import numpy as _np
    cf = _np.float32(c)
    hi = _np.int32(cf.view(_np.int32) & _np.int32(-4096)).view(_np.float32)
    return float(hi), float(cf - hi)


def _two_prod_c(a, c: float):
    """a * c for an f32-exact scalar constant c: the constant's split
    pieces are host floats (exact 12-bit mantissas), so every product
    below is exact and contraction-immune exactly as in _two_prod."""
    ah, al = _split(a)
    ch, cl = _split_const(c)
    p0, t0 = _two_sum(ah * f32(ch), ah * f32(cl))
    p1, t1 = _two_sum(p0, al * f32(ch))
    return p1, (t0 + t1) + al * f32(cl)


def _two_prod(a, b):
    """a * b = p + e, accurate to ~2^-46 relative, CONTRACTION-IMMUNE.

    XLA contracts mul+add into fma inside fusions with broadcast
    operands (measured on XLA:CPU; independent of fast-math flags, and
    jax.lax.optimization_barrier does NOT stop it).  fma(a, b, t)
    differs from fl(fl(a*b) + t) by up to 1 ulp of a*b, which silently
    breaks classic Dekker two_prod AND any downstream two_sum fed by a
    raw product.  Rule enforced throughout this module: ONLY
    EXACTLY-REPRESENTABLE PRODUCTS MAY FEED AN ADD -- then contraction
    is value-neutral by construction.  All split-piece products here
    are <= 24-bit (12-bit x 12-bit mantissas), hence exact."""
    ah, al = _split(a)
    bh, bl = _split(b)
    p0, t0 = _two_sum(ah * bh, ah * bl)     # exact products into exact sum
    p1, t1 = _two_sum(p0, al * bh)          # exact product
    return p1, (t0 + t1) + al * bl          # small corrections: fl is fine


def _ds_add(ah, al, bh, bl):
    sh, se = _two_sum(ah, bh)
    return _fast_two_sum(sh, se + (al + bl))


def _ds_sub(ah, al, bh, bl):
    return _ds_add(ah, al, -bh, -bl)


def _ds_mul(ah, al, bh, bl):
    ph, pe = _two_prod(ah, bh)
    # cross terms are ~2^-24-scale corrections: contraction harmless
    return _fast_two_sum(ph, pe + (ah * bl + al * bh))


def _ds_sqr(ah, al):
    h, l = _split(ah)
    p0, t0 = _two_sum(h * h, 2.0 * (h * l))  # both products exact
    pe = (t0 + l * l) + 2.0 * (ah * al)      # corrections: fl is fine
    return _fast_two_sum(p0, pe)


def _ds_recip(bh, bl):
    q1 = 1.0 / bh
    th, tl = _two_prod(q1, bh)
    # e = 1 - q1*b  (1 - th is exact: th ~ 1, Sterbenz)
    e = ((1.0 - th) - tl) - q1 * bl
    return _fast_two_sum(q1, q1 * e)


def _ds_div(ah, al, bh, bl):
    q1 = ah / bh
    th, tl = _two_prod(q1, bh)
    # r = a - q1*b in ds, then one more quotient digit
    rh, rl = _ds_add(ah, al, -th, -tl)
    q2 = (rh + (rl - q1 * bl)) / bh
    return _fast_two_sum(q1, q2)


def _ds_scale(ah, al, c: float):
    """Multiply by an exactly-representable f32 constant (power of two or
    small rational with short mantissa): exact."""
    return ah * f32(c), al * f32(c)


# Whether _cbar wraps constants in an optimization_barrier.  True for the
# interpret path (the kernel jaxpr runs through XLA, whose algebraic
# simplifier needs blocking); False when lowering to real TPU Pallas:
# Mosaic has no optimization_barrier lowering, and as an MLIR pipeline it
# does not apply value-changing FP rewrites like (c + x) - c -> x outside
# fast-math (the hardware accuracy suite in tools/pallas_probe.py pins
# this assumption against exact-f64 references on every run).
_BARRIER = True


def _cbar(c: float, like):
    """A scalar constant as a compiler-opaque array.

    XLA's algebraic simplifier rewrites (const + x) - const -> x (and
    kin) when one operand is a literal, which silently zeroes the
    compensation term of any error-free transform involving a constant
    (measured: two_sum(1.0, -x) under jit returns e wrong by 2^-25).
    An optimization_barrier around the broadcast constant blocks the
    HLO-level rewrite (unlike LLVM fma contraction, which barriers do
    NOT block -- that one is handled structurally in _two_prod)."""
    cc = jnp.full(like.shape, f32(c))
    if _BARRIER:
        cc = jax.lax.optimization_barrier(cc)
    return cc


def _ds_const(x: float):
    """Split a python float into an f32 ds pair (host-side numpy: jnp
    scalar constructors stage to tracers inside an active jit trace)."""
    import numpy as _np
    hi = float(_np.float32(x))
    lo = float(_np.float32(x - hi))
    return hi, lo


# ---------------------------------------------------------------------------
# log(r2) in double-single, exp-free
# ---------------------------------------------------------------------------

_LN2_H, _LN2_L = _ds_const(math.log(2.0))
# third piece of ln2 (below f32 in the ds constant): fold into lo on the fly
_LN2_L2 = float(math.log(2.0) - _LN2_H - _LN2_L)
_SQRT2 = float(math.sqrt(2.0))
# atanh-series coefficients 1/(2n+3) as ds pairs for the head terms
_C3 = _ds_const(1.0 / 3.0)
_C5 = _ds_const(1.0 / 5.0)
_C7 = _ds_const(1.0 / 7.0)


def _log_ds(r2h, r2l):
    """log(r2) for a ds input (r2h >= 1e-30 assumed pre-clamped).

    Algorithm: r2h = m 2^k with m in [1/sqrt2, sqrt2) via exponent bit
    extraction; log m by the atanh series in t = (m-1)/(m+1) (|t| <=
    0.1716, t^2 <= 0.0295) with the first three series coefficients in
    double-single and the tail in f32; the lo part enters as
    log1p(r2l/r2h) ~ d - d^2/2 in f32 (|d| < 6e-8).  Accuracy: the
    double-single representation floor |log r2| * 2^-47 (measured <=
    2.5e-13 over r2 in [1e-26, 1e6]); below r2 ~ 1e-31 the r2l part is
    a subnormal f32 that flush-to-zero hardware drops, costing up to
    ~6e-8 relative on r2 -- irrelevant here since quadrature sources
    stay >= h/2 from every target.  No transcendental instruction is
    used anywhere.
    """
    bits = jax.lax.bitcast_convert_type(r2h, i32)
    e = jnp.right_shift(bits, 23) - 127          # unbiased exponent
    mbits = jnp.bitwise_or(jnp.bitwise_and(bits, jnp.int32(0x007FFFFF)),
                           jnp.int32(0x3F800000))
    m = jax.lax.bitcast_convert_type(mbits, f32)          # [1, 2)
    big = m > _SQRT2
    m = jnp.where(big, 0.5 * m, m)                        # [0.7071, 1.4142)
    kf = (e + big.astype(i32)).astype(f32)

    # t = (m - 1) / (m + 1) in ds; m - 1 is exact (Sterbenz); the
    # constant 1 must be opaque or the simplifier kills two_sum (_cbar)
    one = _cbar(1.0, m)
    dh, dl = _two_sum(m, one)
    th, tl = _ds_div(m - one, jnp.zeros_like(m), dh, dl)
    t2h, t2l = _ds_sqr(th, tl)

    # tail in f32: 1/9 + t2 (1/11 + t2 (1/13 + t2 (1/15 + t2/17)))
    tail = f32(1.0 / 9.0) + t2h * (
        f32(1.0 / 11.0) + t2h * (f32(1.0 / 13.0) + t2h * (
            f32(1.0 / 15.0) + t2h * f32(1.0 / 17.0))))
    sh, sl = _ds_add(_cbar(_C7[0], m), f32(_C7[1]),
                     *_ds_mul(t2h, t2l, tail, jnp.zeros_like(tail)))
    sh, sl = _ds_add(_cbar(_C5[0], m), f32(_C5[1]),
                     *_ds_mul(t2h, t2l, sh, sl))
    sh, sl = _ds_add(_cbar(_C3[0], m), f32(_C3[1]),
                     *_ds_mul(t2h, t2l, sh, sl))
    # log m = 2t + 2 t t2 s
    uh, ul = _ds_mul(t2h, t2l, sh, sl)
    vh, vl = _ds_mul(uh, ul, th, tl)
    wh, wl = _ds_add(th, tl, vh, vl)
    logm_h, logm_l = 2.0 * wh, 2.0 * wl

    # k ln2 in ds: exact product with the hi piece, compensated lo pieces
    kh, ke = _two_prod_c(kf, _LN2_H)
    k2h, k2e = _two_prod_c(kf, _LN2_L)
    klh, kll = _ds_add(kh, ke, k2h, k2e)
    kll = kll + kf * f32(_LN2_L2)

    out_h, out_l = _ds_add(klh, kll, logm_h, logm_l)
    # lo-part correction: log(1 + r2l/r2h) ~ d - d^2/2 (f32 suffices)
    d = r2l / r2h
    return _fast_two_sum(out_h, out_l + (d - 0.5 * d * d))


def _ds_add_c(c, xh, xl):
    """ds x + exact python-float ds constant c = (c_hi, c_lo), with the
    constant's hi part made compiler-opaque (_cbar hazard)."""
    ch = _cbar(c[0], xh)
    sh, se = _two_sum(ch, xh)
    return _fast_two_sum(sh, se + (f32(c[1]) + xl))


def _ds_mul_c(c, xh, xl):
    """ds x * exact python-float ds constant c = (c_hi, c_lo)."""
    ph, pe = _two_prod_c(xh, c[0])
    return _fast_two_sum(ph, pe + (f32(c[0]) * xl + f32(c[1]) * xh))


def _ds_sqrt(xh, xl):
    """sqrt of a ds number (x > 0), ~2^-48 relative: f32 seed + one ds
    Newton step + one f32 polish (the seed's d^2 term is ~1e-14)."""
    y0 = jnp.sqrt(xh)
    s0h, s0l = _ds_sqr(y0, jnp.zeros_like(y0))
    dh, dl = _ds_add(xh, xl, -s0h, -s0l)
    half_iy = 0.5 / y0
    y1h, y1l = _fast_two_sum(y0, dh * half_iy)
    s1h, s1l = _ds_sqr(y1h, y1l)
    d1h, _ = _ds_add(xh, xl, -s1h, -s1l)
    return _fast_two_sum(y1h, y1l + d1h * half_iy)


_EXPC = tuple(_ds_const(1.0 / math.factorial(n)) for n in range(13, 1, -1))


def _ds_exp_neg(zh, zl):
    """e^{-z} for z in [0, ~36] in ds (~1e-15 relative).

    z = k ln2 + r with |r| <= 0.347; e^{-z} = 2^{-k} e^{-r}, the Taylor
    series of e^{-r} in ds (13 terms) and an exact per-lane 2^{-k} scale
    built by exponent bit assembly.  Callers clamp z <= 36 (k <= 52)."""
    kf = jnp.round(zh * f32(1.0 / math.log(2.0)))
    # r = z - k ln2 via exact products with the split ln2 pieces
    kh, ke = _two_prod_c(kf, _LN2_H)
    k2h, k2e = _two_prod_c(kf, _LN2_L)
    klh, kll = _ds_add(kh, ke, k2h, k2e)
    kll = kll + kf * f32(_LN2_L2)
    rh, rl = _ds_add(zh, zl, -klh, -kll)
    rh, rl = -rh, -rl                      # e^{-z}: series argument is -r
    eh = jnp.full(rh.shape, f32(_EXPC[0][0]))
    el = jnp.full(rh.shape, f32(_EXPC[0][1]))
    for c in _EXPC[1:]:
        eh, el = _ds_add_c(c, *_ds_mul(eh, el, rh, rl))
    for c in ((1.0, 0.0), (1.0, 0.0)):     # ... + r^1/1! + r^0/0!
        eh, el = _ds_add_c(c, *_ds_mul(eh, el, rh, rl))
    # scale by 2^{-k}: assemble the power of two from exponent bits
    ki = kf.astype(i32)
    p2 = jax.lax.bitcast_convert_type(
        jnp.left_shift(jnp.int32(127) - ki, 23), f32)
    return eh * p2, el * p2


# ---------------------------------------------------------------------------
# K0 (modified Bessel, Yukawa kernel) in double-single
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=4)
def _k0_cheb_ds(lo: float = 2.0, hi: float = 36.0, deg: int = 26):
    """Host Chebyshev fit of f(z) = K0(z) e^z sqrt(z) IN u = 1/z on
    [1/hi, 1/lo] as ds coefficient pairs (the 1/z transform moves the
    z=0 singularity away: deg 26 reaches ~2e-15 where a fit in z needs
    deg 60).  Residual checked at build time."""
    from scipy.special import k0 as _sk0
    import numpy as _np
    n = 400
    ulo, uhi = 1.0 / hi, 1.0 / lo
    xc = _np.cos(_np.pi * (_np.arange(n) + 0.5) / n)
    uc = 0.5 * (uhi + ulo) + 0.5 * (uhi - ulo) * xc
    zc = 1.0 / uc
    fv = _sk0(zc) * _np.exp(zc) * _np.sqrt(zc)
    c = _np.polynomial.chebyshev.chebfit(xc, fv, deg - 1)
    resid = _np.abs(_np.polynomial.chebyshev.chebval(xc, c) - fv) / fv
    assert resid.max() < 3e-15, f"K0 cheb fit residual {resid.max():.2e}"
    return tuple(_ds_const(float(v)) for v in c), lo, hi, ulo, uhi


# harmonic numbers and inverse square factorials for the small-z series
_K0_SMALL_TERMS = 14
_GAMMA = 0.5772156649015328606


def _k0_ds(qh, ql, zh, zl):
    """K0(z) in ds given both q = z^2/4 and z (z >= 0, clamped tiny).

    Branches: series (z < 2), Chebyshev of K0 e^z sqrt(z) on [2, 36],
    zero beyond 36 (K0(36) ~ 4e-17 < the 1e-14 target).  All lanes pay
    all branches (TPU select), ~2.5k f32 ops/pair total."""
    small = zh < f32(2.0)
    # --- small branch: K0 = -(log(z/2) + gamma) I0(q) + sum H_m q^m/(m!)^2
    qsh = jnp.where(small, qh, f32(1.0))
    qsl = jnp.where(small, ql, f32(0.0))
    qsh = jnp.maximum(qsh, f32(1e-30))
    # constant-array initializers must be opaque (_cbar): the first
    # ds_add would otherwise hit the (1 + x) - 1 simplifier rewrite
    term_h = _cbar(1.0, qh)
    term_l = jnp.zeros_like(qh)
    i0h, i0l = _cbar(1.0, qh), jnp.zeros_like(qh)
    ach = jnp.zeros_like(qh)
    acl = jnp.zeros_like(qh)
    H = 0.0
    for m in range(1, _K0_SMALL_TERMS):
        term_h, term_l = _ds_mul_c(_ds_const(1.0 / (m * m)),
                                   *_ds_mul(term_h, term_l, qsh, qsl))
        i0h, i0l = _ds_add(i0h, i0l, term_h, term_l)
        H += 1.0 / m
        th, tl = _ds_mul_c(_ds_const(H), term_h, term_l)
        ach, acl = _ds_add(ach, acl, th, tl)
    # log(z/2) = (log q) / 2
    lqh, lql = _log_ds(qsh, qsl)
    ph, pll = _ds_add_c(_ds_const(_GAMMA), 0.5 * lqh, 0.5 * lql)
    mh, ml = _ds_mul(ph, pll, i0h, i0l)
    small_h, small_l = _ds_add(ach, acl, -mh, -ml)
    # --- mid branch: K0 = cheb(affine(1/z)) e^{-z} / sqrt(z)
    c, lo, hi, ulo, uhi = _k0_cheb_ds()
    zch = jnp.clip(zh, f32(lo), f32(hi))
    zcl = jnp.where((zh > f32(lo)) & (zh < f32(hi)), zl, f32(0.0))
    rzh, rzl = _ds_recip(zch, zcl)
    s = 2.0 / (uhi - ulo)
    uh, ul = _ds_add_c(_ds_const(-(uhi + ulo) / (uhi - ulo)),
                       *_ds_mul_c(_ds_const(s), rzh, rzl))
    u2h, u2l = 2.0 * uh, 2.0 * ul
    b1h = jnp.zeros_like(zh)
    b1l = jnp.zeros_like(zh)
    b2h = jnp.zeros_like(zh)
    b2l = jnp.zeros_like(zh)
    for ck in c[::-1][:-1]:
        th, tl = _ds_add(*_ds_mul(u2h, u2l, b1h, b1l), -b2h, -b2l)
        nh, nl = _ds_add_c(ck, th, tl)
        b2h, b2l, b1h, b1l = b1h, b1l, nh, nl
    th, tl = _ds_add(*_ds_mul(uh, ul, b1h, b1l), -b2h, -b2l)
    fh, fl = _ds_add_c(c[0], th, tl)
    eh, el = _ds_exp_neg(zch, zcl)
    sqh, sql = _ds_sqrt(zch, zcl)
    num_h, num_l = _ds_mul(fh, fl, eh, el)
    mid_h, mid_l = _ds_div(num_h, num_l, sqh, sql)
    # --- select
    out_h = jnp.where(small, small_h, mid_h)
    out_l = jnp.where(small, small_l, mid_l)
    dead = zh > f32(hi)
    out_h = jnp.where(dead, f32(0.0), out_h)
    out_l = jnp.where(dead, f32(0.0), out_l)
    return out_h, out_l


# ---------------------------------------------------------------------------
# pairwise kernels
# ---------------------------------------------------------------------------

def _pair_geometry(txh, txl, tyh, tyl, sxh, sxl, syh, syl):
    """dx, dy, r2 (clamped) in ds for a (TT,1) x (1,SB) pair block."""
    dxh, dxl = _ds_sub(txh, txl, sxh, sxl)
    dyh, dyl = _ds_sub(tyh, tyl, syh, syl)
    x2h, x2l = _ds_sqr(dxh, dxl)
    y2h, y2l = _ds_sqr(dyh, dyl)
    r2h, r2l = _ds_add(x2h, x2l, y2h, y2l)
    # clamp: coincident/masked lanes must stay finite (cf. accurate_log)
    tiny = r2h < f32(1e-30)
    r2h = jnp.where(tiny, f32(1e-30), r2h)
    r2l = jnp.where(tiny, f32(0.0), r2l)
    return (dxh, dxl), (dyh, dyl), (r2h, r2l)


# ---------------------------------------------------------------------------
# kernels: per-source tile updates
#
# Layout (forced by the axon remote compiler, which rejects every Mosaic
# program using grid=, explicit DMA, dynamic stores, or dynamic rotates
# with an opaque HTTP-500 from its chipless TpuAotCompiler; see
# PROGRESS.md round-3 hardware notes):
#   * gridless pallas_call, all operands resident in VMEM/SMEM;
#   * targets packed 2D (rows, 256) -- natural (8,128) tiling, no lane
#     padding waste -- processed as statically-unrolled (8, 256) tiles
#     (dynamic loads are fine; dynamic STORES infinite-recurse in this
#     jax version's Mosaic lowering, so output writes must be static);
#   * sources as SMEM scalar columns (SC, 1), read one scalar per
#     fori_loop step and broadcast against the whole target tile.  The
#     remote compiler caps total SMEM operands at ~1024 words, so calls
#     take at most _SC sources; the host scans over source chunks and
#     accumulates partials in f64 (each partial is ds-exact, so the only
#     added rounding is one f64 add per chunk).
# Compared to the old (target, source-block) pair-tile design this also
# deletes the cross-lane ds reduction tree: each target's sum
# accumulates in place in its own lane.
# ---------------------------------------------------------------------------

_TR = 8            # tile sublanes
_TL = 256          # tile lanes; one tile = 2048 targets
_TILE = _TR * _TL
_MAX_TILES = 16    # per-call unroll cap: 32768 targets / call
_SC = 128          # sources per call (SMEM budget)


def _laplace_update(acc, tds, svals, kparam):
    """acc += -log|x-s_j|^2 * q_j  (caller scales by 1/(4 pi))."""
    ah, al = acc
    (sxh, sxl), (syh, syl), (qh, ql) = svals
    _, _, (r2h, r2l) = _pair_geometry(*tds, sxh, sxl, syh, syl)
    lh, ll = _log_ds(r2h, r2l)
    mh, ml = _ds_mul(lh, ll, qh, ql)
    return _ds_add(ah, al, -mh, -ml)


def _grad_update(acc, tds, svals, kparam):
    """(d/dx, d/dy) sum_j -log|x-s_j| q_j = sum_j -(dx, dy)/r2 q_j
    (caller scales by 1/(2 pi))."""
    xh, xl, yh, yl = acc
    (sxh, sxl), (syh, syl), (qh, ql) = svals
    (dxh, dxl), (dyh, dyl), (r2h, r2l) = _pair_geometry(
        *tds, sxh, sxl, syh, syl)
    ih, il = _ds_recip(r2h, r2l)
    cqh, cql = _ds_mul(ih, il, qh, ql)
    mxh, mxl = _ds_mul(dxh, dxl, cqh, cql)
    myh, myl = _ds_mul(dyh, dyl, cqh, cql)
    xh, xl = _ds_add(xh, xl, -mxh, -mxl)
    yh, yl = _ds_add(yh, yl, -myh, -myl)
    return xh, xl, yh, yl


def _mh_update(acc, tds, svals, kparam):
    """acc += K0(k |x-s_j|) q_j (caller scales by 1/(2 pi)); k static."""
    kq = _ds_const(kparam * kparam / 4.0)
    kc = _ds_const(kparam)
    ah, al = acc
    (sxh, sxl), (syh, syl), (qh, ql) = svals
    _, _, (r2h, r2l) = _pair_geometry(*tds, sxh, sxl, syh, syl)
    qqh, qql = _ds_mul_c(kq, r2h, r2l)           # q = k^2 r^2 / 4
    rh, rl = _ds_sqrt(r2h, r2l)
    zh, zl = _ds_mul_c(kc, rh, rl)               # z = k r
    k0h, k0l = _k0_ds(qqh, qql, zh, zl)
    mh, ml = _ds_mul(k0h, k0l, qh, ql)
    return _ds_add(ah, al, mh, ml)


def _stokes_update(acc, tds, svals, kparam):
    """Stokeslet velocity+pressure (conventions of ops/stokes_kernels.py):
      u += (ilr + dx^2/r2) fx + (dx dy / r2) fy        [/ 4 pi by caller]
      v += (dx dy / r2) fx + (ilr + dy^2/r2) fy
      p += (dx fx + dy fy) / r2                        [/ 2 pi by caller]
    with ilr = -log(r2)/2."""
    uh, ul, vh, vl, ph, pll = acc
    (sxh, sxl), (syh, syl), (fxh, fxl), (fyh, fyl) = svals
    (dxh, dxl), (dyh, dyl), (r2h, r2l) = _pair_geometry(
        *tds, sxh, sxl, syh, syl)
    lh, ll = _log_ds(r2h, r2l)
    ilrh, ilrl = -0.5 * lh, -0.5 * ll
    ih, il = _ds_recip(r2h, r2l)
    x2h, x2l = _ds_sqr(dxh, dxl)
    ah, al = _ds_mul(x2h, x2l, ih, il)
    y2h, y2l = _ds_sqr(dyh, dyl)
    bh, bl = _ds_mul(y2h, y2l, ih, il)
    xyh, xyl = _ds_mul(dxh, dxl, dyh, dyl)
    ch, cl = _ds_mul(xyh, xyl, ih, il)
    t1h, t1l = _ds_add(ilrh, ilrl, ah, al)
    m1h, m1l = _ds_mul(t1h, t1l, fxh, fxl)
    m2h, m2l = _ds_mul(ch, cl, fyh, fyl)
    uh, ul = _ds_add(uh, ul, *_ds_add(m1h, m1l, m2h, m2l))
    t2h, t2l = _ds_add(ilrh, ilrl, bh, bl)
    m3h, m3l = _ds_mul(ch, cl, fxh, fxl)
    m4h, m4l = _ds_mul(t2h, t2l, fyh, fyl)
    vh, vl = _ds_add(vh, vl, *_ds_add(m3h, m3l, m4h, m4l))
    n1h, n1l = _ds_mul(dxh, dxl, fxh, fxl)
    n2h, n2l = _ds_mul(dyh, dyl, fyh, fyl)
    nh, nl = _ds_add(n1h, n1l, n2h, n2l)
    mph, mpl = _ds_mul(nh, nl, ih, il)
    ph, pll = _ds_add(ph, pll, mph, mpl)
    return uh, ul, vh, vl, ph, pll


_UPDATES = {"laplace": _laplace_update, "grad": _grad_update,
            "mh": _mh_update, "stokes": _stokes_update}
_N_OUT = {"laplace": 2, "grad": 4, "stokes": 6, "mh": 2}


def _make_kernel(kind, kparam, ntiles, n_q, n_out):
    update = _UPDATES[kind]

    def kernel(*refs):
        t_refs = refs[:4]
        s_refs = refs[4:4 + 2 * n_q]
        o_refs = refs[4 + 2 * n_q:]
        ns = s_refs[0].shape[0]
        for ti in range(ntiles):
            o = ti * _TR
            tds = tuple(r[o:o + _TR, :] for r in t_refs)

            def body(j, acc, tds=tds):
                # lift the SMEM scalars to (1,1) vectors: Mosaic's
                # tpu.bitcast (used by the Dekker split) rejects scalar
                # operands, and every op broadcasts (1,1) against the
                # (8,256) tile anyway
                svals = tuple(
                    (jnp.broadcast_to(s_refs[2 * m][j, 0], (1, 1)),
                     jnp.broadcast_to(s_refs[2 * m + 1][j, 0], (1, 1)))
                    for m in range(n_q))
                return update(acc, tds, svals, kparam)

            z = jnp.zeros((_TR, _TL), f32)
            acc = jax.lax.fori_loop(0, ns, body, (z,) * n_out)
            for m in range(n_out):
                o_refs[m][o:o + _TR, :] = acc[m]

    return kernel


# ---------------------------------------------------------------------------
# host-side wrappers: f64 <-> ds packing, padding, pallas_call dispatch
# ---------------------------------------------------------------------------

def _to_ds(x):
    x = jnp.asarray(x, jnp.float64)
    hi = x.astype(f32)
    lo = (x - hi.astype(jnp.float64)).astype(f32)
    return hi, lo


def _from_ds(hi, lo):
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


# padded sources sit here with zero charge: far from every real target so
# r2 stays benign in every kernel (log ~ 18, K0 -> 0), exactly f32
_FAR = 16384.0


def _bucket_tiles(n):
    for b in (1, 2, 4, 8):
        if n <= b:
            return b
    return _MAX_TILES


@functools.partial(jax.jit, static_argnames=("kind", "interpret", "kparam"))
def _dispatch(kind, interpret, sx, sy, q1, q2, tx, ty, kparam=None):
    """Shared entry: packs ds operands, pads, runs the kernel over
    (target-chunk x source-chunk) tiles, unpacks.  q2 is None for the
    scalar kernels (laplace/grad/mh)."""
    T = tx.shape[0]
    S = sx.shape[0]
    n_q = 3 if q2 is None else 4
    n_out = _N_OUT[kind]
    ntiles = _bucket_tiles(-(-T // _TILE))
    TC = ntiles * _TILE
    ncT = -(-T // TC)
    rows = ntiles * _TR
    ncS = -(-S // _SC)

    def pack_t(a):
        return jnp.pad(a, (0, ncT * TC - T)).reshape(ncT, rows, _TL)

    txh, txl = _to_ds(tx)
    tyh, tyl = _to_ds(ty)
    tgt = jnp.stack([pack_t(a) for a in (txh, txl, tyh, tyl)], 1)

    def pack_s(a, fill=0.0):
        return jnp.pad(a, (0, ncS * _SC - S),
                       constant_values=fill).reshape(ncS, _SC, 1)

    sxh, sxl = _to_ds(sx)
    syh, syl = _to_ds(sy)
    qh, ql = _to_ds(q1)
    src_list = [pack_s(sxh, _FAR), pack_s(sxl), pack_s(syh, _FAR),
                pack_s(syl), pack_s(qh), pack_s(ql)]
    if q2 is not None:
        q2h, q2l = _to_ds(q2)
        src_list += [pack_s(q2h), pack_s(q2l)]
    srcs = jnp.stack(src_list, 1)          # (ncS, 2 n_q, _SC, 1)

    kernel = _make_kernel(kind, kparam, ntiles, n_q, n_out)
    global _BARRIER
    _BARRIER = bool(interpret)   # kernel traces synchronously below
    try:
        def call(tgt4, srcrow):
            return pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
                + [pl.BlockSpec(memory_space=pltpu.SMEM)] * (2 * n_q),
                out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_out,
                out_shape=[jax.ShapeDtypeStruct((rows, _TL), f32)] * n_out,
                interpret=interpret,
            )(*tgt4, *srcrow)

        def per_t(tgt4):
            def scan_body(acc, srcrow):
                part = jnp.stack(call(tgt4, srcrow)).astype(jnp.float64)
                return acc + (part[0::2] + part[1::2]), None

            z = jnp.zeros((n_out // 2, rows, _TL), jnp.float64)
            if ncS == 1:
                acc, _ = scan_body(z, srcs[0])
            else:
                acc, _ = jax.lax.scan(scan_body, z, srcs)
            return acc

        if ncT == 1:
            res = per_t(tgt[0])[:, None]
        else:
            res = jnp.moveaxis(jax.lax.map(per_t, tgt), 0, 1)
    finally:
        _BARRIER = True
    res = res.reshape(n_out // 2, ncT * TC)[:, :T]
    return [res[i] for i in range(n_out // 2)]


def _default_interpret(interpret):
    """None -> interpret off the TPU (lets CPU tests run the real
    integration path end to end); explicit bool wins."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def laplace_slp_apply(sx, sy, weighted_charge, tx, ty, *, interpret=None):
    """Pallas ds twin of ops.kernels.laplace_slp_apply."""
    interpret = _default_interpret(interpret)
    (out,) = _dispatch("laplace", interpret, jnp.asarray(sx),
                       jnp.asarray(sy), jnp.asarray(weighted_charge), None,
                       jnp.asarray(tx), jnp.asarray(ty))
    return out / (4 * jnp.pi)


def laplace_slp_grad_apply(sx, sy, weighted_charge, tx, ty, *,
                           interpret=None):
    interpret = _default_interpret(interpret)
    gx, gy = _dispatch("grad", interpret, jnp.asarray(sx), jnp.asarray(sy),
                       jnp.asarray(weighted_charge), None,
                       jnp.asarray(tx), jnp.asarray(ty))
    return gx / (2 * jnp.pi), gy / (2 * jnp.pi)


def mh_slp_apply(sx, sy, weighted_charge, tx, ty, k, *, interpret=None):
    """Pallas ds twin of ops.kernels.mh_slp_apply (Yukawa K0 kernel)."""
    interpret = _default_interpret(interpret)
    (out,) = _dispatch("mh", interpret, jnp.asarray(sx), jnp.asarray(sy),
                       jnp.asarray(weighted_charge), None,
                       jnp.asarray(tx), jnp.asarray(ty), kparam=float(k))
    return out / (2 * jnp.pi)


def stokes_slp_apply(sx, sy, wfx, wfy, tx, ty, *, interpret=None):
    interpret = _default_interpret(interpret)
    u, v, p = _dispatch("stokes", interpret, jnp.asarray(sx),
                        jnp.asarray(sy), jnp.asarray(wfx), jnp.asarray(wfy),
                        jnp.asarray(tx), jnp.asarray(ty))
    return u / (4 * jnp.pi), v / (4 * jnp.pi), p / (2 * jnp.pi)
