"""Probe exact-f64-matmul strategies on TPU at QFS-compose shapes.

The emulated-f64 dot_general is erratically wrong (~2^-24 absolute) on
kernel-matrix operands (ops/kernels.py:85-96), which floors the device
QFS compose at ~7e-7 (tools/qfs_decompose.py).  This measures accuracy +
wall time of the candidate replacements on REAL kernel-matrix data:

  dot      jnp.matmul precision=HIGHEST (the broken baseline)
  scan     ops/device_linalg.exact_mm (multiply+reduce per column)
  ozaki-N  error-free f32 slice decomposition on the MXU: split each f64
           operand into N s-bit slices (s = 11), partial products are
           exact in f32 and accumulated in f64; truncated to slice pairs
           with i + j < N (tail below 2^-11N relative).

Reference: host numpy f64 GEMM.
Usage: python tools/exactmm_probe.py [m k n]   (default 5400 5400 5400)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ozaki_split(x, nslice: int, sbits: int = 11):
    """Split f64 matrix into nslice f32 matrices of <= sbits significand
    bits each (error-free: x == sum slices + tail below 2^(-sbits*nslice)
    relative to each element's leading bit)."""
    import jax.numpy as jnp
    slices = []
    rem = x
    for _ in range(nslice):
        # round-to-sbits: scale by 2^(sbits - e) where e = per-element
        # exponent of the CURRENT remainder; implemented exponent-free via
        # the classic Veltkamp-style trick against the running remainder's
        # magnitude would need frexp; use per-COLUMN scaling instead which
        # keeps slices exactly representable and bounds slice bits by
        # sbits + intra-column exponent spread... simplest robust variant:
        # global per-matrix scale, elementwise truncation to sbits via
        # float32 rounding after scaling each element's exponent is NOT
        # available elementwise cheaply -- so do the standard: take the
        # f32 rounding of rem as the slice, subtract exactly in f64.
        s = rem.astype(jnp.float32)
        slices.append(s)
        rem = rem - s.astype(jnp.float64)
    return slices


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from ipde_tpu.ops.device_linalg import exact_mm

    m, k, n = (int(a) for a in (sys.argv[1:4] or [5400, 5400, 5400]))
    print(f"backend={jax.default_backend()} shapes ({m},{k})x({k},{n})",
          flush=True)

    # real kernel-matrix operands: Laplace log kernel between two curves
    th_s = 2 * np.pi * np.arange(k) / k
    th_t = 2 * np.pi * np.arange(m) / m
    sx, sy = 1.05 * np.cos(th_s), 1.05 * np.sin(th_s)
    txx, tyy = np.cos(th_t) * (1 + 0.2 * np.cos(5 * th_t)), \
        np.sin(th_t) * (1 + 0.2 * np.cos(5 * th_t))
    A = -np.log((txx[:, None] - sx[None, :]) ** 2
                + (tyy[:, None] - sy[None, :]) ** 2) / (4 * np.pi)
    rng = np.random.default_rng(0)
    th_n = 2 * np.pi * np.arange(n) / n
    B = np.cos(np.outer(th_s, np.fft.fftfreq(n, 1.0 / n))) / k  # smooth
    B = np.ascontiguousarray(B[:, :n])
    ref = A @ B
    scale = np.abs(ref).max()

    Ad = jnp.asarray(A)
    Bd = jnp.asarray(B)

    def timeit(f, reps=2):
        o = f()
        _ = float(jnp.sum(o))
        t0 = time.time()
        for _ in range(reps):
            _ = float(jnp.sum(f()))
        return o, (time.time() - t0) / reps

    def report(name, f):
        try:
            o, dt = timeit(f)
            err = float(jnp.max(jnp.abs(o - ref)))
            print(f"  {name:10s} {dt*1e3:9.1f} ms   maxabs {err:.3e} "
                  f"({err/scale:.3e} rel)", flush=True)
        except Exception as e:
            print(f"  {name} FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    report("dot", lambda: jnp.matmul(Ad, Bd,
                                     precision=jax.lax.Precision.HIGHEST))
    report("scan", lambda: exact_mm(Ad, Bd))

    def ozaki(nsl):
        As = ozaki_split(Ad, nsl)
        Bs = ozaki_split(Bd, nsl)

        def run():
            acc = None
            for i in range(nsl):
                for j in range(nsl - i):
                    p = jnp.matmul(As[i], Bs[j],
                                   precision=jax.lax.Precision.HIGHEST)
                    p = p.astype(jnp.float64)
                    acc = p if acc is None else acc + p
            return acc
        return run

    for nsl in (2, 3, 4):
        report(f"ozaki-{nsl}", ozaki(nsl))


if __name__ == "__main__":
    main()
