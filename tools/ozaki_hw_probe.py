"""Hardware probe for the Ozaki GEMM building blocks (run on TPU).

Question 1: does bf16 x bf16 -> f32 matmul accumulate EXACTLY for
small-integer operands (products < 2^10, sums < 2^24)?  The ozaki_mm
exactness argument rests on this.
Question 2: same for int8 x int8 -> int32 (the native integer MXU path).
Question 3: ozaki_mm end-to-end vs host numpy at QFS-like shapes.

tools/exactmm_probe.py's "ozaki-N" rows are an OLDER inline prototype
(full-f32 slices + HIGHEST matmul), NOT ops/ozaki.py -- this probes the
real module.  Motivated by qfs_dd2.log: wiring ozaki_mm into the device
compose regressed the residual 6.5e-7 -> 1.4e-5.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    print("backend", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    # Q1: bf16 integer-exactness. slices are integers in [-32, 32];
    # worst-case ozaki sum is k * 1024.
    k = 16200
    m = n = 256
    ai = rng.integers(-32, 33, (m, k)).astype(np.float32)
    bi = rng.integers(-32, 33, (k, n)).astype(np.float32)
    ref = ai.astype(np.float64) @ bi.astype(np.float64)
    out = np.asarray(
        jnp.matmul(jnp.asarray(ai, jnp.bfloat16),
                   jnp.asarray(bi, jnp.bfloat16),
                   preferred_element_type=jnp.float32), np.float64)
    err = np.abs(out - ref).max()
    print(f"Q1 bf16->f32 int matmul: maxabs err {err:.3e} "
          f"(sum scale {np.abs(ref).max():.3e})", flush=True)

    # Q1b: same but accumulating magnitude near the 2^24 bound
    ai2 = np.full((8, k), 31.0, np.float32)
    bi2 = np.full((k, 8), 31.0, np.float32)
    ref2 = float(k) * 31.0 * 31.0
    out2 = np.asarray(
        jnp.matmul(jnp.asarray(ai2, jnp.bfloat16),
                   jnp.asarray(bi2, jnp.bfloat16),
                   preferred_element_type=jnp.float32), np.float64)
    print(f"Q1b worst-case sum {ref2:.0f} -> dev {out2[0,0]:.0f} "
          f"(err {abs(out2[0,0]-ref2):.0f})", flush=True)

    # Q2: int8 -> int32
    a8 = rng.integers(-64, 65, (m, k)).astype(np.int8)
    b8 = rng.integers(-64, 65, (k, n)).astype(np.int8)
    ref8 = a8.astype(np.int64) @ b8.astype(np.int64)
    try:
        out8 = np.asarray(
            jnp.matmul(jnp.asarray(a8), jnp.asarray(b8),
                       preferred_element_type=jnp.int32), np.int64)
        print(f"Q2 int8->int32 matmul: max |err| {np.abs(out8-ref8).max()}",
              flush=True)
    except Exception as e:
        print(f"Q2 int8 FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)

    # Q2b: int8 slices carried as f32 operands -> f32 accumulation
    outf = np.asarray(
        jnp.matmul(jnp.asarray(a8, jnp.float32), jnp.asarray(b8, jnp.float32),
                   preferred_element_type=jnp.float32), np.float64)
    print(f"Q2b f32(int)->f32 matmul: max |err| {np.abs(outf-ref8).max():.3e}",
          flush=True)

    # Q3: ozaki_mm end-to-end at QFS-like shapes (kernel-matrix operands)
    from ipde_tpu.ops.ozaki import ozaki_mm
    mq, kq, nq = 2700, 8100, 2700
    th_s = 2 * np.pi * np.arange(kq) / kq
    th_t = 2 * np.pi * np.arange(mq) / mq
    sx, sy = 1.05 * np.cos(th_s), 1.05 * np.sin(th_s)
    tx = np.cos(th_t) * (1 + 0.2 * np.cos(5 * th_t))
    ty = np.sin(th_t) * (1 + 0.2 * np.cos(5 * th_t))
    A = -np.log((tx[:, None] - sx[None, :]) ** 2
                + (ty[:, None] - sy[None, :]) ** 2) / (4 * np.pi)
    B = rng.standard_normal((kq, nq)) / kq
    ref3 = A @ B
    Ad, Bd = jnp.asarray(A), jnp.asarray(B)
    t0 = time.time()
    o = ozaki_mm(Ad, Bd)
    o.block_until_ready()
    _ = float(jnp.sum(o))
    t1 = time.time()
    o2 = ozaki_mm(Ad, Bd)
    _ = float(jnp.sum(o2))
    t2 = time.time()
    err3 = float(jnp.max(jnp.abs(o - ref3)))
    sc = np.abs(ref3).max()
    print(f"Q3 ozaki_mm ({mq},{kq})x({kq},{nq}): maxabs {err3:.3e} "
          f"({err3/sc:.3e} rel)  first {t1-t0:.1f}s steady {t2-t1:.2f}s",
          flush=True)

    # Q3b: the baseline dot on the same operands
    od = jnp.matmul(Ad, Bd, precision=jax.lax.Precision.HIGHEST)
    _ = float(jnp.sum(od))
    errd = float(jnp.max(jnp.abs(od - ref3)))
    print(f"Q3b dot HIGHEST        : maxabs {errd:.3e} ({errd/sc:.3e} rel)",
          flush=True)


if __name__ == "__main__":
    main()
