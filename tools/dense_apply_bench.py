"""Microbenchmark: dense kernel-apply throughput on the accelerator.

Measures pairs/second for the chunked f64 Laplace/Stokes dense applies
(ops/kernels, ops/stokes_kernels) at bench-like shapes, plus a raw
multiply+reduce and a raw f64 elementwise chain for reference -- tells us
how far the XLA path sits from the VPU's achievable rate before investing
in a Pallas double-single kernel.
Usage: python tools/dense_apply_bench.py [T] [S]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, n=5):
    import jax.numpy as jnp
    out = fn()
    _ = float(jnp.sum(out.ravel()[:1]) if hasattr(out, "ravel")
              else jnp.sum(out[0].ravel()[:1]))
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn()
        _ = float(jnp.sum(out.ravel()[:1]) if hasattr(out, "ravel")
                  else jnp.sum(out[0].ravel()[:1]))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from ipde_tpu.ops import kernels
    from ipde_tpu.ops import stokes_kernels as sk

    T = int(sys.argv[1]) if len(sys.argv) > 1 else 54000
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 8100
    rng = np.random.default_rng(0)
    sx = jnp.asarray(rng.uniform(-1, 1, S))
    sy = jnp.asarray(rng.uniform(-1, 1, S))
    q = jnp.asarray(rng.standard_normal(S))
    tx = jnp.asarray(rng.uniform(-1, 1, T) + 3.0)   # separated targets
    ty = jnp.asarray(rng.uniform(-1, 1, T))
    pairs = T * S

    lat_probe = jax.jit(lambda x: x + 1.0)
    _ = float(lat_probe(jnp.asarray(0.0)))
    t0 = time.time()
    for _ in range(5):
        _ = float(lat_probe(jnp.asarray(0.0)))
    lat = (time.time() - t0) / 5
    print(f"latency {lat*1e3:.1f} ms; shape T={T} S={S} pairs={pairs/1e6:.0f}M")

    f = jax.jit(lambda: kernels.laplace_slp_apply(sx, sy, q, tx, ty))
    t = timeit(f) - lat
    print(f"laplace slp apply  {t*1e3:8.1f} ms  {pairs/t/1e9:6.2f} Gpairs/s")

    f = jax.jit(lambda: kernels.mh_slp_apply(sx, sy, q, tx, ty, 2.0))
    t = timeit(f) - lat
    print(f"yukawa slp apply   {t*1e3:8.1f} ms  {pairs/t/1e9:6.2f} Gpairs/s")

    f = jax.jit(lambda: sk.stokes_slp_apply(sx, sy, q, q, tx, ty))
    t = timeit(f) - lat
    print(f"stokes slp apply   {t*1e3:8.1f} ms  {pairs/t/1e9:6.2f} Gpairs/s")

    # raw multiply+reduce (the contraction floor, no kernel math)
    A = jnp.asarray(rng.standard_normal((T // 4, S)))
    f = jax.jit(lambda: jnp.sum(A * q[None, :], axis=1))
    t = timeit(f) - lat
    print(f"mul+reduce (T/4,S) {t*1e3:8.1f} ms  {A.size/t/1e9:6.2f} Gpairs/s")

    # raw f64 elementwise r2 + log chain at (T/4, S) without reduce
    cx = tx[: T // 4]
    f = jax.jit(lambda: kernels.accurate_log(
        (cx[:, None] - sx[None, :]) ** 2 + 1.0).sum(axis=1))
    t = timeit(f) - lat
    print(f"r2+acc_log only    {t*1e3:8.1f} ms  {A.size/t/1e9:6.2f} Gpairs/s")

    # f32 comparison point (hardware-native elementwise)
    sx32 = sx.astype(jnp.float32)
    cx32 = cx.astype(jnp.float32)
    f = jax.jit(lambda: jnp.log(
        (cx32[:, None] - sx32[None, :]) ** 2 + 1.0).sum(axis=1))
    t = timeit(f) - lat
    print(f"f32 r2+log         {t*1e3:8.1f} ms  {A.size/t/1e9:6.2f} Gpairs/s")


if __name__ == "__main__":
    main()
