"""f64-emulated GEMM rate vs contraction size K on the TPU.

If the rate grows with K, the four-step DFT factors should be chosen
asymmetric (large first factor) instead of ~sqrt(n) x sqrt(n).

Usage: python tools/mm_probe3.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    import jax.numpy as jnp

    def sync(x):
        return float(jnp.sum(x.ravel()[:1]))

    tiny = jax.jit(lambda x: x + 1.0)
    _ = float(tiny(jnp.asarray(0.0)))
    t0 = time.time()
    for _ in range(5):
        _ = float(tiny(jnp.asarray(0.0)))
    lat = (time.time() - t0) / 5
    print(f"latency {lat*1e3:.1f} ms backend={jax.default_backend()}",
          flush=True)

    HI = jax.lax.Precision.HIGHEST
    rng = np.random.default_rng(0)
    # fixed output size m x N = 2048 x 2176, sweep K
    m, N = 2048, 2176
    for K in (32, 64, 128, 256, 512, 1024, 2176):
        A = jnp.asarray(rng.standard_normal((m, K)))
        B = jnp.asarray(rng.standard_normal((K, N)))
        R = max(1, 2048 // K)          # equalize total flops across rows
        fl = 2.0 * m * K * N * R

        def f(a, b):
            acc = None
            for _ in range(R):
                p = jnp.matmul(a, b, precision=HI)
                acc = p if acc is None else acc + p
                a = a + 1e-30          # defeat CSE
            return acc
        jf = jax.jit(f)
        sync(jf(A, B))
        ts = []
        for _ in range(3):
            t0 = time.time()
            sync(jf(A, B))
            ts.append(time.time() - t0 - lat)
        ms = float(np.median(ts)) * 1e3
        print(f"K={K:5d} x{R:3d}: {ms:8.2f} ms  {fl/ms/1e6:9.1f} GF/s "
              f"({ms/R:.3f} ms/gemm)", flush=True)


if __name__ == "__main__":
    main()
