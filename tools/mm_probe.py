"""Microbenchmark: f64-emulated vs bf16/f32 vs Ozaki-slice GEMM on chip.

Decides whether the hot DFT-matmul transforms (ops/fourier.py four-step
stages, currently HIGHEST-precision f64) should move to an Ozaki-slice
(error-free bf16) mode: prints ms + effective useful-GFLOP/s for each
arithmetic at four-step-stage-like shapes.

Usage: python tools/mm_probe.py  (TPU; BENCH_PLATFORM=cpu for smoke)
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
    from ipde_tpu.ops.ozaki import ozaki_mm

    def sync(x):
        return float(jnp.sum(x.ravel()[:1]))

    tiny = jax.jit(lambda x: x + 1.0)
    _ = float(tiny(jnp.asarray(0.0)))
    t0 = time.time()
    for _ in range(5):
        _ = float(tiny(jnp.asarray(0.0)))
    lat = (time.time() - t0) / 5
    print(f"latency {lat*1e3:.1f} ms backend={jax.default_backend()}")

    rng = np.random.default_rng(0)

    # four-step stage shape: (n1, n1) DFT factor applied across a big
    # data panel; m = rows of the 2048-class grid panel
    cases = [
        ("stage 64x(64,69632)", (64, 64), (64, 69632)),       # 2048x2176 grid
        ("stage 2176x(46x..)", (48, 48), (48, 98304)),
        ("tall (620k,24)x(24,24)", (24, 24), (24, 620000)),   # window interp
        ("square (2176,2176)", (2176, 2176), (2176, 2176)),   # direct DFT col
    ]
    for name, sa, sb in cases:
        A = jnp.asarray(rng.standard_normal(sa))
        B = jnp.asarray(rng.standard_normal(sb))
        fl = 2.0 * sa[0] * sa[1] * sb[1]

        def bench(fn, tag):
            jf = jax.jit(fn)
            try:
                out = jf(A, B)
                sync(out)
            except Exception as e:
                print(f"  {tag:<18} FAILED {type(e).__name__}: {e}")
                return None
            ts = []
            for _ in range(3):
                t0 = time.time()
                sync(jf(A, B))
                ts.append(time.time() - t0 - lat)
            ms = float(np.median(ts)) * 1e3
            print(f"  {tag:<18} {ms:8.2f} ms  {fl/ms/1e6:9.1f} GF/s")
            return out

        print(f"{name}: logical {fl/1e9:.2f} GF")
        r64 = bench(lambda a, b: jnp.matmul(
            a, b, precision=jax.lax.Precision.HIGHEST), "f64 HIGHEST")
        bench(lambda a, b: jnp.matmul(
            a.astype(jnp.float32), b.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST).astype(jnp.float64),
            "f32 HIGHEST")
        bench(lambda a, b: jnp.matmul(
            a.astype(jnp.float32), b.astype(jnp.float32)).astype(jnp.float64),
            "f32 default")
        bench(lambda a, b: jnp.matmul(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32).astype(jnp.float64), "bf16")
        for pmax in (6, 8, 10):
            o = bench(lambda a, b, p=pmax: ozaki_mm(a, b, pmax=p),
                      f"ozaki pmax={pmax}")
            if o is not None and r64 is not None:
                err = float(jnp.max(jnp.abs(o - r64)))
                scale = float(jnp.max(jnp.abs(r64)))
                print(f"    ozaki{pmax} vs f64: max abs {err:.2e} "
                      f"(rel {err/scale:.2e})")


if __name__ == "__main__":
    main()
