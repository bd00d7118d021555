"""Clean (in-jit repeated) timing of DFT-apply arithmetic candidates.

Times R repetitions of each candidate inside ONE jit dispatch so the
~30 ms tunnel latency and dispatch noise amortize away.  Candidates are
shaped like a DIRECT 1D DFT along the long axis of a 2048-class grid
panel: C @ X with C (n, n) constant (precomputable slices) and X (n, m)
per-call data.

Usage: python tools/mm_probe2.py
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
    from ipde_tpu.ops.ozaki import SBITS, _pow2_scales, _slices

    R = 4
    n, m = 2176, 2048
    rng = np.random.default_rng(0)
    C = jnp.asarray(rng.standard_normal((n, n)))
    X = jnp.asarray(rng.standard_normal((n, m)))
    fl = 2.0 * n * n * m

    def sync(x):
        return float(jnp.sum(x.ravel()[:1]))

    def timed(make_fn, tag, ref=None):
        fn = jax.jit(make_fn)
        try:
            out = fn(X)
            sync(out)
        except Exception as e:
            print(f"{tag:<22} FAILED {type(e).__name__}: {e}")
            return None
        ts = []
        for _ in range(3):
            t0 = time.time()
            sync(fn(X))
            ts.append(time.time() - t0)
        ms = float(np.median(ts)) * 1e3 / R
        line = f"{tag:<22} {ms:8.2f} ms/app  {fl/ms/1e6:9.1f} GF/s"
        if ref is not None:
            err = float(jnp.max(jnp.abs(out - ref)))
            line += f"  maxabs {err:.2e}"
        print(line, flush=True)
        return out

    def rep(body):
        def f(x):
            acc = x
            for _ in range(R):
                acc = body(acc)
            return acc
        return f

    HI = jax.lax.Precision.HIGHEST
    ref = jax.jit(lambda x: jnp.matmul(C, x, precision=HI))(X)
    ref = jnp.asarray(ref)

    timed(rep(lambda x: jnp.matmul(C, x, precision=HI) / n), "f64 HIGHEST")
    C32 = C.astype(jnp.float32)
    timed(rep(lambda x: jnp.matmul(
        C32, x.astype(jnp.float32), precision=HI).astype(jnp.float64) / n),
        "f32 HIGHEST")
    timed(rep(lambda x: jnp.matmul(
        C32, x.astype(jnp.float32)).astype(jnp.float64) / n), "f32 default")

    # ozaki with PRECOMPUTED matrix slices (the DFT-plan setting):
    # matrix rows scaled to [-1,1] once; per call only the data slices.
    Rsc = _pow2_scales(C)
    Cn = C * (1.0 / Rsc)[:, None]
    csl_all = [s.astype(jnp.bfloat16) for s in _slices(Cn)]

    def ozapply(x, pmax, nsl_data):
        Csc = _pow2_scales(x.T)             # per-column scales of data
        Xn = x * (1.0 / Csc)[None, :]
        xsl = _slices(Xn)
        acc = jnp.zeros((n, x.shape[1]), jnp.float64)
        for p in range(min(len(csl_all), pmax + 1)):
            for q in range(min(nsl_data, pmax + 1 - p)):
                Mpq = jnp.matmul(csl_all[p], xsl[q].astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32)
                acc = acc + Mpq.astype(jnp.float64) \
                    * (2.0 ** (-(p + q + 2) * SBITS))
        return acc * Rsc[:, None] * Csc[None, :]

    for pmax in (6, 8):
        timed(rep(lambda x, p=pmax: ozapply(x, p, 10) / n),
              f"ozaki-pre pmax={pmax}", ref=None)
        # accuracy: single application vs f64 reference
        o = jax.jit(lambda x, p=pmax: ozapply(x, p, 10))(X)
        err = float(jnp.max(jnp.abs(o - ref)))
        print(f"    single-app maxabs vs f64: {err:.2e} "
              f"(rel {err/float(jnp.max(jnp.abs(ref))):.2e})")


if __name__ == "__main__":
    main()
