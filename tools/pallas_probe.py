"""Validate + time the fused double-single Pallas kernels on real TPU
against the XLA-emulated-f64 applies (ops/kernels.py, ops/stokes_kernels.py).

Checks, per kernel (laplace / grad / stokes):
  1. accuracy vs the XLA path on identical double-single-rounded inputs
     (agreement bound ~1e-12: both paths share the 48-bit coordinate floor)
  2. wall time at bench-like sizes (T=200k radial targets x S=5400 sources,
     then T=1M x S=8100), honest host-fetch sync

Usage:  timeout 1200 python tools/pallas_probe.py
        SIZES="small" python tools/pallas_probe.py   # quick validation only
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
    from ipde_tpu.ops import kernels as K
    from ipde_tpu.ops import pallas_ds as pds
    from ipde_tpu.ops import stokes_kernels as SK

    print(f"backend={jax.default_backend()}", flush=True)

    def cloud(T, S, seed=0):
        rng = np.random.default_rng(seed)
        th = 2 * np.pi * np.arange(S) / S
        sx = np.cos(th) * 1.1
        sy = np.sin(th) * 1.1
        r = np.sqrt(rng.uniform(0.01, 1, T))
        a = rng.uniform(0, 2 * np.pi, T)
        tx = r * np.cos(a)
        ty = r * np.sin(a)
        q = rng.standard_normal(S) / S
        dsr = lambda x: (x.astype(np.float32).astype(np.float64)
                         + (x - x.astype(np.float32).astype(np.float64))
                         .astype(np.float32).astype(np.float64))
        return map(jnp.asarray, (dsr(sx), dsr(sy), dsr(q), dsr(tx), dsr(ty)))

    def sync(x):
        return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))

    def timeit(fn, *args, reps=3):
        out = fn(*args)
        _ = sync(out)                    # compile + run
        t0 = time.time()
        for _ in range(reps):
            _ = sync(fn(*args))
        return (time.time() - t0) / reps * 1e3

    def flat_err(a, b):
        la = jax.tree_util.tree_leaves(a)
        lb = jax.tree_util.tree_leaves(b)
        return max(np.abs(np.asarray(x) - np.asarray(y)).max()
                   for x, y in zip(la, lb))

    cases = [
        ("laplace", K.laplace_slp_apply, pds.laplace_slp_apply, ()),
        ("grad", K.laplace_slp_grad_apply, pds.laplace_slp_grad_apply, ()),
        ("mh", K.mh_slp_apply, pds.mh_slp_apply, (20.0,)),
    ]
    sizes = ([(4096, 1024)] if os.environ.get("SIZES") == "small"
             else [(4096, 1024), (200_000, 5400), (1_000_000, 8100)])
    # At bench sizes the chunked XLA applies take minutes-to-hours through
    # the tunnel (the mh K0 path in particular); PALLAS_ONLY=1 skips the
    # XLA side entirely (accuracy is established by the small run).
    pallas_only = bool(os.environ.get("PALLAS_ONLY"))
    for T, S in sizes:
        sx, sy, q, tx, ty = cloud(T, S)
        print(f"T={T} S={S}", flush=True)
        for name, fx, fp, extra in cases:
            try:
                if pallas_only:
                    t_p = timeit(fp, sx, sy, q, tx, ty, *extra)
                    print(f"  {name:8s} pallas {t_p:8.1f} ms", flush=True)
                    continue
                a = fx(sx, sy, q, tx, ty, *extra)
                b = fp(sx, sy, q, tx, ty, *extra)
                print(f"  {name:8s} agree={flat_err(a, b):.2e}", flush=True)
                t_x = timeit(fx, sx, sy, q, tx, ty, *extra)
                t_p = timeit(fp, sx, sy, q, tx, ty, *extra)
                print(f"  {name:8s} xla {t_x:8.1f} ms   pallas {t_p:8.1f} ms"
                      f"  ({t_x / t_p:.2f}x)", flush=True)
            except Exception as e:
                print(f"  {name} FAILED: {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
        try:
            if pallas_only:
                t_p = timeit(pds.stokes_slp_apply, sx, sy, q, q[::-1], tx, ty)
                print(f"  stokes   pallas {t_p:8.1f} ms", flush=True)
                continue
            a = SK.stokes_slp_apply(sx, sy, q, q[::-1], tx, ty)
            b = pds.stokes_slp_apply(sx, sy, q, q[::-1], tx, ty)
            print(f"  stokes   agree={flat_err(a, b):.2e}", flush=True)
            t_x = timeit(SK.stokes_slp_apply, sx, sy, q, q[::-1], tx, ty)
            t_p = timeit(pds.stokes_slp_apply, sx, sy, q, q[::-1], tx, ty)
            print(f"  stokes   xla {t_x:8.1f} ms   pallas {t_p:8.1f} ms"
                  f"  ({t_x / t_p:.2f}x)", flush=True)
        except Exception as e:
            print(f"  stokes FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
