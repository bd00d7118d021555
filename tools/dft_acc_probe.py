"""Isolate the tier-2 (2048-class) grid-error floor suspects ON TPU.

Measures, at a configurable padded grid shape (default the tier-2 VG
shape 4096x4288 half-spectrum via the 2048x2144 box):

  1. DFT-matmul roundtrip:  irfft2(rfft2(x)) - x  for a smooth
     band-limited field, per axis length -- the "ds-f64 accumulation"
     suspect.  Reports max-abs and rel-2 error vs the analytic input.
  2. Poisson symbol solve:  solve_symbol roundtrip vs the analytic
     solution of -lap u = f for a band-limited f on the periodic box --
     compounds the roundtrip with the 1/k^2 multiply (low-k
     amplification of transform noise).
  3. VG free-space Laplace evaluator vs host direct quadrature for a
     small smooth source set at tier-2 grid density (sanity on symbol
     precision; full version in tools/acc_bisect_stokes.py).

Usage:  PROBE_SHAPES="512,512 2048,2144" python tools/dft_acc_probe.py
        PROBE_SECTIONS=rt,sym,vg
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
    from ipde_tpu.ops.fourier import FourierPlan2D

    sections = os.environ.get("PROBE_SECTIONS", "rt,sym").split(",")
    shapes = [tuple(int(v) for v in s.split(","))
              for s in os.environ.get(
                  "PROBE_SHAPES", "512,512 1024,1088 2048,2144").split()]

    for nx, ny in shapes:
        # smooth band-limited field with spectral content through k ~ n/4
        xs = np.arange(nx) * (2 * np.pi / nx)
        ys = np.arange(ny) * (2 * np.pi / ny)
        X, Y = np.meshgrid(xs, ys, indexing="ij")
        kx, ky = max(3, nx // 8), max(2, ny // 8)
        f = (np.sin(kx * X) * np.cos(ky * Y)
             + 0.5 * np.cos(3 * X + 2 * Y) + 0.25 * np.sin(X) * np.sin(Y))
        fd = jnp.asarray(f)
        plan = FourierPlan2D(nx, ny, native=False)

        if "rt" in sections:
            t0 = time.time()
            rt = np.asarray(plan.irfft2_real(plan.rfft2(fd)))
            dt = time.time() - t0
            err = np.abs(rt - f).max()
            rel = np.linalg.norm(rt - f) / np.linalg.norm(f)
            print(f"[rt ] {nx}x{ny}: max {err:.3e} rel2 {rel:.3e} "
                  f"({dt:.1f}s first)")

        if "sym" in sections:
            # -lap u = f with f as above minus its mean (all modes here are
            # nonzero-k, so u is analytic: each mode scaled by 1/|k|^2)
            # half-spectrum rows are the x axis: rows [0, nx//2]
            kxv = np.arange(nx // 2 + 1, dtype=float)
            kyv = np.fft.fftfreq(ny, d=1.0 / ny)
            k2 = kxv[:, None] ** 2 + kyv[None, :] ** 2
            sym = np.where(k2 > 0, 1.0 / np.where(k2 > 0, k2, 1.0), 0.0)
            ua = (np.sin(kx * X) * np.cos(ky * Y) / (kx * kx + ky * ky)
                  + 0.5 * np.cos(3 * X + 2 * Y) / 13.0
                  + 0.25 * np.sin(X) * np.sin(Y) / 2.0)
            u = np.asarray(plan.solve_symbol_r(fd, jnp.asarray(sym)))
            err = np.abs(u - ua).max()
            rel = np.linalg.norm(u - ua) / np.linalg.norm(ua)
            print(f"[sym] {nx}x{ny}: max {err:.3e} rel2 {rel:.3e}")

    if "vg" in sections:
        from ipde_tpu.ops.grid_eval import LaplaceGridEvaluator  # noqa: F401
        print("[vg ] use tools/acc_bisect_stokes.py ACC_SECTIONS=ge for the "
              "full evaluator A/B")


if __name__ == "__main__":
    main()
