"""Decompose the device-QFS residual (3e-7 at bench size on TPU, vs
5.9e-12 for the host path) into its two candidate sources:

  formation: device-built kernel matrices (ops/forms_dev, TPU f64 trig)
             vs host twins (ops/stokes_kernels, numpy)
  compose:   device blocked min-norm (ops/device_linalg.minnorm_compose)
             vs host LAPACK gelsy pinv

by running the 2x2 of {host,device}-formation x {host,device}-compose on
the SAME bench-size Stokes QFS system and reporting each xi's true
residual |A_host xi - F_host tau|_inf.

Usage: BENCH_NB=2700 BENCH_M=20 BENCH_GRID=2048 python tools/qfs_decompose.py
       QFS_CELLS=hh,hd,dh,dd selects cells (formation, compose).
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
    from ipde_tpu.geometry.collection import EmbeddedBoundaryCollection
    from ipde_tpu.geometry.curve import star
    from ipde_tpu.geometry.embedded_boundary import EmbeddedBoundary
    from ipde_tpu.ops import forms_dev as fd
    from ipde_tpu.ops import stokes_kernels as sk
    from ipde_tpu.qfs.qfs import QFSEvaluator, _filter_rows

    nb = int(os.environ.get("BENCH_NB", 2700))
    M = int(os.environ.get("BENCH_M", 20))
    cells = os.environ.get("QFS_CELLS", "hh,hd,dh,dd").split(",")
    bdy = star(nb, a=0.2, f=5)
    bh = min(bdy.min_h(), 0.6 / np.abs(bdy.curvature).max() / M)
    if os.environ.get("BENCH_BH"):
        bh = min(bh, float(os.environ["BENCH_BH"]))
    else:
        tg = int(os.environ.get("BENCH_GRID", 2048))
        if tg:
            extent = float(bdy.x.max() - bdy.x.min())
            bh = min(bh, extent / (tg - 3 * M))
    t0 = time.time()
    ebdy = EmbeddedBoundary(bdy, True, M, bh, qfs_tolerance=1e-14)
    ebdyc = EmbeddedBoundaryCollection([ebdy])
    ebdyc.generate_grid(bh)
    src = ebdy.qfs_source_for_side("bdy", interior_eval=True)
    src.dev()
    print(f"geometry {time.time()-t0:.0f}s backend={jax.default_backend()}",
          flush=True)

    t = bdy.t
    tau = np.concatenate([np.sin(3 * t) + 0.3 * np.cos(7 * t) + 0.2,
                          np.cos(2 * t) - 0.4 * np.sin(5 * t)])
    tau_d = jnp.asarray(tau)
    jump = -0.5

    # ---- formation, both ways -------------------------------------------
    t0 = time.time()
    A_h = (sk.stokes_slp_naive(src, bdy.x, bdy.y)
           + sk.stokes_pressure_fix(src, bdy.normal_x, bdy.normal_y))
    F_h = sk.stokes_dlp_self(bdy) + jump * np.eye(2 * nb)
    print(f"host formation {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    A_d = (fd.stokes_slp_naive_dev(src, bdy.x, bdy.y)
           + fd.stokes_pressure_fix_dev(src, bdy.normal_x, bdy.normal_y))
    F_d = fd.stokes_dlp_self_dev(bdy) + jump * jnp.eye(2 * nb)
    A_d_np = np.asarray(A_d)
    F_d_np = np.asarray(F_d)
    print(f"device formation {time.time()-t0:.0f}s", flush=True)
    print(f"|A_dev - A_host|_inf = {np.abs(A_d_np - A_h).max():.3e} "
          f"(|A| ~ {np.abs(A_h).max():.3e})", flush=True)
    print(f"|F_dev - F_host|_inf = {np.abs(F_d_np - F_h).max():.3e} "
          f"(|F| ~ {np.abs(F_h).max():.3e})", flush=True)

    rhs = _filter_rows(F_h, nb) @ tau

    def report(name, q, t_build):
        xi = np.asarray(q([tau_d]))
        r = A_h @ xi - rhs
        print(f"{name}: residual {np.abs(r).max():.3e}  "
              f"(build {t_build:.0f}s)", flush=True)

    for cell in cells:
        form, comp = cell[0], cell[1]
        A = A_h if form == "h" else A_d_np
        F = F_h if form == "h" else F_d_np
        backend = "host" if comp == "h" else "device"
        if backend == "device":
            A, F = jnp.asarray(A), jnp.asarray(F)
        t0 = time.time()
        q = QFSEvaluator(src, bdy, [F], A, build_u2s=False, backend=backend)
        report(f"form={form} compose={comp}", q, time.time() - t0)


if __name__ == "__main__":
    main()
