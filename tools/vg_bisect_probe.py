"""Cross-backend bisection of the VG Stokes pipeline at tier-2 size.

Builds the SAME evaluator geometry on the current backend, feeds a fixed
density, and dumps intermediates to .npy (or compares against a prior
dump): spread field, forward spectrum, the multB/multQ/deconv multiplier
arrays, the pre-patch spectral u, and the final u.  Run once with
BENCH_PLATFORM=cpu VG_DUMP=/tmp/vgcpu, then on TPU with
VG_CMP=/tmp/vgcpu to localize where the 3.3e-7 TPU-vs-CPU velocity
divergence (tools/vg_probe.py 2026-08-21) enters.

Usage: BENCH_NB=2700 BENCH_M=20 BENCH_GRID=2048 VG_DUMP=... python ...
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
    from ipde_tpu.geometry.collection import EmbeddedBoundaryCollection
    from ipde_tpu.geometry.curve import star
    from ipde_tpu.geometry.embedded_boundary import EmbeddedBoundary
    from ipde_tpu.ops.cx import Cx
    from ipde_tpu.ops.grid_eval import StokesFreespaceGridEvaluator

    nb = int(os.environ.get("BENCH_NB", 2700))
    M = int(os.environ.get("BENCH_M", 20))
    bdy = star(nb, a=0.2, f=5)
    bh = min(bdy.min_h(), 0.6 / np.abs(bdy.curvature).max() / M)
    if os.environ.get("BENCH_GRID"):
        tg = int(os.environ["BENCH_GRID"])
        extent = float(bdy.x.max() - bdy.x.min())
        bh = min(bh, extent / (tg - 3 * M))
    t0 = time.time()
    ebdy = EmbeddedBoundary(bdy, True, M, bh, qfs_tolerance=1e-14)
    ebdyc = EmbeddedBoundaryCollection([ebdy])
    grid = ebdyc.generate_grid(bh)
    src = ebdy.qfs_source_for_side("interface", interior_eval=True)
    px = grid.xg[ebdyc.phys]
    py = grid.yg[ebdyc.phys]
    bounds = ((float(px.min()), float(px.max())),
              (float(py.min()), float(py.max())))
    ge = StokesFreespaceGridEvaluator(grid, src.x, src.y,
                                      target_bounds=bounds,
                                      target_hull=ebdyc.phys_extremes())
    print(f"setup {time.time()-t0:.1f}s backend={jax.default_backend()} "
          f"S={ge.S} padded=({ge.Px},{ge.Py}) L={ge.L:.4f} eta={ge.eta:.2f}",
          flush=True)

    rng = np.random.default_rng(0)
    wfx = jnp.asarray(rng.standard_normal(ge.S))
    wfy = jnp.asarray(rng.standard_normal(ge.S))

    sx_, sy_ = ge._spread_pair(wfx, wfy)
    Fx, Fy = ge.fft_plan.rfft2_stack([sx_, sy_])
    kx, ky = ge.kx_dev, ge.ky_dev
    wre = ge.multB * (ky * Fx.re - kx * Fy.re)
    wim = ge.multB * (ky * Fx.im - kx * Fy.im)
    Nx, Ny = ge.grid.Nx, ge.grid.Ny
    u_spec = ge.fft_plan.irfft2_real_corner(
        Cx(ky * wre, ky * wim), Nx, Ny, ge.sx_cells, ge.sy_cells)
    u_spec = u_spec + jnp.sum(wfx) / (8 * jnp.pi)
    u_full, v_full, p_full = ge(wfx, wfy)

    pieces = {
        "spread": np.asarray(sx_),
        "Fx_re": np.asarray(Fx.re), "Fx_im": np.asarray(Fx.im),
        "multB": np.asarray(ge.multB), "multQ": np.asarray(ge.multQ),
        "deconv": np.asarray(ge.deconv_half),
        "kk": np.asarray(jnp.sqrt(ge.kx_half**2 + ge.ky_row**2)),
        "u_spec": np.asarray(u_spec),
        "u_full": np.asarray(u_full), "p_full": np.asarray(p_full),
        "CA": np.asarray(ge.CA), "CB2": np.asarray(ge.CB2),
        "CP": np.asarray(ge.CP),
    }
    dump = os.environ.get("VG_DUMP")
    cmp_ = os.environ.get("VG_CMP")
    if dump:
        os.makedirs(dump, exist_ok=True)
        for k, v in pieces.items():
            np.save(os.path.join(dump, k + ".npy"), v)
        print(f"dumped to {dump}", flush=True)
    if cmp_:
        for k, v in pieces.items():
            ref = np.load(os.path.join(cmp_, k + ".npy"))
            if ref.shape != v.shape:
                print(f"  {k}: SHAPE {v.shape} vs {ref.shape}", flush=True)
                continue
            d = np.abs(v - ref)
            s = max(np.abs(ref).max(), 1e-300)
            print(f"  {k}: max abs {d.max():.3e}  rel-to-peak "
                  f"{d.max()/s:.3e}", flush=True)


if __name__ == "__main__":
    main()
