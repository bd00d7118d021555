"""Device-HBM audit of the bench-size solver build: prints live HBM use
after each construction stage plus the biggest persistent plan arrays.
Usage: BENCH_NB=2700 BENCH_M=20 BENCH_PDE=stokes python tools/mem_audit.py
"""

import gc
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _free_hbm_gib():
    """Largest allocatable contiguous block, by binary search."""
    import jax.numpy as jnp
    gc.collect()
    lo, hi = 0.0, 16.0
    best = 0.0
    for _ in range(7):
        mid = 0.5 * (lo + hi)
        n = int(mid * 2**30 / 8)
        try:
            a = jnp.zeros((n,), jnp.float64)
            a.block_until_ready()
            del a
            best = mid
            lo = mid
        except Exception:
            hi = mid
    return best


def hbm(tag):
    # live-arrays only by default: the free-block probe allocates ~15 GiB
    # transiently and through the tunnel its deallocation is asynchronous,
    # contaminating every later stage (measured: runs OOM at stages that
    # succeed probe-free).  Set MEM_PROBE=1 to include it anyway.
    import jax
    gc.collect()
    live = sum(a.nbytes for a in jax.live_arrays()
               if not a.is_deleted()) / 2**30
    extra = ""
    if os.environ.get("MEM_PROBE"):
        extra = f"  free-block {_free_hbm_gib():6.2f} GiB"
    print(f"[{time.strftime('%H:%M:%S')}] {tag:34s} live {live:6.2f} GiB"
          f"{extra}", flush=True)


def biggest_arrays(limit=25):
    import jax
    gc.collect()
    rows = []
    for a in jax.live_arrays():
        try:
            if a.is_deleted():
                continue
        except Exception:
            continue
        rows.append((a.nbytes, a.shape, a.dtype))
    rows.sort(reverse=True)
    tot = sum(r[0] for r in rows)
    print(f"live jax.Arrays: {len(rows)}  logical total {tot/2**30:.2f} GiB",
          flush=True)
    for nb, shape, dt in rows[:limit]:
        print(f"  {nb/2**20:9.1f} MiB  {dt} {shape}", flush=True)


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    from ipde_tpu.geometry.collection import EmbeddedBoundaryCollection
    from ipde_tpu.geometry.curve import star
    from ipde_tpu.geometry.embedded_boundary import EmbeddedBoundary

    nb = int(os.environ.get("BENCH_NB", 2700))
    M = int(os.environ.get("BENCH_M", 20))
    pde = os.environ.get("BENCH_PDE", "stokes")
    hbm("start")
    bdy = star(nb, a=0.2, f=5)
    bh = min(bdy.min_h(), 0.6 / np.abs(bdy.curvature).max() / M)
    ebdy = EmbeddedBoundary(bdy, True, M, bh, qfs_tolerance=1e-14)
    ebdyc = EmbeddedBoundaryCollection([ebdy])
    grid = ebdyc.generate_grid(bh)
    hbm(f"geometry grid={grid.shape}")
    if pde == "stokes":
        from ipde_tpu.solvers.bie import StokesDirichletBIE, _invert_system
        from ipde_tpu.solvers.vector import StokesSolver, stokes_qfs
        solver = StokesSolver(ebdyc)
        hbm("StokesSolver")
        biggest_arrays()
        # staged BIE construction (mirrors StokesDirichletBIE.__init__)
        from ipde_tpu.ops import forms_dev as fd
        import jax.numpy as jnp
        e = ebdyc.ebdys[0]
        b = e.bdy
        blkA = (fd.stokes_dlp_self_dev(b) - 0.5 * jnp.eye(2 * b.N)
                + fd.stokes_pressure_fix_dev(b, b.normal_x, b.normal_y))
        blkA.block_until_ready()
        hbm("BIE blocks")
        biggest_arrays(5)
        offs = np.array([0, 2 * b.N])
        A_dev, Ainv = _invert_system([[blkA]], offs, "device")
        hbm("BIE invert")
        biggest_arrays(5)
        src = e.qfs_source_for_side("bdy", interior_eval=e.interior)
        src.dev()
        q = stokes_qfs(e.bdy, src, e.interior, slp=not e.interior,
                       dlp=True, build_u2s=False)
        hbm("BIE qfs")
        biggest_arrays(8)
        from ipde_tpu.ops.grid_eval import StokesFreespaceGridEvaluator
        g = ebdyc.grid
        px = g.xg[ebdyc.phys]
        py = g.yg[ebdyc.phys]
        bounds = ((float(px.min()), float(px.max())),
                  (float(py.min()), float(py.max())))
        ge = StokesFreespaceGridEvaluator(g, src.x, src.y,
                                          target_bounds=bounds,
                                          target_hull=ebdyc.phys_extremes())
        hbm("BIE grid_eval")
    else:
        from ipde_tpu.solvers.bie import DirichletBIE
        from ipde_tpu.solvers.scalar import PoissonSolver
        solver = PoissonSolver(ebdyc)
        hbm("PoissonSolver")
        biggest_arrays()
        bie = DirichletBIE(solver)
        hbm("DirichletBIE")
    biggest_arrays()


if __name__ == "__main__":
    main()
