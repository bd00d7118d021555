"""Profile the SETUP phase (geometry + solver + BIE construction) of the
flagship Stokes path, by wall-clock section and cProfile cumulative.

Usage:  BENCH_NB=1200 BENCH_M=16 python tools/profile_setup.py
"""

import cProfile
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    from ipde_tpu.geometry.collection import EmbeddedBoundaryCollection
    from ipde_tpu.geometry.curve import star
    from ipde_tpu.geometry.embedded_boundary import EmbeddedBoundary

    nb = int(os.environ.get("BENCH_NB", 1200))
    M = int(os.environ.get("BENCH_M", 16))
    pde = os.environ.get("BENCH_PDE", "stokes")

    t0 = time.time()
    bdy = star(nb, a=0.2, f=5)
    bh = min(bdy.min_h(), 0.6 / np.abs(bdy.curvature).max() / M)
    ebdy = EmbeddedBoundary(bdy, True, M, bh, qfs_tolerance=1e-14)
    t_geom = time.time() - t0
    t0 = time.time()
    ebdyc = EmbeddedBoundaryCollection([ebdy])
    grid = ebdyc.generate_grid(bh)
    t_reg = time.time() - t0
    print(f"geom {t_geom:.1f}s  register {t_reg:.1f}s  grid={grid.shape}")

    pr = cProfile.Profile()
    t0 = time.time()
    pr.enable()
    if pde == "stokes":
        from ipde_tpu.solvers.vector import StokesSolver
        solver = StokesSolver(ebdyc)
    else:
        from ipde_tpu.solvers.scalar import PoissonSolver
        solver = PoissonSolver(ebdyc)
    pr.disable()
    t_solver = time.time() - t0
    print(f"solver ctor {t_solver:.1f}s")

    pr2 = cProfile.Profile()
    t0 = time.time()
    pr2.enable()
    if pde == "stokes":
        from ipde_tpu.solvers.bie import StokesDirichletBIE
        bie = StokesDirichletBIE(solver)
    else:
        from ipde_tpu.solvers.bie import DirichletBIE
        bie = DirichletBIE(solver)
    pr2.disable()
    t_bie = time.time() - t0
    print(f"bie ctor {t_bie:.1f}s")

    for name, p in [("solver", pr), ("bie", pr2)]:
        print(f"\n=== {name} cumulative top 25 ===")
        st = pstats.Stats(p, stream=sys.stdout)
        st.sort_stats("cumulative").print_stats(25)


if __name__ == "__main__":
    main()
