"""Accuracy scan of the flagship interior solves across (nb, M).

Prints the final BIE-corrected max error plus per-stage diagnostics
(annular GMRES iterations, fft-vs-dense grid backend difference) so
accuracy regressions are attributable.  Usage:
    SCAN_PDE=poisson SCAN_CASES="400,12 800,12 1600,14" python tools/acc_scan.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    from ipde_tpu.functions import BoundaryFunction, EmbeddedFunction
    from ipde_tpu.geometry.collection import EmbeddedBoundaryCollection
    from ipde_tpu.geometry.curve import star
    from ipde_tpu.geometry.embedded_boundary import EmbeddedBoundary
    from ipde_tpu.solvers.bie import DirichletBIE, StokesDirichletBIE
    from ipde_tpu.solvers.scalar import PoissonSolver
    from ipde_tpu.solvers.vector import StokesSolver
    from ipde_tpu.utils.planify import planified

    pde = os.environ.get("SCAN_PDE", "poisson")
    cases = [tuple(int(v) for v in c.split(","))
             for c in os.environ.get("SCAN_CASES", "400,12 800,12").split()]
    backend = os.environ.get("SCAN_BACKEND", "fft")

    for nb, M in cases:
        t0 = time.time()
        bdy = star(nb, a=0.2, f=5)
        bh = min(bdy.min_h(), 0.6 / np.abs(bdy.curvature).max() / M)
        ebdy = EmbeddedBoundary(bdy, True, M, bh, qfs_tolerance=1e-14)
        ebdyc = EmbeddedBoundaryCollection([ebdy])
        grid = ebdyc.generate_grid(bh)
        phys = np.asarray(ebdyc.phys)
        if pde == "stokes":
            usol = lambda x, y: np.sin(x) * np.cos(y) + 0.2 * np.cos(2 * y)
            vsol = lambda x, y: -np.cos(x) * np.sin(y) + 0.1 * np.sin(2 * x)
            fuf = lambda x, y: (2 * np.sin(x) * np.cos(y) + 0.8 * np.cos(2 * y)
                                - np.sin(x) * np.sin(y))
            fvf = lambda x, y: (-2 * np.cos(x) * np.sin(y)
                                + 0.4 * np.sin(2 * x)
                                + np.cos(x) * np.cos(y))
            fu = EmbeddedFunction.from_function(ebdyc, fuf)
            fv = EmbeddedFunction.from_function(ebdyc, fvf)
            ua = EmbeddedFunction.from_function(ebdyc, usol)
            va = EmbeddedFunction.from_function(ebdyc, vsol)
            bc_u = BoundaryFunction.from_function(ebdyc, usol)
            bc_v = BoundaryFunction.from_function(ebdyc, vsol)
            solver = StokesSolver(ebdyc, grid_backend=backend)
            bie = StokesDirichletBIE(solver)

            def step(fg, fr, gg, gr):
                (u, v, p), st = solver.solve_with_stats(
                    EmbeddedFunction(fg, [fr]), EmbeddedFunction(gg, [gr]),
                    tol=1e-12, maxiter=100, restart=30)
                u, v, p = bie.apply_bc(u, v, p, bc_u, bc_v)
                return (u.grid, u.radials[0], v.grid, v.radials[0],
                        st["annular_iterations"], st["annular_residuals"])

            jstep = planified(step, solver, bie)
            out = jstep(fu.grid, fu.radials[0], fv.grid, fv.radials[0])
            ug, ur, vg, vr, iters, resid = [np.asarray(o) for o in out]
            ge = max(np.abs(ug - np.asarray(ua.grid))[phys].max(),
                     np.abs(vg - np.asarray(va.grid))[phys].max())
            re = max(np.abs(ur - np.asarray(ua.radials[0])).max(),
                     np.abs(vr - np.asarray(va.radials[0])).max())
            if os.environ.get("SCAN_DETAIL"):
                eu = np.abs(ur - np.asarray(ua.radials[0]))
                ev = np.abs(vr - np.asarray(va.radials[0]))
                print("per-row radial err (row 0 = lb side):", flush=True)
                for i in range(eu.shape[0]):
                    print(f"  row {i:2d}: u {eu[i].max():.2e} "
                          f"v {ev[i].max():.2e}", flush=True)
        else:
            sol = lambda x, y: -np.cos(x) * np.exp(np.sin(x)) * np.sin(y)
            frc = lambda x, y: ((2.0 * np.cos(x) + 3.0 * np.cos(x) * np.sin(x)
                                 - np.cos(x) ** 3) * np.exp(np.sin(x))
                                * np.sin(y))
            f = EmbeddedFunction.from_function(ebdyc, frc)
            ua = EmbeddedFunction.from_function(ebdyc, sol)
            bc = BoundaryFunction.from_function(ebdyc, sol)
            solver = PoissonSolver(ebdyc, grid_backend=backend)
            bie = DirichletBIE(solver)

            def step(fg, fr):
                ue, st = solver.solve_with_stats(
                    EmbeddedFunction(fg, [fr]), tol=1e-12, maxiter=100,
                    restart=30)
                ue = bie.apply_bc(ue, bc)
                return (ue.grid, ue.radials[0], st["annular_iterations"],
                        st["annular_residuals"])

            jstep = planified(step, solver, bie)
            out = jstep(f.grid, f.radials[0])
            ug, ur, iters, resid = [np.asarray(o) for o in out]
            ge = np.abs(ug - np.asarray(ua.grid))[phys].max()
            re = np.abs(ur - np.asarray(ua.radials[0])).max()
        print(f"{pde} nb={nb} M={M} grid={grid.shape} bh={bh:.5f} "
              f"iters={iters} resid={resid} grid_err={ge:.2e} "
              f"radial_err={re:.2e}  [{time.time()-t0:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()
