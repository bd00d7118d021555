"""Benchmark: full interior STOKES solve on one chip, TIERED so a metric
line is ALWAYS emitted (VERDICT r3 item 1: a bench that can time out
without first printing a smaller-size number is a broken bench).

Tier 1 runs a guaranteed-completable ~250k-dof configuration (nb=1200,
M=16, 1024^2-class grid) and prints its JSON line IMMEDIATELY; tier 2
then attempts the 2048^2 north star (BASELINE.md:27; nb=2700, M=20)
under a self-imposed wall-clock budget (BENCH_BUDGET_S, default 3000 s)
and prints an updated line if it finishes.  The driver's parse therefore
always sees a real TPU number, whatever happens to the big run.

Setting any of BENCH_NB / BENCH_M / BENCH_GRID / BENCH_BH pins a single
explicit configuration instead (used by tools/ and tpu_checklist.sh).
BENCH_PDE=poisson selects the scalar flagship path.

Each metric line:
  {"metric": "interior_stokes_solve_ms", "value": ..., "unit": "ms",
   "vs_baseline": ...}
plus phase breakdown keys (setup_s, compile_s, err, dof, grid, tier).

Baseline: the reference's CPU record for the inhomogeneous Poisson solve,
891 ms at 309k dof and 3026 ms at 955k dof (reference:
examples/poisson_for_paper.py:128,131), linearly scaled to this problem's
dof count.  vs_baseline > 1 means faster than the reference.

The jitted step receives every solver plan array as an ARGUMENT (see
ipde_tpu/utils/planify.py), so the program has no large embedded constants
and compiles at production grid sizes.
"""

import json
import os
import sys
import time

import numpy as np

_T_START = time.time()


def run_config(nb, M, grid_target, pde, tier):
    """Build geometry + solver at one configuration, time the jitted
    solve, and print one JSON metric line.  Returns the parsed record."""
    import jax
    jax.config.update("jax_enable_x64", True)
    # BENCH_PLATFORM=cpu pins the CPU backend for local smoke tests (the
    # axon sitecustomize overrides the JAX_PLATFORMS env var)
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ipde_tpu.functions import BoundaryFunction, EmbeddedFunction
    from ipde_tpu.geometry.collection import EmbeddedBoundaryCollection
    from ipde_tpu.geometry.curve import star
    from ipde_tpu.geometry.embedded_boundary import EmbeddedBoundary
    from ipde_tpu.solvers.bie import DirichletBIE
    from ipde_tpu.solvers.scalar import PoissonSolver
    from ipde_tpu.utils.planify import planified

    t0 = time.time()
    bdy = star(nb, a=0.2, f=5)
    bh = min(bdy.min_h(), 0.6 / np.abs(bdy.curvature).max() / M)
    # BENCH_BH forces a finer grid than the boundary requires; otherwise
    # grid_target sizes h so the auto-generated box lands on a
    # grid_target^2-class grid
    if os.environ.get("BENCH_BH"):
        bh = min(bh, float(os.environ["BENCH_BH"]))
    elif grid_target:
        extent = float(bdy.x.max() - bdy.x.min())
        bh = min(bh, extent / (grid_target - 3 * M))
    ebdy = EmbeddedBoundary(bdy, True, M, bh, qfs_tolerance=1e-14)
    ebdyc = EmbeddedBoundaryCollection([ebdy])
    grid = ebdyc.generate_grid(bh)

    if pde == "stokes":
        from ipde_tpu.solvers.bie import StokesDirichletBIE
        from ipde_tpu.solvers.vector import StokesSolver
        usol = lambda x, y: np.sin(x) * np.cos(y) + 0.2 * np.cos(2 * y)
        vsol = lambda x, y: -np.cos(x) * np.sin(y) + 0.1 * np.sin(2 * x)
        fuf = lambda x, y: (2 * np.sin(x) * np.cos(y) + 0.8 * np.cos(2 * y)
                            - np.sin(x) * np.sin(y))
        fvf = lambda x, y: (-2 * np.cos(x) * np.sin(y) + 0.4 * np.sin(2 * x)
                            + np.cos(x) * np.cos(y))
        fu = EmbeddedFunction.from_function(ebdyc, fuf)
        fv = EmbeddedFunction.from_function(ebdyc, fvf)
        ua = EmbeddedFunction.from_function(ebdyc, usol)
        bc_u = BoundaryFunction.from_function(ebdyc, usol)
        bc_v = BoundaryFunction.from_function(ebdyc, vsol)
        solver = StokesSolver(ebdyc)
        bie = StokesDirichletBIE(solver)
        f = fu

        def step(f_grid, f_radial):
            fue = EmbeddedFunction(f_grid, [f_radial])
            (u, v, p), stats = solver.solve_with_stats(fue, fv, tol=1e-12,
                                                       maxiter=100,
                                                       restart=30)
            u, v, p = bie.apply_bc(u, v, p, bc_u, bc_v)
            return u.grid, u.radials[0], stats

        metric = "interior_stokes_solve_ms"
    else:
        sol = lambda x, y: -np.cos(x) * np.exp(np.sin(x)) * np.sin(y)
        frc = lambda x, y: ((2.0 * np.cos(x) + 3.0 * np.cos(x) * np.sin(x)
                             - np.cos(x) ** 3) * np.exp(np.sin(x)) * np.sin(y))
        f = EmbeddedFunction.from_function(ebdyc, frc)
        ua = EmbeddedFunction.from_function(ebdyc, sol)
        bc = BoundaryFunction.from_function(ebdyc, sol)
        solver = PoissonSolver(ebdyc)
        bie = DirichletBIE(solver)

        def step(f_grid, f_radial):
            ef = EmbeddedFunction(f_grid, [f_radial])
            ue, stats = solver.solve_with_stats(ef, tol=1e-12, maxiter=100,
                                                restart=30)
            ue = bie.apply_bc(ue, bc)
            return ue.grid, ue.radials[0], stats

        metric = "interior_poisson_solve_ms"

    setup_s = time.time() - t0
    print(f"# [{tier}] setup {setup_s:.1f}s grid={grid.shape} pde={pde} "
          f"nb={nb} M={M} backend={jax.default_backend()}", file=sys.stderr,
          flush=True)

    pstep = planified(step, solver, bie)
    # executable disk cache (default ON at a per-user tempdir path;
    # IPDE_AOT_CACHE=<dir> overrides, =0 disables): reruns of the same
    # shape skip the ~150 s tunnel compile (utils/aot_cache.py)
    from ipde_tpu.utils.aot_cache import maybe_aot
    jstep = maybe_aot(pstep, (f.grid, f.radials[0]), f"bench-{pde}-{nb}-{M}")

    # NOTE: through remote-execution tunnels block_until_ready can return
    # before the device finishes; a scalar host fetch is the only honest
    # synchronization.  We fold its round-trip latency out by measuring it.
    def run_once():
        out = jstep(f.grid, f.radials[0])
        _ = float(jnp.sum(out[0]))   # forces completion
        return out

    tiny = jax.jit(lambda x: x + 1.0)
    _ = float(tiny(jnp.asarray(0.0)))
    t0 = time.time()
    for _ in range(5):
        _ = float(tiny(jnp.asarray(0.0)))
    latency = (time.time() - t0) / 5
    print(f"# host round-trip latency {latency*1e3:.1f} ms", file=sys.stderr,
          flush=True)
    t0 = time.time()
    out = run_once()
    compile_s = time.time() - t0
    print(f"# compile+first run {compile_s:.1f}s", file=sys.stderr, flush=True)

    times = []
    for _ in range(3):
        t0 = time.time()
        out = run_once()
        times.append(time.time() - t0 - latency)
    ms = float(max(np.median(times), 1e-6) * 1e3)

    # accuracy guard (reported to stderr, not the metric line)
    ue_grid, ue_rad, stats = out
    ge = float(np.abs(np.asarray(ue_grid) - np.asarray(ua.grid))
               [np.asarray(ebdyc.phys)].max())
    re = float(np.abs(np.asarray(ue_rad) - np.asarray(ua.radials[0])).max())
    err = max(ge, re)
    print(f"# max err {err:.2e} (grid {ge:.2e}, radial {re:.2e})",
          file=sys.stderr, flush=True)
    try:
        its = np.asarray(stats["annular_iterations"]).ravel()
        res = np.asarray(stats["annular_residuals"]).ravel()
        print(f"# annular iterations {its.tolist()} "
              f"final residual {float(np.abs(res).max()):.2e}",
              file=sys.stderr, flush=True)
    except Exception as exc:
        print(f"# (stats unavailable: {exc})", file=sys.stderr, flush=True)

    # MFU accounting (VERDICT r4 item 2): logical flops of the LOWERED
    # step (pre-optimization cost analysis -- f64 ops counted once, the
    # "useful flops" convention of tools/profile_solve.py, not the TPU
    # f64-emulation expansion) against chip peak (IPDE_PEAK_TFLOPS,
    # default 197 = v5e bf16).  One extra trace, no extra compile.
    peak_tflops = float(os.environ.get("IPDE_PEAK_TFLOPS", 197.0))
    gflops = mfu_pct = gbytes = None
    try:
        lowered = pstep.inner.lower(pstep.plans, f.grid, f.radials[0])
        ca = lowered.cost_analysis()
        if ca is None:
            # some backends (axon tunnel) only expose cost analysis on the
            # COMPILED executable; the XLA persistent cache makes this a
            # cache hit of the executable built seconds ago
            ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        if ca is None:
            raise RuntimeError("cost_analysis unavailable on this backend")
        gflops = float(ca.get("flops", 0.0)) / 1e9
        gbytes = float(ca.get("bytes accessed", 0.0)) / 1e9
        mfu_pct = 100.0 * (gflops / (ms * 1e-3)) / (peak_tflops * 1e3)
        print(f"# mfu {mfu_pct:.3f}% of {peak_tflops:.0f} TF/s peak "
              f"({gflops:.1f} GF, {gbytes:.1f} GB accessed, {ms:.1f} ms)",
              file=sys.stderr, flush=True)
    except Exception as exc:               # pragma: no cover - accounting only
        print(f"# (mfu accounting failed: {type(exc).__name__}: {exc})",
              file=sys.stderr, flush=True)

    dof = int(ebdyc.phys.sum() + sum(np.prod(e.radial_shape) for e in ebdyc))
    # reference CPU record: 891 ms inhomogeneous Poisson at 309k dof
    # (poisson_for_paper.py:128,131), linear in dof.  Stokes costs the
    # reference strictly MORE per iteration (BASELINE.md), so the same
    # per-dof scaling is a conservative baseline for the Stokes metric.
    baseline_ms = 891.0 * (dof / 309000.0)
    rec = {
        "metric": metric,
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / ms, 3),
        "setup_s": round(setup_s, 1),
        "compile_s": round(compile_s, 1),
        "err": float(f"{err:.3e}"),
        "dof": dof,
        "grid": list(grid.shape),
        "tier": tier,
        "mfu_pct": None if mfu_pct is None else round(mfu_pct, 4),
        "gflops": None if gflops is None else round(gflops, 2),
        "gbytes": None if gbytes is None else round(gbytes, 2),
    }
    print(json.dumps(rec), flush=True)
    return rec


def run_config_with_fallback(nb, M, grid_target, pde, tier):
    """Never leave a tier without a metric: if the Stokes path raises,
    fall back to the scalar flagship path at the same size."""
    try:
        return run_config(nb, M, grid_target, pde, tier)
    except Exception as e:              # pragma: no cover - driver resilience
        print(f"# [{tier}] {pde} bench failed ({type(e).__name__}: {e}); "
              f"falling back to poisson", file=sys.stderr, flush=True)
        if pde == "poisson":
            raise
        return run_config(nb, M, grid_target, "poisson", tier)


def _device_alive(timeout_s: int = 900) -> bool:
    """Bounded liveness probe in a SUBPROCESS: a wedged axon tunnel hangs
    any in-process device op indefinitely (no Python-level timeout can
    interrupt XLA), which would hang the whole bench run.  Skipped when a
    platform is pinned (CPU smoke tests)."""
    if os.environ.get("BENCH_PLATFORM") or os.environ.get("BENCH_NO_PROBE"):
        return True
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "print(float(jnp.sum(jnp.arange(8.0))))"],
            timeout=timeout_s, capture_output=True, text=True)
        return "28.0" in r.stdout
    except Exception:
        return False


def main():
    pde = os.environ.get("BENCH_PDE", "stokes")
    pinned = any(os.environ.get(k) for k in
                 ("BENCH_NB", "BENCH_M", "BENCH_GRID", "BENCH_BH"))
    if pinned:
        nb = int(os.environ.get("BENCH_NB", 2700))
        M = int(os.environ.get("BENCH_M", 20))
        grid_target = int(os.environ.get("BENCH_GRID", 2048))
        run_config_with_fallback(nb, M, grid_target, pde, "pinned")
        return

    budget = float(os.environ.get("BENCH_BUDGET_S", 3000))
    # tier 1: guaranteed-completable (r04 hardware: setup+compile+solve
    # well under the driver budget at this size), metric printed at once
    run_config_with_fallback(1200, 16, 1024, pde, "tier1")

    # tier 2: the 2048^2 north star, only with comfortable headroom --
    # the tier-1 line already banked a real number, so a driver kill
    # mid-tier-2 loses nothing
    elapsed = time.time() - _T_START
    if elapsed > budget * 0.45:
        print(f"# tier2 skipped: {elapsed:.0f}s elapsed of {budget:.0f}s "
              f"budget", file=sys.stderr, flush=True)
        return
    try:
        run_config(2700, 20, 2048, pde, "tier2")
    except Exception as e:              # pragma: no cover
        print(f"# tier2 failed ({type(e).__name__}: {e}); tier1 metric "
              f"stands", file=sys.stderr, flush=True)


if __name__ == "__main__":
    if not _device_alive():
        print("# device liveness probe failed (wedged tunnel?); no timing "
              "possible", file=sys.stderr)
        print(json.dumps({"metric": "interior_stokes_solve_ms", "value": None,
                          "unit": "ms", "vs_baseline": None,
                          "error": "tpu tunnel unavailable"}))
        sys.exit(0)
    main()
