"""Layer-by-layer accuracy bisection of the Stokes BIE pieces at bench
size ON TPU, without building the full solver (each full-solve A/B costs
~25 min through the tunnel-compile tax; this isolates in ~10).

Checks, for a smooth test density tau on the boundary:
  1. device-QFS vs host-QFS effective density xi (the compose A/B)
  2. residual  A xi - F tau  on the curve, per backend (host matrices)
  3. grid evaluator (u,v,p) from xi vs host direct dense quadrature at a
     subset of physical grid points (the VG + patch-correction A/B)
Usage: BENCH_NB=2700 BENCH_M=20 python tools/acc_bisect_stokes.py
       ACC_SECTIONS=qfs,ge,strat selects sections (default all).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def host_stokes_slp(sx, sy, wfx, wfy, tx, ty, chunk=2048):
    u = np.empty(tx.size)
    v = np.empty(tx.size)
    p = np.empty(tx.size)
    for s in range(0, tx.size, chunk):
        sl = slice(s, min(s + chunk, tx.size))
        dx = tx[sl, None] - sx[None, :]
        dy = ty[sl, None] - sy[None, :]
        r2 = dx * dx + dy * dy
        ilr = -0.5 * np.log(r2)
        ir2 = 1.0 / r2
        u[sl] = ((ilr + dx * dx * ir2) @ wfx + (dx * dy * ir2) @ wfy) \
            / (4 * np.pi)
        v[sl] = ((dx * dy * ir2) @ wfx + (ilr + dy * dy * ir2) @ wfy) \
            / (4 * np.pi)
        p[sl] = ((dx * ir2) @ wfx + (dy * ir2) @ wfy) / (2 * np.pi)
    return u, v, p


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    import jax.numpy as jnp
    from ipde_tpu.geometry.collection import EmbeddedBoundaryCollection
    from ipde_tpu.geometry.curve import star
    from ipde_tpu.geometry.embedded_boundary import EmbeddedBoundary
    from ipde_tpu.ops import stokes_kernels as sk
    from ipde_tpu.solvers.vector import stokes_qfs

    nb = int(os.environ.get("BENCH_NB", 2700))
    M = int(os.environ.get("BENCH_M", 20))
    sections = os.environ.get("ACC_SECTIONS", "qfs,ge,strat").split(",")
    t0 = time.time()
    bdy = star(nb, a=0.2, f=5)
    bh = min(bdy.min_h(), 0.6 / np.abs(bdy.curvature).max() / M)
    # mirror bench.py's grid sizing so failures reproduce at the north-star
    # resolution (BENCH_GRID=0 keeps the boundary-derived h)
    if os.environ.get("BENCH_BH"):
        bh = min(bh, float(os.environ["BENCH_BH"]))
    else:
        tg = int(os.environ.get("BENCH_GRID", 0))
        if tg:
            extent = float(bdy.x.max() - bdy.x.min())
            bh = min(bh, extent / (tg - 3 * M))
    ebdy = EmbeddedBoundary(bdy, True, M, bh, qfs_tolerance=1e-14)
    ebdyc = EmbeddedBoundaryCollection([ebdy])
    grid = ebdyc.generate_grid(bh)
    print(f"geometry {time.time()-t0:.0f}s grid={grid.shape} "
          f"backend={jax.default_backend()}", flush=True)

    e = ebdy
    src = e.qfs_source_for_side("bdy", interior_eval=True)
    src.dev()
    # smooth but non-trivial density
    t = bdy.t
    tau = np.concatenate([np.sin(3 * t) + 0.3 * np.cos(7 * t) + 0.2,
                          np.cos(2 * t) - 0.4 * np.sin(5 * t)])
    tau_d = jnp.asarray(tau)

    xi_host = None
    if "qfs" in sections or "qfsd" in sections:
        t0 = time.time()
        q_dev = stokes_qfs(e.bdy, src, True, slp=False, dlp=True,
                           build_u2s=False, backend="device")
        xi_dev = np.asarray(q_dev([tau_d]))
        print(f"device qfs {time.time()-t0:.0f}s", flush=True)
        pairs = [("dev ", xi_dev)]
        if "qfs" in sections:      # 'qfsd' skips the ~8 min host compose
            t0 = time.time()
            q_host = stokes_qfs(e.bdy, src, True, slp=False, dlp=True,
                                build_u2s=False, backend="host")
            xi_host = np.asarray(q_host([tau_d]))
            print(f"host qfs {time.time()-t0:.0f}s", flush=True)
            print(f"|xi_dev - xi_host|_inf = "
                  f"{np.abs(xi_dev-xi_host).max():.3e}  "
                  f"(|xi| ~ {np.abs(xi_host).max():.3e})", flush=True)
            pairs.append(("host", xi_host))

        # residual check on host: A xi vs F tau
        t0 = time.time()
        A = (sk.stokes_slp_naive(src, bdy.x, bdy.y)
             + sk.stokes_pressure_fix(src, bdy.normal_x, bdy.normal_y))
        Fm = sk.stokes_dlp_self(bdy) - 0.5 * np.eye(2 * nb)
        from ipde_tpu.qfs.qfs import _filter_rows
        rhs = _filter_rows(Fm, nb) @ tau
        for name, xi in pairs:
            r = A @ xi - rhs
            print(f"residual {name}: |A xi - F tau|_inf = "
                  f"{np.abs(r).max():.3e}", flush=True)
        print(f"host matrices {time.time()-t0:.0f}s", flush=True)
        if xi_host is None:
            xi_host = xi_dev
    if not {"ge", "strat"} & set(sections):
        return
    if xi_host is None:
        # evaluator-only run: any smooth source density works for the A/B
        ts = np.asarray(src.t)
        xi_host = np.concatenate([np.sin(2 * ts) + 0.3 * np.cos(5 * ts),
                                  np.cos(3 * ts) - 0.2 * np.sin(4 * ts)])

    # grid evaluator vs host direct at a subset of physical points
    from ipde_tpu.ops.grid_eval import StokesFreespaceGridEvaluator
    g = ebdyc.grid
    px = g.xg[ebdyc.phys]
    py = g.yg[ebdyc.phys]
    bounds = ((float(px.min()), float(px.max())),
              (float(py.min()), float(py.max())))
    t0 = time.time()
    ge = StokesFreespaceGridEvaluator(g, src.x, src.y, target_bounds=bounds,
                                      target_hull=ebdyc.phys_extremes())
    print(f"grid evaluator built {time.time()-t0:.0f}s", flush=True)
    w = np.asarray(src.weights)
    wfx = xi_host[:src.N] * w
    wfy = xi_host[src.N:] * w
    t0 = time.time()
    gu, gv, gp = ge(jnp.asarray(wfx), jnp.asarray(wfy))
    gu = np.asarray(gu)[ebdyc.phys]
    gv = np.asarray(gv)[ebdyc.phys]
    gp = np.asarray(gp)[ebdyc.phys]
    print(f"grid eval {time.time()-t0:.0f}s", flush=True)
    rng = np.random.default_rng(0)
    idx = rng.choice(px.size, size=min(400, px.size), replace=False)
    hu, hv, hp = host_stokes_slp(np.asarray(src.x), np.asarray(src.y),
                                 wfx, wfy, px[idx], py[idx])
    hp = hp - hp.mean() + gp[idx].mean()   # pressure defined up to const
    print(f"grid-eval vs direct: u {np.abs(gu[idx]-hu).max():.3e}  "
          f"v {np.abs(gv[idx]-hv).max():.3e}  "
          f"p {np.abs(gp[idx]-hp).max():.3e}", flush=True)

    # stratified radial apply vs direct at a subset of radial points
    from ipde_tpu.ops.stratified import StratifiedRadialApply
    plan = StratifiedRadialApply(src, e.radial_x, e.radial_y,
                                 k_density=nb // 2)
    print(f"stratified pair fraction {plan.pair_fraction:.3f} "
          f"strides {plan.strides.tolist()}", flush=True)
    sN = src.N
    sig = jnp.asarray(xi_host)
    ru, rv, rp = plan.apply(
        lambda sx, sy, ws, f, tx, ty: sk.stokes_slp_apply(
            sx, sy, sig[:sN][::f] * ws, sig[sN:][::f] * ws, tx, ty),
        n_out=3)
    ru = np.asarray(ru).ravel()
    rv = np.asarray(rv).ravel()
    rx = e.radial_x.ravel()
    ry = e.radial_y.ravel()
    idx = rng.choice(rx.size, size=min(400, rx.size), replace=False)
    hu, hv, _ = host_stokes_slp(np.asarray(src.x), np.asarray(src.y),
                                wfx, wfy, rx[idx], ry[idx])
    print(f"radial apply vs direct: u {np.abs(ru[idx]-hu).max():.3e}  "
          f"v {np.abs(rv[idx]-hv).max():.3e}", flush=True)


if __name__ == "__main__":
    main()
