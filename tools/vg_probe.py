"""Sub-phase timing of the Stokes VG (Vico-Greengard) grid evaluator on
the chip, plus the Pallas-ds dense Stokeslet alternative at the SAME
(S sources, T targets) shape.

The r04 tier-1 profile puts the VG Stokeslet apply at ~306 ms and the
solve pays it TWICE (solver glue + BIE apply_bc) -- ~60% of the 1076 ms
full solve.  This probe answers: where inside (spread / forward rfft2 /
symbol+inverse corner / patch corrections), and would the O(S*T) Pallas
double-single dense kernel beat the O(N^2 log N) FFT path outright at
bench sizes?

Usage:  BENCH_NB=1200 BENCH_M=16 BENCH_GRID=1024 python tools/vg_probe.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from profile_solve import sync, timeit  # noqa: E402


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
    from ipde_tpu.utils.planify import planified

    nb = int(os.environ.get("BENCH_NB", 1200))
    M = int(os.environ.get("BENCH_M", 16))
    t0 = time.time()
    bdy = star(nb, a=0.2, f=5)
    bh = min(bdy.min_h(), 0.6 / np.abs(bdy.curvature).max() / M)
    if os.environ.get("BENCH_GRID"):
        tg = int(os.environ["BENCH_GRID"])
        extent = float(bdy.x.max() - bdy.x.min())
        bh = min(bh, extent / (tg - 3 * M))
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
    S = ge.S
    T = int(ebdyc.phys.sum())
    print(f"setup {time.time()-t0:.1f}s grid={grid.shape} S={S} T={T} "
          f"padded=({ge.Px},{ge.Py}) spread_shape={ge.spread_shape} "
          f"patch_P={ge.patch_P} backend={jax.default_backend()}",
          flush=True)

    tiny = jax.jit(lambda x: x + 1.0)
    _ = float(tiny(jnp.asarray(0.0)))
    t0 = time.time()
    for _ in range(5):
        _ = float(tiny(jnp.asarray(0.0)))
    lat = (time.time() - t0) / 5
    print(f"latency {lat*1e3:.1f} ms", flush=True)

    rng = np.random.default_rng(0)
    wfx = jnp.asarray(rng.standard_normal(S))
    wfy = jnp.asarray(rng.standard_normal(S))

    # ---- full call ------------------------------------------------------
    full = planified(lambda a, b: ge(a, b), ge)
    ms, _ = timeit(full, wfx, wfy, latency=lat)
    print(f"VG full call         {ms:8.1f} ms", flush=True)

    # ---- sub-phases ------------------------------------------------------
    spread = planified(lambda a, b: (ge._spread(a), ge._spread(b)), ge)
    ms, _ = timeit(spread, wfx, wfy, latency=lat)
    print(f"  spread x2          {ms:8.1f} ms", flush=True)

    fwd = planified(lambda a, b: (ge.fft_plan.rfft2(ge._spread(a)),
                                  ge.fft_plan.rfft2(ge._spread(b))), ge)
    ms, FF = timeit(fwd, wfx, wfy, latency=lat)
    print(f"  spread+rfft2 x2    {ms:8.1f} ms", flush=True)

    Fx, Fy = FF
    Nx, Ny = ge.grid.Nx, ge.grid.Ny

    def spectral(Fxr, Fxi, Fyr, Fyi):
        Fx = Cx(Fxr, Fxi)
        Fy = Cx(Fyr, Fyi)
        kx, ky = ge.kx_dev, ge.ky_dev
        wre = ge.multB * (ky * Fx.re - kx * Fy.re)
        wim = ge.multB * (ky * Fx.im - kx * Fy.im)
        corner = lambda cc: ge.fft_plan.irfft2_real_corner(
            cc, Nx, Ny, ge.sx_cells, ge.sy_cells)
        u = corner(Cx(ky * wre, ky * wim))
        v = corner(Cx(-kx * wre, -kx * wim))
        sre = kx * Fx.re + ky * Fy.re
        sim = kx * Fx.im + ky * Fy.im
        p = corner(Cx(ge.multQ * sim, -ge.multQ * sre))
        return u, v, p

    spec = planified(spectral, ge)
    ms, _ = timeit(spec, Fx.re, Fx.im, Fy.re, Fy.im, latency=lat)
    print(f"  symbol+icorner x3  {ms:8.1f} ms", flush=True)

    one_inv = planified(
        lambda r, i: ge.fft_plan.irfft2_real_corner(
            Cx(r, i), Nx, Ny, ge.sx_cells, ge.sy_cells), ge)
    ms, _ = timeit(one_inv, Fx.re, Fx.im, latency=lat)
    print(f"  single icorner     {ms:8.1f} ms", flush=True)

    one_fwd = planified(lambda a: ge.fft_plan.rfft2(ge._spread(a)), ge)
    ms, _ = timeit(one_fwd, wfx, latency=lat)
    print(f"  single spread+fwd  {ms:8.1f} ms", flush=True)

    def patches(a, b):
        Pp = ge.patch_P
        dxs = jnp.repeat(ge.patch_nodex[:, None] + ge.patch_locx[None, :],
                         Pp, axis=1)
        dys = jnp.tile(ge.patch_nodey[:, None] + ge.patch_locy[None, :],
                       (1, Pp))
        rdot = dxs * a[:, None] + dys * b[:, None]
        pu = ge.CA * a[:, None] + ge.CB2 * dxs * rdot
        pv = ge.CA * b[:, None] + ge.CB2 * dys * rdot
        pp = ge.CP * rdot
        z = jnp.zeros((Nx, Ny))
        return tuple(ge._apply_patches([z, z, z], [pu, pv, pp]))

    pat = planified(patches, ge)
    ms, _ = timeit(pat, wfx, wfy, latency=lat)
    print(f"  patch corrections  {ms:8.1f} ms", flush=True)

    # ---- Pallas ds dense alternative at the same (S, T) -----------------
    tx = jnp.asarray(px)
    ty = jnp.asarray(py)
    sxd = jnp.asarray(src.x)
    syd = jnp.asarray(src.y)
    try:
        if os.environ.get("VG_SKIP_DENSE"):
            raise RuntimeError("skipped (VG_SKIP_DENSE)")
        from ipde_tpu.ops import pallas_ds as pds
        dense = jax.jit(lambda a, b: pds.stokes_slp_apply(
            sxd, syd, a, b, tx, ty))
        ms, out = timeit(dense, wfx, wfy, latency=lat)
        print(f"pallas ds dense      {ms:8.1f} ms  "
              f"({S*T/(ms*1e-3)/1e9:.1f}G pairs/s)", flush=True)
        # accuracy vs the VG path on a small target subset
        uvg, vvg, pvg = full(wfx, wfy)
        uvgf = np.asarray(uvg)[np.asarray(ebdyc.phys)]
        du = float(np.abs(np.asarray(out[0]) - uvgf).max())
        rel = du / float(np.abs(uvgf).max())
        print(f"  |pallas - VG| u    {du:.2e} (rel {rel:.2e})", flush=True)
    except Exception as e:
        print(f"pallas ds dense      failed: {type(e).__name__}: {e}",
              flush=True)

    # ---- accuracy on SMOOTH densities (what the solve actually feeds):
    # compare VG against the chunked XLA-f64 dense ground truth on a
    # 4k-target subset; tells whether the VG pipeline is the e2e grid
    # error floor (bench tier-1 currently 1.71e-10, grid-dominated)
    theta = np.linspace(0, 2 * np.pi, S, endpoint=False)
    wfs_x = jnp.asarray(np.sin(2 * theta) + 0.3 * np.cos(5 * theta))
    wfs_y = jnp.asarray(np.cos(3 * theta) - 0.2 * np.sin(7 * theta))
    u_vg, v_vg, p_vg = full(wfs_x, wfs_y)
    sub = np.linspace(0, T - 1, 4096).astype(int)
    phys_idx = np.flatnonzero(np.asarray(ebdyc.phys).ravel())
    from ipde_tpu.ops import stokes_kernels as sk
    os.environ["IPDE_PALLAS"] = "0"      # force the XLA-f64 ground truth
    txs = jnp.asarray(px[sub])
    tys = jnp.asarray(py[sub])
    ue, ve, pe = jax.jit(lambda a, b: sk.stokes_slp_apply(
        sxd, syd, a, b, txs, tys))(wfs_x, wfs_y)
    del os.environ["IPDE_PALLAS"]
    u_vg_s = np.asarray(u_vg).ravel()[phys_idx[sub]]
    v_vg_s = np.asarray(v_vg).ravel()[phys_idx[sub]]
    p_vg_s = np.asarray(p_vg).ravel()[phys_idx[sub]]
    # split by distance to the nearest source: inside the patch radius the
    # near-correction tables dominate; outside it is pure spectral path
    from scipy.spatial import cKDTree
    tree = cKDTree(np.stack([np.asarray(sxd), np.asarray(syd)], 1))
    dist, _ = tree.query(np.stack([px[sub], py[sub]], 1))
    r_cut = 22.0 * max(ebdyc.grid.xh, ebdyc.grid.yh)
    near = dist < r_cut
    print(f"  near/far split at r_cut={r_cut:.4f}: "
          f"{int(near.sum())}/{int((~near).sum())} targets", flush=True)
    for name, a, b in (("u", u_vg_s, np.asarray(ue)),
                       ("v", v_vg_s, np.asarray(ve)),
                       ("p", p_vg_s, np.asarray(pe))):
        e = np.abs(a - b)
        print(f"    {name}: near {e[near].max() if near.any() else 0:.2e}"
              f"  far {e[~near].max() if (~near).any() else 0:.2e}",
              flush=True)
    for name, a, b in (("u", u_vg_s, np.asarray(ue)),
                       ("v", v_vg_s, np.asarray(ve)),
                       ("p", p_vg_s, np.asarray(pe))):
        d = float(np.abs(a - b).max())
        print(f"  smooth |VG-exact| {name}  {d:.2e} "
              f"(rel {d/max(float(np.abs(b).max()), 1e-300):.2e})",
              flush=True)


if __name__ == "__main__":
    main()
