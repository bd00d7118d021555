"""Stage-by-stage memory probe of StokesFreespaceGridEvaluator at bench
size: after each stage, binary-search the largest allocatable block to
measure actual free HBM (live_arrays misses non-array reservations).
Usage: python tools/ge_mem_probe.py
"""

import gc
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def free_hbm_gib():
    import jax
    import jax.numpy as jnp
    gc.collect()
    lo, hi = 0.0, 14.0
    best = 0.0
    for _ in range(6):
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


def live_gib():
    import jax
    gc.collect()
    return sum(a.nbytes for a in jax.live_arrays()
               if not a.is_deleted()) / 2**30


def stage(tag):
    print(f"[{time.strftime('%H:%M:%S')}] {tag:30s} live {live_gib():6.2f} "
          f"GiB   free {free_hbm_gib():6.2f} GiB", flush=True)


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from ipde_tpu.geometry.collection import EmbeddedBoundaryCollection
    from ipde_tpu.geometry.curve import star
    from ipde_tpu.geometry.embedded_boundary import EmbeddedBoundary

    nb = int(os.environ.get("BENCH_NB", 2700))
    M = int(os.environ.get("BENCH_M", 20))
    stage("start")
    bdy = star(nb, a=0.2, f=5)
    bh = min(bdy.min_h(), 0.6 / np.abs(bdy.curvature).max() / M)
    ebdy = EmbeddedBoundary(bdy, True, M, bh, qfs_tolerance=1e-14)
    ebdyc = EmbeddedBoundaryCollection([ebdy])
    grid = ebdyc.generate_grid(bh)
    stage(f"geometry {grid.shape}")
    src = ebdy.qfs_source_for_side("interface", interior_eval=True)
    sx, sy = np.asarray(src.x), np.asarray(src.y)
    g = ebdyc.grid
    px = g.xg[ebdyc.phys]
    py = g.yg[ebdyc.phys]
    bounds = ((float(px.min()), float(px.max())),
              (float(py.min()), float(py.max())))
    stage("pre-evaluator")

    # inline replica of StokesFreespaceGridEvaluator.__init__ stages
    from ipde_tpu.ops import grid_eval as gev
    from ipde_tpu.ops.grid_eval import (_radial_hankel_tables_dev,
                                        _m_j0_dev, _m_j1_over_z_dev,
                                        _m_k2_j0_dev,
                                        biharmonic_truncated_symbol_dev,
                                        laplace_truncated_symbol_dev)
    from ipde_tpu.ops.kernels import accurate_log

    class Shell(gev._EvaluatorBase):
        def __init__(self):
            pass

    self = Shell()
    self.MARGIN_H = 80.0
    self.S = sx.size
    self._setup_box(g, sx, sy, None, bounds, ebdyc.phys_extremes())
    stage("setup_box")
    self._setup_spreading(sx, sy, 16)
    stage("setup_spreading")
    L, eta = self.L, self.eta
    screen_v = lambda k: ((1.0 + k**2 / (4 * eta**2))
                          * jnp.exp(-(k**2) / (4 * eta**2)))
    screen = lambda k: jnp.exp(-(k**2) / (4 * eta**2))
    bsym = lambda k: biharmonic_truncated_symbol_dev(k, L) * screen_v(k)
    qsym = lambda k: laplace_truncated_symbol_dev(k, L) * screen(k)
    self.multB = bsym(self.kk_half) * self.deconv_half
    self.multB.block_until_ready()
    stage("multB")
    self.multQ = qsym(self.kk_half) * self.deconv_half
    self.multQ.block_until_ready()
    stage("multQ")
    hx, hy = g.xh, g.yh
    r_cut = 22.0 * max(hx, hy)
    dx, dy, rr, mask = self._patch_geometry(sx, sy, r_cut)
    rr.block_until_ready()
    stage("patch_geometry")
    kmax = 12.0 * eta
    Tb_t, Ta_t = _radial_hankel_tables_dev(
        bsym, kmax, L, self.r_tab_max, [_m_j1_over_z_dev, _m_k2_j0_dev])
    (Qb_t,) = _radial_hankel_tables_dev(qsym, kmax, L, self.r_tab_max,
                                        [_m_j0_dev])
    stage("hankel tables")
    rs = jnp.where(mask, rr, 1.0)
    Tb = Tb_t(rs)
    Tb.block_until_ready()
    stage("Tb eval")
    A1 = -Tb
    A2 = -Ta_t(rs) + Tb
    Qb = Qb_t(rs)
    Qb.block_until_ready()
    stage("Ta/Qb eval")
    r2 = rs**2
    T_xx = -(A2 * dy**2 + A1 * dx**2) / r2
    T_xy = (A2 - A1) * dx * dy / r2
    T_yy = -(A2 * dx**2 + A1 * dy**2) / r2
    T_yy.block_until_ready()
    stage("T tensors")
    logr = accurate_log(r2) * 0.5
    G_xx = (-logr + dx**2 / r2) / (4 * np.pi) - 1.0 / (8 * np.pi)
    G_xy = (dx * dy / r2) / (4 * np.pi)
    G_yy = (-logr + dy**2 / r2) / (4 * np.pi) - 1.0 / (8 * np.pi)
    P_x = dx / (2 * np.pi * r2)
    P_y = dy / (2 * np.pi * r2)
    P_y.block_until_ready()
    stage("G tensors")
    Cxx = jnp.where(mask, G_xx - T_xx, 0.0)
    Cxy = jnp.where(mask, G_xy - T_xy, 0.0)
    Cyy = jnp.where(mask, G_yy - T_yy, 0.0)
    Cpx = jnp.where(mask, P_x - Qb * dx, 0.0)
    Cpy = jnp.where(mask, P_y - Qb * dy, 0.0)
    Cpy.block_until_ready()
    stage("masked C")
    del Tb, A1, A2, Qb, r2, T_xx, T_xy, T_yy, logr
    del G_xx, G_xy, G_yy, P_x, P_y, dx, dy, rr, rs, mask
    stage("after del temps")


if __name__ == "__main__":
    main()
