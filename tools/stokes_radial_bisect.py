"""Bisect the radial-field assembly of the 1M-dof Stokes solve.

The final radial velocity is  annular (rt->uv)  +  correct's dense
sigma_r apply  +  the BIE's dense radial apply.  This runs the planified
solve on the default backend, returns each component, and re-evaluates
the two dense applies in HOST numpy f64 with the same inputs -- whichever
component disagrees with its host recomputation carries the device error.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def host_stokes_apply(sx, sy, wfx, wfy, tx, ty, chunk=4096):
    u = np.empty(tx.size)
    v = np.empty(tx.size)
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
    return u, v


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from ipde_tpu.functions import BoundaryFunction, EmbeddedFunction
    from ipde_tpu.geometry.collection import EmbeddedBoundaryCollection
    from ipde_tpu.geometry.curve import star
    from ipde_tpu.geometry.embedded_boundary import EmbeddedBoundary
    from ipde_tpu.solvers.bie import StokesDirichletBIE
    from ipde_tpu.solvers.vector import StokesSolver
    from ipde_tpu.utils.planify import planified

    nb, M = (int(v) for v in os.environ.get("BIS_CASE", "2700,20").split(","))
    bdy = star(nb, a=0.2, f=5)
    bh = min(bdy.min_h(), 0.6 / np.abs(bdy.curvature).max() / M)
    ebdy = EmbeddedBoundary(bdy, True, M, bh, qfs_tolerance=1e-14)
    ebdyc = EmbeddedBoundaryCollection([ebdy])
    grid = ebdyc.generate_grid(bh)
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
    h = solver.helpers[0]
    print(f"setup done grid={grid.shape}", flush=True)

    def step(fg, fr, gg, gr):
        (u, v, p), _ = solver.solve_with_stats(
            EmbeddedFunction(fg, [fr]), EmbeddedFunction(gg, [gr]),
            tol=1e-12, maxiter=100, restart=30)
        # re-derive the pieces: annular+correct radial is u.radials[0];
        # the BIE adds its own radial update on top
        u2, v2, p2 = bie.apply_bc(u, v, p, bc_u, bc_v)
        return (u.radials[0], v.radials[0], u2.radials[0], v2.radials[0])

    jstep = planified(step, solver, bie)
    out = jstep(fu.grid, fu.radials[0], fv.grid, fv.radials[0])
    ur_pre, vr_pre, ur_post, vr_post = [np.asarray(o) for o in out]
    print("solve done", flush=True)

    # Also get the intermediate densities (sigma_r, BIE sigma) by running
    # the sub-pieces separately on-device
    def dens(fg, fr, gg, gr):
        (u, v, p), _ = solver.solve_with_stats(
            EmbeddedFunction(fg, [fr]), EmbeddedFunction(gg, [gr]),
            tol=1e-12, maxiter=100, restart=30)
        bu = solver.get_boundary_values(u)
        bv = solver.get_boundary_values(v)
        import jax.numpy as jnp
        rhs = jnp.concatenate([
            jnp.concatenate([-(bu.values[0] - bc_u.values[0]),
                             -(bv.values[0] - bc_v.values[0])])])
        tau = jnp.matmul(bie.Ainv, rhs,
                         precision=jax.lax.Precision.HIGHEST)
        sig_bie = bie.qfs_list[0]([tau])
        return rhs, tau, sig_bie

    jdens = planified(dens, solver, bie)
    rhs, tau, sig_bie = [np.asarray(o)
                         for o in jdens(fu.grid, fu.radials[0], fv.grid,
                                        fv.radials[0])]
    print(f"|rhs| {np.abs(rhs).max():.3e} |tau| {np.abs(tau).max():.3e} "
          f"|sig_bie| {np.abs(sig_bie).max():.3e}", flush=True)

    # host recomputation of the BIE radial apply
    src = bie.src_list[0]
    w = np.asarray(src.weights)
    rtx = np.asarray(ebdy.radial_x.ravel())
    rty = np.asarray(ebdy.radial_y.ravel())
    t0 = time.time()
    hu, hv = host_stokes_apply(np.asarray(src.x), np.asarray(src.y),
                               sig_bie[:src.N] * w, sig_bie[src.N:] * w,
                               rtx, rty)
    print(f"host BIE radial apply {time.time()-t0:.0f}s", flush=True)
    sh = ebdy.radial_shape
    dev_du = ur_post - ur_pre
    dev_dv = vr_post - vr_pre
    print(f"BIE radial apply: dev-vs-host u "
          f"{np.abs(dev_du - hu.reshape(sh)).max():.2e}  v "
          f"{np.abs(dev_dv - hv.reshape(sh)).max():.2e}", flush=True)
    # final errors to locate which side carries the 2.8e-8
    eu_pre_plus_host = np.abs(ur_pre + hu.reshape(sh)
                              - np.asarray(ua.radials[0])).max()
    eu_post = np.abs(ur_post - np.asarray(ua.radials[0])).max()
    print(f"final u radial err: device {eu_post:.2e}  "
          f"(pre + host-BIE) {eu_pre_plus_host:.2e}", flush=True)


if __name__ == "__main__":
    main()
