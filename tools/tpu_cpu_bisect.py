"""Bisect TPU-vs-CPU f64 divergence through the solve stages.

Runs each stage of the flagship Poisson solve on both backends with
identical inputs and prints the max abs difference, to locate which device
op leaks accuracy on TPU (CPU f64 is the trusted reference).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from ipde_tpu.functions import BoundaryFunction, EmbeddedFunction
    from ipde_tpu.geometry.collection import EmbeddedBoundaryCollection
    from ipde_tpu.geometry.curve import star
    from ipde_tpu.geometry.embedded_boundary import EmbeddedBoundary
    from ipde_tpu.solvers.bie import DirichletBIE
    from ipde_tpu.solvers.scalar import PoissonSolver
    from ipde_tpu.ops.cx import Cx

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    print("backends:", cpu, tpu)

    nb, M = 400, 12
    sol = lambda x, y: -np.cos(x) * np.exp(np.sin(x)) * np.sin(y)
    frc = lambda x, y: ((2.0 * np.cos(x) + 3.0 * np.cos(x) * np.sin(x)
                         - np.cos(x) ** 3) * np.exp(np.sin(x)) * np.sin(y))
    bdy = star(nb, a=0.2, f=5)
    bh = min(bdy.min_h(), 0.6 / np.abs(bdy.curvature).max() / M)
    ebdy = EmbeddedBoundary(bdy, True, M, bh, qfs_tolerance=1e-14)
    ebdyc = EmbeddedBoundaryCollection([ebdy])
    grid = ebdyc.generate_grid(bh)
    f = EmbeddedFunction.from_function(ebdyc, frc)
    ua = EmbeddedFunction.from_function(ebdyc, sol)
    bc = BoundaryFunction.from_function(ebdyc, sol)
    solver = PoissonSolver(ebdyc)
    bie = DirichletBIE(solver)
    phys = np.asarray(ebdyc.phys)

    def both(fn, *args):
        """Run fn jitted on each backend with host-numpy args."""
        outs = []
        for dev in (cpu, tpu):
            a = [jax.device_put(np.asarray(v), dev) for v in args]
            with jax.default_device(dev):
                outs.append(jax.tree_util.tree_map(
                    np.asarray, jax.jit(fn)(*a)))
        d = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(a - b).max()), outs[0], outs[1])
        return outs[0], d

    # stage 1: box solve
    def box(fg):
        fc = solver._prepare_grid_rhs(fg * ebdyc.grid_step_dev)
        modes = ebdyc.fft_plan.fft2(fc)
        uch = Cx(modes.re * solver._symbol, modes.im * solver._symbol)
        return ebdyc.fft_plan.ifft2_real(uch)

    uc_cpu, d = both(box, f.grid)
    print(f"box solve diff: {d:.2e}")

    # stage 2: interface interpolation (values + gradients)
    def ifc(fg):
        fc = solver._prepare_grid_rhs(fg * ebdyc.grid_step_dev)
        modes = ebdyc.fft_plan.fft2(fc)
        uch = Cx(modes.re * solver._symbol, modes.im * solver._symbol)
        kx, ky = ebdyc.kx_dev, ebdyc.ky_dev
        stack = Cx(jnp.stack([uch.re, -uch.im * kx, -uch.im * ky]),
                   jnp.stack([uch.im, uch.re * kx, uch.re * ky]))
        return ebdyc.interpolate_grid_to_interface_modes(stack)

    iv_cpu, d = both(ifc, f.grid)
    print(f"interface interp diff: {d:.2e}")

    # stage 3: annular solve
    h = solver.helpers[0]

    def ann(fr):
        zero = jnp.zeros(nb)
        u, _ = h.annular_solver.solve_with_stats(
            h.metric, fr, zero, zero, tol=1e-12, maxiter=100, restart=30)
        return u

    ur_cpu, d = both(ann, f.radials[0])
    print(f"annular GMRES diff: {d:.2e}")

    # stage 4: QFS densities from fixed inputs
    bv, bx, by = iv_cpu[0], iv_cpu[1], iv_cpu[2]

    def dens(ur, bv, bx, by):
        return h.densities(ur, bv, bx, by)

    (sg_cpu, sr_cpu), d = both(dens, ur_cpu, bv, bx, by)
    print(f"QFS densities diff: sigma_g {d[0]:.2e} sigma_r {d[1]:.2e}")

    # stage 5a: VG grid evaluation of sigma_g
    def vg(sg):
        return solver.grid_eval(sg * solver.grid_src_w)

    phi_cpu, d = both(vg, sg_cpu)
    print(f"VG grid apply diff: {d:.2e}")

    # stage 5b: dense interface apply
    def mrg(sg):
        return solver._apply_merged(sg, ebdyc.all_interface_x_dev,
                                    ebdyc.all_interface_y_dev)

    bu_cpu, d = both(mrg, sg_cpu)
    print(f"dense interface apply diff: {d:.2e}")

    # stage 6: correct (u2s + dense radial apply)
    def corr(ur, sg, sr, bu):
        return h.correct(solver, ur, sg, sr, bu)

    urc_cpu, d = both(corr, ur_cpu, sg_cpu, sr_cpu, bu_cpu)
    print(f"correct (radial apply) diff: {d:.2e}")

    # stage 7: radial -> grid merge
    def r2g(urs, uc):
        return ebdyc.interpolate_radial_to_grid([urs], uc)

    _, d = both(r2g, urc_cpu, uc_cpu)
    print(f"radial->grid merge diff: {d:.2e}")

    # stage 8: BIE apply (on the CPU inhomogeneous solution)
    with jax.default_device(cpu):
        ue_cpu, _ = solver.solve_with_stats(
            EmbeddedFunction(jax.device_put(np.asarray(f.grid), cpu),
                             [jax.device_put(np.asarray(f.radials[0]), cpu)]),
            tol=1e-12, maxiter=100, restart=30)
        ue_cpu = jax.tree_util.tree_map(np.asarray, ue_cpu)

    def bie_step(ug, ur):
        ue = bie.apply_bc(EmbeddedFunction(ug, [ur]), bc)
        return ue.grid, ue.radials[0]

    (bg, br), d = both(bie_step, ue_cpu.grid, ue_cpu.radials[0])
    print(f"BIE apply diff: grid {d[0]:.2e} radial {d[1]:.2e}")

    ge = np.abs(bg - np.asarray(ua.grid))[phys].max()
    print(f"final err (CPU path): {ge:.2e}")


if __name__ == "__main__":
    main()
