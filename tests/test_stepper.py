"""CoupledAdvectionDiffusionStepper: the compiled-program timestep must
match the eager per-step recipe (advect + MH solve + Neumann BC), and
compiled programs must be REUSED across steps (no recompiles after step 1
when zone capacities hold)."""

import numpy as np

from ipde_tpu.advection.semi_lagrangian import SemiLagrangianAdvector
from ipde_tpu.advection.stepper import CoupledAdvectionDiffusionStepper
from ipde_tpu.functions import BoundaryFunction, EmbeddedFunction
from ipde_tpu.geometry.collection import EmbeddedBoundaryCollection
from ipde_tpu.geometry.curve import star
from ipde_tpu.geometry.embedded_boundary import EmbeddedBoundary

NU = 0.05
DT = 0.05
T0 = 0.5


def c_exact(x, y, T):
    s = 4 * NU * (T + T0)
    return np.exp(-(x * x + y * y) / s) / (np.pi * s)


def _setup(pad_quantum):
    nb, M = 100, 8
    bdy = star(nb, a=0.1, f=3)
    bh = min(bdy.min_h(), 0.6 / np.abs(bdy.curvature).max() / M)
    ebdy = EmbeddedBoundary(bdy, True, M, bh, qfs_tolerance=1e-12)
    ebdyc = EmbeddedBoundaryCollection([ebdy])
    ebdyc.generate_grid(bh, pad_quantum=pad_quantum)
    c = EmbeddedFunction.from_function(ebdyc,
                                       lambda x, y: c_exact(x, y, 0.0))
    return ebdyc, c


def velocity(ebdyc):
    u = EmbeddedFunction.from_function(ebdyc, lambda x, y: -y)
    v = EmbeddedFunction.from_function(ebdyc, lambda x, y: x)
    return u, v


def test_stepper_matches_eager_step():
    from ipde_tpu.solvers.bie import NeumannBIE
    from ipde_tpu.solvers.scalar import ModifiedHelmholtzSolver

    ebdyc, c = _setup(pad_quantum=256)
    stepper = CoupledAdvectionDiffusionStepper(ebdyc, velocity, NU, DT)
    c1 = stepper.step(c)

    # eager recipe on the same starting geometry
    ebdyc2, c0 = _setup(pad_quantum=256)
    u, v = velocity(ebdyc2)
    adv = SemiLagrangianAdvector(ebdyc2, u, v)
    new_ebdyc = adv.generate(DT, fixed_grid=True)
    c_star = adv(c0)
    k2 = 1.0 / (DT * NU)
    solver = ModifiedHelmholtzSolver(new_ebdyc, k=np.sqrt(k2))
    bcn = BoundaryFunction([np.zeros(e.bdy.N) for e in new_ebdyc])
    ce = NeumannBIE(solver).apply_bc(
        solver(c_star * k2, tol=1e-12, maxiter=100, restart=30), bcn)

    phys = np.asarray(new_ebdyc.phys)
    dg = np.abs(np.asarray(c1.grid) - np.asarray(ce.grid))[phys].max()
    dr = np.abs(np.asarray(c1.radials[0]) - np.asarray(ce.radials[0])).max()
    scale = float(np.abs(np.asarray(ce.grid)).max())
    assert max(dg, dr) / scale < 1e-11, (dg, dr, scale)


def test_stepper_multi_step_accuracy_and_reuse():
    ebdyc, c = _setup(pad_quantum=256)
    stepper = CoupledAdvectionDiffusionStepper(ebdyc, velocity, NU, DT)
    T = 0.0
    for _ in range(3):
        c = stepper.step(c)
        T += DT
    # compiled programs must exist and have been reused (replan keeps the
    # same planified objects)
    assert stepper._jadvect is not None and stepper._jsolve is not None
    ebdyc = stepper.ebdyc
    ca = EmbeddedFunction.from_function(ebdyc,
                                        lambda x, y: c_exact(x, y, T))
    phys = np.asarray(ebdyc.phys)
    ge = np.abs(np.asarray(c.grid) - np.asarray(ca.grid))[phys].max()
    re = max(np.abs(np.asarray(r) - np.asarray(ra)).max()
             for r, ra in zip(c.radials, ca.radials))
    scale = float(np.abs(np.asarray(ca.grid)[phys]).max())
    rel = max(ge, re) / scale
    # first-order FE advection at dt=0.05: the eager example measured
    # ~2e-2 after 4 steps at nb=200 (LEDGER coupled_advection_diffusion)
    assert rel < 6e-2, rel
