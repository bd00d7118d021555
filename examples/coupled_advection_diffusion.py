"""Coupled advection-diffusion with a moving boundary (reference:
examples/semi_lagrangian_experiments/coupled_simplify*.py):
  c_t + u . grad(c) = nu lap(c),  boundary moves with u.
Scheme: FE semi-Lagrangian advection + backward-Euler diffusion:
  (I - dt nu lap) c^{n+1} = c^n(x_d)   i.e. an MH solve with k^2 = 1/(dt nu)
Test: rigid rotation (boundary rotates, shape preserved) with a diffusing
Gaussian blob; compare against the exact rotating-diffusing solution.
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from ipde_tpu.geometry.curve import star
from ipde_tpu.geometry.embedded_boundary import EmbeddedBoundary
from ipde_tpu.geometry.collection import EmbeddedBoundaryCollection
from ipde_tpu.functions import EmbeddedFunction, BoundaryFunction
from ipde_tpu.advection.semi_lagrangian import SemiLagrangianAdvector
from ipde_tpu.solvers.scalar import ModifiedHelmholtzSolver
from ipde_tpu.solvers.bie import NeumannBIE

nu = 0.05
u_f = lambda x, y: -y
v_f = lambda x, y: x
# exact: rotating frame leaves a centered isotropic Gaussian invariant under
# rotation; diffusion: c = 1/(4 pi nu (t+t0)) exp(-r^2/(4 nu (t+t0)))
t0_ = 0.5
def c_exact(x, y, T):
    s = 4*nu*(T + t0_)
    return np.exp(-(x*x + y*y)/s)/(np.pi*s)

nb, M = 200, 10
bdy = star(nb, a=0.1, f=3)
bh = min(bdy.min_h(), 0.6/np.abs(bdy.curvature).max()/M)
ebdy = EmbeddedBoundary(bdy, True, M, bh, qfs_tolerance=1e-12)
ebdyc = EmbeddedBoundaryCollection([ebdy])
ebdyc.generate_grid(bh)
c = EmbeddedFunction.from_function(ebdyc, lambda x, y: c_exact(x, y, 0.0))
dt = 0.05
steps = 4
T = 0.0
t_start = time.time()
helpers = None          # reused across steps (annular solvers/preconditioners
                        # survive geometry regeneration with fixed (n, M))
k2 = 1.0/(dt*nu)
step_rows = []
for n in range(steps):
    t_step = time.time()
    u = EmbeddedFunction.from_function(ebdyc, u_f)
    v = EmbeddedFunction.from_function(ebdyc, v_f)
    adv = SemiLagrangianAdvector(ebdyc, u, v)
    new_ebdyc = adv.generate(dt)
    c_star = adv(c)                      # advected field on the new geometry
    t_adv = time.time() - t_step
    # backward-Euler diffusion: (1/(dt nu) - lap) c = c*/(dt nu)
    t1 = time.time()
    solver = ModifiedHelmholtzSolver(new_ebdyc, k=np.sqrt(k2),
                                     helpers=helpers)
    helpers = solver.helpers
    t_setup = time.time() - t1
    f = c_star * k2
    # no-flux (Neumann) boundary condition
    bcn = BoundaryFunction([np.zeros(e.bdy.N) for e in new_ebdyc])
    t1 = time.time()
    c = NeumannBIE(solver).apply_bc(solver(f, tol=1e-12), bcn)
    t_solve = time.time() - t1
    ebdyc = new_ebdyc
    T += dt
    step_rows.append({"advect_s": round(t_adv, 2),
                      "setup_s": round(t_setup, 2),
                      "solve_s": round(t_solve, 2)})
    print(f"step {n+1}/{steps}: advect {t_adv:.1f}s  solver-setup "
          f"{t_setup:.1f}s  solve {t_solve:.1f}s  "
          f"(total {time.time()-t_start:.0f}s)", flush=True)
ca = EmbeddedFunction.from_function(ebdyc, lambda x, y: c_exact(x, y, T))
err = abs(c - ca)
phys = np.asarray(ebdyc.phys)
ge = float(np.asarray(err.grid)[phys].max())
re = max(float(np.abs(np.asarray(r)).max()) for r in err.radials)
scale = float(np.asarray(ca.grid)[phys].max())
print(f"coupled adv-diff: rel err {max(ge, re)/scale:.2e} after T={T}", flush=True)
# mass conservation (no-flux): integral preserved up to boundary leakage
m0 = 1.0  # initial mass of the normalized Gaussian (minus tail outside)
print("final mass:", ebdyc.volume_integral(c), flush=True)

# record the per-step cost table (VERDICT r2 item 3: helper reuse means a
# timestep costs solve + incremental geometry, NOT a full setup -- the
# first step's setup_s is the one-time build, later steps reuse helpers)
from ipde_tpu.utils.ledger import record
record("coupled_advection_diffusion",
       [{"nb": nb, "M": M, "dt": dt, "steps": steps,
         "rel_err": float(f"{max(ge, re)/scale:.3e}"),
         "step_rows": step_rows}],
       ("nb", "M", "dt", "steps"))
