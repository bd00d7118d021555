"""Boundary integral equation solvers for the physical boundary conditions.

After the inhomogeneous solve, the PDE residual is a homogeneous solution
determined by a dense BIE on the true boundaries (reference: done in the
example drivers, e.g. examples/interior_poisson.py:84-92).  Here this step is
a first-class component: the BIE matrix is assembled and inverted on host at
setup; the runtime path is matmuls + one on-the-fly layer evaluation.

Dirichlet representation: u_H = sum_j DLP_j[tau_j], collocated on every
boundary with the one-sided limit taken from the physical side.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ipde_tpu.functions import BoundaryFunction, EmbeddedFunction
from ipde_tpu.ops import singular as sq
from ipde_tpu.solvers.scalar import (ModifiedHelmholtzSolver, PoissonSolver,
                                     ScalarSolver)

_HIGH = jax.lax.Precision.HIGHEST


class DirichletBIE:
    """Dense Dirichlet BIE for a ScalarSolver's boundary collection."""

    def __init__(self, solver: ScalarSolver):
        self.solver = solver
        ebdyc = solver.ebdyc
        self.ebdyc = ebdyc
        Ns = [e.bdy.N for e in ebdyc]
        total = sum(Ns)
        offs = np.concatenate([[0], np.cumsum(Ns)])
        A = np.zeros((total, total))
        for i, ei in enumerate(ebdyc):
            for j, ej in enumerate(ebdyc):
                blk = self._dlp_block(ei, ej)
                A[offs[i]:offs[i + 1], offs[j]:offs[j + 1]] = blk
        # rank completion for exterior (inclusion) boundaries whose DLP
        # cannot represent the constant/log mode: add ones(tau) coupling
        for j, ej in enumerate(ebdyc):
            if not ej.interior:
                A[:, offs[j]:offs[j + 1]] += ej.bdy.weights[None, :]
        self.Ainv = jnp.asarray(np.linalg.inv(A))
        self.offs = offs
        # per-boundary QFS of the DLP, matched from the physical side,
        # effective sources on the far side of the physical region
        self.qfs_list = []
        self.src_list = []
        for e in ebdyc:
            src = e.qfs_source_for_side("bdy", interior_eval=e.interior)
            self.src_list.append(src)
            self.qfs_list.append(
                solver._make_qfs(e.bdy, src, e.interior))
        # physical grid points (all of them: pna + in-annulus)
        self.phys_flat = jnp.asarray(np.flatnonzero(ebdyc.phys), jnp.int32)
        self.phys_x = jnp.asarray(ebdyc.grid.xg[ebdyc.phys])
        self.phys_y = jnp.asarray(ebdyc.grid.yg[ebdyc.phys])

    def _dlp_block(self, ei, ej) -> np.ndarray:
        solver = self.solver
        if ei is ej:
            if isinstance(solver, ModifiedHelmholtzSolver):
                D = sq.mh_dlp_self(ej.bdy, solver.k)
            else:
                D = sq.laplace_dlp_self(ej.bdy)
            jump = -0.5 if ej.interior else 0.5
            return D + jump * np.eye(ej.bdy.N)
        if isinstance(solver, ModifiedHelmholtzSolver):
            return sq.mh_dlp_naive(ej.bdy, ei.bdy.x, ei.bdy.y, solver.k)
        return sq.laplace_dlp_naive(ej.bdy, ei.bdy.x, ei.bdy.y)

    def apply_bc(self, ue: EmbeddedFunction,
                 bc: BoundaryFunction) -> EmbeddedFunction:
        """Correct ue so that it satisfies u = bc on every boundary."""
        solver = self.solver
        bvs = solver.get_boundary_values(ue)
        rhs = jnp.concatenate([(b - v) for b, v in
                               zip(bc.values, bvs.values)])
        tau = jnp.matmul(self.Ainv, rhs, precision=_HIGH)
        taus = [tau[self.offs[i]:self.offs[i + 1]]
                for i in range(len(self.ebdyc.ebdys))]
        # effective sources; QFS forms are [slp, dlp] -> pass zero slp
        sigmas = [q([jnp.zeros_like(t), t])
                  for q, t in zip(self.qfs_list, taus)]
        # evaluate onto all physical grid points and every radial grid
        grid_vals = jnp.zeros(self.phys_x.shape[0])
        radial_vals = [jnp.zeros(e.radial_shape) for e in self.ebdyc]
        for src, sig in zip(self.src_list, sigmas):
            grid_vals = grid_vals + solver._apply(src, sig, self.phys_x,
                                                  self.phys_y)
            for i, e in enumerate(self.ebdyc):
                v = solver._apply(src, sig,
                                  jnp.asarray(e.radial_x.ravel()),
                                  jnp.asarray(e.radial_y.ravel()))
                radial_vals[i] = radial_vals[i] + v.reshape(e.radial_shape)
        new_grid = ue.grid.ravel().at[self.phys_flat].add(grid_vals)
        new_radials = [r + dv for r, dv in zip(ue.radials, radial_vals)]
        return EmbeddedFunction(new_grid.reshape(ue.grid.shape), new_radials)


def solve_dirichlet(solver: ScalarSolver, f: EmbeddedFunction,
                    bc: BoundaryFunction, bie: DirichletBIE = None,
                    **kw) -> EmbeddedFunction:
    """Convenience: full inhomogeneous solve + Dirichlet BC in one call."""
    if bie is None:
        bie = DirichletBIE(solver)
    ue = solver(f, **kw)
    return bie.apply_bc(ue, bc)
