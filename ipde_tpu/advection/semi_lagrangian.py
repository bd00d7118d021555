"""Semi-Lagrangian advection with moving boundaries.

First-order (forward Euler) advector; reference:
ipde/advection/fe_advector.py:9-197.  Each step:
  1. move each boundary with its own interpolated velocity, arc-length
     reparametrize, regenerate the embedded geometry + grid registration,
  2. find departure points for every new grid/radial point:
       zones 1-2 (old-physical): linearized backtrace,
       (I + dt grad(u)) d = dt u(x)  ->  x_d = x - d,
     zone 3 (newly uncovered points, outside the OLD domain): vectorized
     Newton on boundary-fitted coordinates (s, r) of the departure point
     using the boundary-velocity Taylor model
       c_old(s) + r n_old(s) + dt [u_b(s) + r du/dn(s)] = x_new,
  3. advect: f_new(x) = f_old(x_d) by zonewise spectral interpolation.

The stationary-boundary and prescribed-boundary variants of the reference
(fe_advector_stationary_bdy.py, fe_advector_given_bdy.py) are the
``fixed_boundary`` and ``boundary_motion`` options here.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np

from ipde_tpu.functions import EmbeddedFunction
from ipde_tpu.geometry.collection import EmbeddedBoundaryCollection
from ipde_tpu.geometry.curve import BoundaryCurve, arc_length_parameterize
from ipde_tpu.geometry.partition import PointPartition


def _trig_interp(vals: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Spectral evaluation of periodic nodal data at parameters t."""
    n = vals.size
    vh = np.fft.fft(vals)
    k = np.fft.fftfreq(n, 1.0 / n)
    ph = np.exp(1j * np.outer(t, k))
    return (ph @ vh).real / n


def _trig_deriv(vals: np.ndarray) -> np.ndarray:
    n = vals.size
    k = np.fft.fftfreq(n, 1.0 / n)
    return np.fft.ifft(np.fft.fft(vals) * 1j * k).real


class SemiLagrangianAdvector:
    """First-order (FE) semi-Lagrangian advector."""

    def __init__(self, ebdyc: EmbeddedBoundaryCollection, u: EmbeddedFunction,
                 v: EmbeddedFunction, filter_fraction: float = 0.9):
        self.ebdyc = ebdyc
        self.u = u
        self.v = v
        self.ux, self.uy = ebdyc.gradient(u)
        self.vx, self.vy = ebdyc.gradient(v)
        self.filter_fraction = filter_fraction
        self.new_ebdyc = None

    def generate(self, dt: float, fixed_grid: bool = False,
                 fixed_boundary: bool = False,
                 boundary_motion: Optional[Callable] = None):
        """Move boundaries, rebuild geometry, compute departure points."""
        ebdyc = self.ebdyc
        # boundary velocities
        ubs = [np.asarray(e.interpolate_radial_to_boundary(np.asarray(fr)))
               for e, fr in zip(ebdyc, self.u.radials)]
        vbs = [np.asarray(e.interpolate_radial_to_boundary(np.asarray(fr)))
               for e, fr in zip(ebdyc, self.v.radials)]
        new_ebdys = []
        for e, ub, vb in zip(ebdyc, ubs, vbs):
            if fixed_boundary:
                new_ebdys.append(e)
                continue
            if boundary_motion is not None:
                bx, by = boundary_motion(e.bdy.x, e.bdy.y, dt)
            else:
                bx = e.bdy.x + dt * ub
                by = e.bdy.y + dt * vb
            crv = arc_length_parameterize(bx, by)
            new_ebdys.append(e.regenerate(crv.x, crv.y))
        new_ebdyc = EmbeddedBoundaryCollection(new_ebdys)
        umax = float(np.sqrt(np.asarray(abs(self.u * self.u
                                            + self.v * self.v).max())))
        ddd = 2.0 * umax * dt
        if ddd > new_ebdyc.ebdys[0].radial_width:
            raise ValueError("timestep oversteps the annulus safety zone; "
                             "reduce dt")
        if fixed_grid or fixed_boundary:
            new_ebdyc.register_grid(ebdyc.grid, danger_zone_distance=ddd)
        else:
            new_ebdyc.generate_grid(h=ebdyc.ebdys[0].h,
                                    danger_zone_distance=ddd)

        # points needing values: new pna grid points + new radial points
        px = np.concatenate([new_ebdyc.pna_x]
                            + [e.radial_x.ravel() for e in new_ebdyc])
        py = np.concatenate([new_ebdyc.pna_y]
                            + [e.radial_y.ravel() for e in new_ebdyc])
        part = PointPartition(ebdyc, px, py)
        # zones 1-2: linearized departure solve
        uh = np.asarray(part.interpolate(self.u))
        vh = np.asarray(part.interpolate(self.v))
        uxh = np.asarray(part.interpolate(self.ux))
        uyh = np.asarray(part.interpolate(self.uy))
        vxh = np.asarray(part.interpolate(self.vx))
        vyh = np.asarray(part.interpolate(self.vy))
        sel = part.zone1_or_2
        det = (1 + dt * uxh[sel]) * (1 + dt * vyh[sel]) \
            - dt * uyh[sel] * dt * vxh[sel]
        dx = ((1 + dt * vyh[sel]) * dt * uh[sel]
              - dt * uyh[sel] * dt * vh[sel]) / det
        dy = ((1 + dt * uxh[sel]) * dt * vh[sel]
              - dt * vxh[sel] * dt * uh[sel]) / det
        xd = px.copy()
        yd = py.copy()
        xd[sel] = px[sel] - dx
        yd[sel] = py[sel] - dy
        # zone 3: newly uncovered points -- Newton on boundary coordinates
        for ind, (e, ub, vb) in enumerate(zip(ebdyc, ubs, vbs)):
            z3, s0, r0 = part.zone3[ind]
            if z3.size == 0:
                continue
            urb = np.asarray(
                e.interpolate_radial_to_boundary_normal_derivative(
                    np.asarray(self.u.radials[ind])))
            vrb = np.asarray(
                e.interpolate_radial_to_boundary_normal_derivative(
                    np.asarray(self.v.radials[ind])))
            b = e.bdy
            fields = dict(bx=b.x, by=b.y, nx=b.normal_x, ny=b.normal_y,
                          ub=ub, vb=vb, urb=urb, vrb=vrb)
            ders = {k: _trig_deriv(v_) for k, v_ in fields.items()}
            xo, yo = px[z3], py[z3]
            s, r = s0.copy(), r0.copy()
            for _ in range(50):
                F = {k: _trig_interp(v_, s) for k, v_ in fields.items()}
                D = {k: _trig_interp(v_, s) for k, v_ in ders.items()}
                f1 = (F["bx"] + r * F["nx"] + dt * (F["ub"] + r * F["urb"])
                      - xo)
                f2 = (F["by"] + r * F["ny"] + dt * (F["vb"] + r * F["vrb"])
                      - yo)
                res = np.hypot(f1, f2).max() if f1.size else 0.0
                if res < 1e-12:
                    break
                j11 = (D["bx"] + r * D["nx"] + dt * (D["ub"] + r * D["urb"]))
                j21 = (D["by"] + r * D["ny"] + dt * (D["vb"] + r * D["vrb"]))
                j12 = F["nx"] + dt * F["urb"]
                j22 = F["ny"] + dt * F["vrb"]
                det3 = j11 * j22 - j12 * j21
                s = s - (j22 * f1 - j12 * f2) / det3
                r = r - (j11 * f2 - j21 * f1) / det3
            F = {k: _trig_interp(v_, s) for k, v_ in fields.items()}
            xd[z3] = F["bx"] + F["nx"] * r
            yd[z3] = F["by"] + F["ny"] * r
        self.new_ebdyc = new_ebdyc
        self.xd = xd
        self.yd = yd
        self.dep_partition = PointPartition(ebdyc, xd, yd, fix_r=True)
        return new_ebdyc

    def __call__(self, f: EmbeddedFunction) -> EmbeddedFunction:
        """Advect f from the old geometry onto the new one."""
        import jax.numpy as jnp
        new_ebdyc = self.new_ebdyc
        vals = self.dep_partition.interpolate(f, exterior_value=0.0)
        n_pna = new_ebdyc.pna_x.size
        grid = jnp.zeros(new_ebdyc.grid.shape)
        grid = grid.ravel().at[jnp.asarray(new_ebdyc.pna_flat, jnp.int32)]\
            .set(vals[:n_pna]).reshape(new_ebdyc.grid.shape)
        radials = []
        start = n_pna
        for e in new_ebdyc:
            cnt = int(np.prod(e.radial_shape))
            radials.append(vals[start:start + cnt].reshape(e.radial_shape))
            start += cnt
        grid = new_ebdyc.interpolate_radial_to_grid(radials, grid)
        grid = grid * new_ebdyc.phys_dev
        return EmbeddedFunction(grid, radials)


# reference-compatible alias
FE_Advector = SemiLagrangianAdvector
