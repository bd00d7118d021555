"""Partition of arbitrary point sets against an embedded boundary collection.

Zones (reference: EmbeddedPointPartition, ipde/ebdy_collection.py:37-218):
  zone 1: physical, in no annulus       -> spectral grid interpolation
  zone 2: physical, inside an annulus   -> radial Chebyshev-Fourier interp
  zone 3: not physical                  -> NaN (or boundary-coordinate
          extrapolation data for the semi-Lagrangian machinery)

Host-side classification (Newton coordinates); the interpolation apply is
device-side (window-NUFFT gathers).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ipde_tpu.functions import EmbeddedFunction
from ipde_tpu.geometry.collection import EmbeddedBoundaryCollection
from ipde_tpu.geometry.coords import (compute_local_coordinates,
                                      points_inside_curve, points_near_curve)
from ipde_tpu.ops.interp import PeriodicInterpolator2D, make_interpolator

_HIGH = jax.lax.Precision.HIGHEST


class PointPartition:
    """Classify + build interpolation plans for a point set.

    extra_capture widens the near-curve capture band beyond the annulus
    (radial_width * 1.05 + extra_capture): build the partition of QUERY
    points with extra_capture >= the maximum later point displacement, and
    pass it as ``seed`` when partitioning the DISPLACED points (departure
    points).  A seeded partition skips the KDTree sweep AND the even-odd
    physicality test: candidates come from the seed's near set, Newton
    starts from the seed's coordinates, and far points inherit the seed's
    per-boundary physicality (valid because any point whose side changed
    must lie within the seed's capture band).  Reference analogue: the
    danger-zone guess reuse of ipde/ebdy_collection.py:651-707.
    """

    def __init__(self, ebdyc: EmbeddedBoundaryCollection, x, y,
                 fix_r: bool = False, fix_r_band: float = 1e-8,
                 extra_capture: float = 0.0,
                 seed: "PointPartition" = None,
                 pad_quantum: int = None):
        self.ebdyc = ebdyc
        x = np.asarray(x, np.float64).ravel()
        y = np.asarray(y, np.float64).ravel()
        self.x, self.y = x, y
        n = x.size
        phys = np.ones(n, dtype=bool)
        in_annulus = np.zeros(n, dtype=bool)
        self.extra_capture = extra_capture
        self.zone2 = []      # per ebdy: (indices, theta(r), t)
        self.zone3 = []      # per ebdy: (indices, t, r) of its aphysical pts
        self.full_t = []     # per ebdy: (t, r) for every point (exact for
        self.full_r = []     # near points, nearest-node guess otherwise)
        self.near_masks = []  # per ebdy: Newton candidate set
        self.per_phys = []    # per ebdy: physicality factor of every point
        if seed is not None and seed.x.size != n:
            raise ValueError("seed partition must cover the same point set")
        for i_e, e in enumerate(ebdyc):
            if seed is not None:
                near = seed.near_masks[i_e]
                guess_t = seed.full_t[i_e]
            else:
                near, guess_t = points_near_curve(
                    e.bdy, x, y, e.radial_width * 1.05 + extra_capture)
            idx = np.flatnonzero(near)
            res = compute_local_coordinates(e.bdy, x[idx], y[idx],
                                            guess_t[idx],
                                            e.coordinate_tolerance)
            r = res.r.copy()
            t = res.t
            if fix_r:
                band = max(fix_r_band, 1e-10)
                if e.interior:
                    r[(r > 0) & (r < e.radial_width)] = 0.0
                else:
                    r[(r < 0) & (r > -e.radial_width)] = 0.0
            if e.interior:
                in_ann = (r <= 0) & (r >= -e.radial_width)
                inside_phys_near = r <= 0
            else:
                in_ann = (r >= 0) & (r <= e.radial_width)
                inside_phys_near = r >= 0
            # physical classification: near points by r sign; far points by
            # parity (even-odd test) or inherited from the seed partition
            if seed is not None:
                this_phys = seed.per_phys[i_e].copy()
            else:
                inside = points_inside_curve(e.bdy, x, y)
                this_phys = (inside if e.interior else ~inside)
            this_phys[idx] = inside_phys_near
            phys &= this_phys
            self.near_masks.append(near)
            self.per_phys.append(this_phys)
            z2 = idx[in_ann]
            in_annulus[z2] = True
            theta = e.nufft_theta(r[in_ann])
            self.zone2.append((z2, theta, t[in_ann]))
            z3_local = idx[~inside_phys_near]
            self.zone3.append((z3_local, t[~inside_phys_near],
                               r[~inside_phys_near]))
            ft = guess_t.copy()
            fr = np.zeros(n)
            ft[idx] = t
            fr[idx] = r
            self.full_t.append(ft)
            self.full_r.append(fr)
        self.phys = phys
        self.zone1 = np.flatnonzero(phys & ~in_annulus)
        self.zone1_or_2 = phys
        self.n_ext = int((~phys).sum())
        # interpolation plans.  pad_quantum: zone index sets and plan
        # target lists are capacity-padded to the next multiple so that
        # successive partitions of a MOVING point set keep identical array
        # shapes (compiled interpolation programs are reused across
        # timesteps via utils.planify.replan instead of recompiled).
        # Padded slots: plan targets repeat the first real target (or a
        # harmless constant when the zone is empty); scatter indices get
        # the out-of-range sentinel n (dropped -- jax default FILL_OR_DROP).
        self.pad_quantum = pad_quantum

        def _padded(idx, coords):
            if not pad_quantum:
                return idx, coords
            cap = int(-(-max(idx.size, 1) // pad_quantum) * pad_quantum)
            pad = cap - idx.size
            idx = np.concatenate([idx, np.full(pad, n, idx.dtype)])
            coords = [np.concatenate([c, np.full(pad, c[0] if c.size
                                                 else 0.0)])
                      for c in coords]
            return idx, coords

        g = ebdyc.grid
        z1_idx, (tx1, ty1) = _padded(
            self.zone1, list(ebdyc.transf(x[self.zone1], y[self.zone1])))
        self.grid_plan = PeriodicInterpolator2D(g.Nx, g.Ny, tx1, ty1)
        self.radial_plans = []
        self.zone2_dev = []
        for e, (z2, theta, t) in zip(ebdyc, self.zone2):
            z2_idx, (theta_p, t_p) = _padded(z2, [theta, t])
            self.radial_plans.append(
                make_interpolator(2 * e.M, e.bdy.N, theta_p, t_p,
                                  x_offset=np.pi / (2 * e.M)))
            self.zone2_dev.append(jnp.asarray(z2_idx, jnp.int32))
        self.zone1_dev = jnp.asarray(z1_idx, jnp.int32)

    def interpolate(self, ef: EmbeddedFunction, exterior_value=jnp.nan):
        """Interpolate an EmbeddedFunction to the partitioned points."""
        ebdyc = self.ebdyc
        out = jnp.full(self.x.size, exterior_value)
        smoothed = ef.grid * ebdyc.grid_step_dev
        out = out.at[self.zone1_dev].set(self.grid_plan(smoothed))
        for plan, idx, fr in zip(self.radial_plans, self.zone2_dev,
                                 ef.radials):
            refl = jnp.concatenate([fr, fr[::-1]], axis=0)
            out = out.at[idx].set(plan(refl))
        return out

    def interpolate_many(self, efs, exterior_value=jnp.nan):
        """Interpolate B EmbeddedFunctions to the partitioned points in ONE
        batched pass per plan: (B, n) output.  The semi-Lagrangian departure
        solve needs six fields (u, v and their four gradients) at the same
        points -- six separate interpolate() calls cost six device
        dispatches and six fine-grid transforms; batched they ride one
        (reference analogue: the stacked NUFFT of multi_boundary/scalar.py:80-88)."""
        ebdyc = self.ebdyc
        B = len(efs)
        out = jnp.full((B, self.x.size), exterior_value)
        smoothed = jnp.stack([ef.grid * ebdyc.grid_step_dev for ef in efs])
        out = out.at[:, self.zone1_dev].set(self.grid_plan(smoothed))
        for i_e, (plan, idx) in enumerate(zip(self.radial_plans,
                                              self.zone2_dev)):
            refl = jnp.stack(
                [jnp.concatenate([ef.radials[i_e], ef.radials[i_e][::-1]],
                                 axis=0) for ef in efs])
            out = out.at[:, idx].set(plan(refl))
        return out


def interpolate_to_points(ebdyc, ef: EmbeddedFunction, x, y,
                          fix_r: bool = False):
    """One-shot helper (reference: ebdyc.interpolate_to_points,
    ipde/ebdy_collection.py:666-707)."""
    p = PointPartition(ebdyc, x, y, fix_r=fix_r)
    return p.interpolate(ef)
