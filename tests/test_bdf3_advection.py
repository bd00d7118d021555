"""BDF3 semi-Lagrangian advector (ThirdOrderAdvector) on an UNSTEADY
rotation: u = -y w(t), v = x w(t), w(t) = 1 + 0.5 sin(2t).  The circle
boundary is a streamline (stationary), and the solution is the initial
field transported by the accumulated angle a(t) = int_0^t w -- an exact
truth for every dt, exercising the quadratic-in-time velocity
interpolation genuinely (reference experiment analogue:
examples/semi_lagrangian_experiments/unsteady_semi_experiment.py).

History (f^{-1}, f^{-2} and the two old velocity levels) is initialized
from the exact solution, the standard convergence-study setup.
"""

import numpy as np
import pytest

from ipde_tpu.advection.semi_lagrangian import ThirdOrderAdvector
from ipde_tpu.functions import EmbeddedFunction
from ipde_tpu.geometry.collection import EmbeddedBoundaryCollection
from ipde_tpu.geometry.curve import circle
from ipde_tpu.geometry.embedded_boundary import EmbeddedBoundary

OMEGA = lambda t: 1.0 + 0.5 * np.sin(2.0 * t)
ALPHA = lambda t: t + 0.25 * (1.0 - np.cos(2.0 * t))   # int_0^t omega
F0 = lambda x, y: np.exp(np.sin(x)) * np.cos(y + 0.3)


def _exact(x, y, t):
    a = ALPHA(t)
    c, s = np.cos(a), np.sin(a)
    return F0(c * x + s * y, -s * x + c * y)


class _Hist:
    """Velocity-history shim standing in for the previous advector."""

    def __init__(self, u, v, uo, vo):
        self.u, self.v, self.uo, self.vo = u, v, uo, vo


def _setup(nb=150, M=12):
    bdy = circle(nb, r=1.0)
    bh = min(bdy.min_h(), 0.6 / np.abs(bdy.curvature).max() / M)
    ebdy = EmbeddedBoundary(bdy, True, M, bh, qfs_tolerance=1e-12)
    ebdyc = EmbeddedBoundaryCollection([ebdy])
    ebdyc.generate_grid(bh)
    return ebdyc


def _vel(ebdyc, t):
    w = OMEGA(t)
    u = EmbeddedFunction.from_function(ebdyc, lambda x, y: -w * y)
    v = EmbeddedFunction.from_function(ebdyc, lambda x, y: w * x)
    return u, v


def _run(ebdyc, dt, steps):
    f = EmbeddedFunction.from_function(ebdyc, lambda x, y: _exact(x, y, 0.0))
    fm1 = EmbeddedFunction.from_function(ebdyc,
                                         lambda x, y: _exact(x, y, -dt))
    fm2 = EmbeddedFunction.from_function(ebdyc,
                                         lambda x, y: _exact(x, y, -2 * dt))
    t = 0.0
    for _ in range(steps):
        u, v = _vel(ebdyc, t)
        uo, vo = _vel(ebdyc, t - dt)
        uoo, voo = _vel(ebdyc, t - 2 * dt)
        adv = ThirdOrderAdvector(ebdyc, u, v, _Hist(uo, vo, uoo, voo))
        adv.generate(dt)
        fn = adv(f, fm1, fm2)
        fm2, fm1, f = fm1, f, fn
        t += dt
    fa = EmbeddedFunction.from_function(ebdyc, lambda x, y: _exact(x, y, t))
    err = abs(f - fa)
    ge = float(np.asarray(err.grid)[np.asarray(ebdyc.phys)].max())
    re = max(float(np.abs(np.asarray(r)).max()) for r in err.radials)
    return max(ge, re)


def test_bdf3_unsteady_order():
    ebdyc = _setup()
    T = 0.4
    errs = []
    dts = [0.1, 0.05, 0.025]
    for dt in dts:
        errs.append(_run(ebdyc, dt, int(round(T / dt))))
    o1 = np.log2(errs[0] / errs[1])
    o2 = np.log2(errs[1] / errs[2])
    # the coarse pair under-reads (velocity-extrapolation error partially
    # cancels across steps); the fine pair must show clear third order
    assert o2 > 2.5, (errs, o1, o2)
    assert errs[-1] < 5e-5, errs
