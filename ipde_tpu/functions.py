"""EmbeddedFunction / BoundaryFunction: the framework's data types.

A function on the embedded domain is (full background grid values, one radial
(M, N) array per boundary).  Unlike the reference's flat ndarray subclass
(reference: ipde/embedded_function.py:16-229), this is a JAX pytree with
fixed-shape leaves: the grid leaf is the FULL (Nx, Ny) array (zeros in the
exterior) so every consumer is jit/vmap-compatible with static shapes.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class EmbeddedFunction:
    """grid: (Nx, Ny) values (zero outside the physical domain);
    radials: tuple of per-boundary (M, N_b) radial grid values."""

    def __init__(self, grid, radials: Sequence):
        self.grid = grid
        self.radials = tuple(radials)

    def tree_flatten(self):
        return (self.grid, self.radials), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1])

    # -- constructors ---------------------------------------------------------
    @classmethod
    def from_function(cls, ebdyc, f: Callable) -> "EmbeddedFunction":
        """Evaluate f(x, y) on the physical grid points and radial grids."""
        g = np.zeros(ebdyc.grid.shape)
        g[ebdyc.phys] = f(ebdyc.grid.xg[ebdyc.phys], ebdyc.grid.yg[ebdyc.phys])
        radials = [f(e.radial_x, e.radial_y) for e in ebdyc]
        return cls(jnp.asarray(g), [jnp.asarray(r) for r in radials])

    @classmethod
    def zeros(cls, ebdyc) -> "EmbeddedFunction":
        return cls(jnp.zeros(ebdyc.grid.shape),
                   [jnp.zeros(e.radial_shape) for e in ebdyc])

    # -- arithmetic (elementwise over leaves) ----------------------------------
    def _binop(self, o, op):
        if isinstance(o, EmbeddedFunction):
            return EmbeddedFunction(op(self.grid, o.grid),
                                    [op(a, b) for a, b in
                                     zip(self.radials, o.radials)])
        return EmbeddedFunction(op(self.grid, o),
                                [op(a, o) for a in self.radials])

    def __add__(self, o):
        return self._binop(o, lambda a, b: a + b)

    __radd__ = __add__

    def __sub__(self, o):
        return self._binop(o, lambda a, b: a - b)

    def __rsub__(self, o):
        return self._binop(o, lambda a, b: b - a)

    def __mul__(self, o):
        return self._binop(o, lambda a, b: a * b)

    __rmul__ = __mul__

    def __neg__(self):
        return self._binop(-1.0, lambda a, b: a * b)

    def __abs__(self):
        return EmbeddedFunction(jnp.abs(self.grid),
                                [jnp.abs(a) for a in self.radials])

    def max(self):
        m = jnp.max(self.grid)
        for a in self.radials:
            m = jnp.maximum(m, jnp.max(a))
        return m

    def max_on(self, ebdyc):
        """Max over physical points only."""
        m = jnp.max(jnp.where(jnp.asarray(ebdyc.phys), self.grid, -jnp.inf))
        for a in self.radials:
            m = jnp.maximum(m, jnp.max(a))
        return m

    def get_grid_value(self, ebdyc, masked: bool = False):
        """Grid values with exterior points zeroed (reference:
        ipde/embedded_function.py:184-189; the reference scatters packed
        gdata into zeros — here the grid array is already full-shape, so
        this is one mask).  ``masked=True`` returns a numpy masked array
        hiding the exterior."""
        arr = np.where(np.asarray(ebdyc.phys), np.asarray(self.grid), 0.0)
        if masked:
            arr = np.ma.array(arr, mask=~np.asarray(ebdyc.phys))
        return arr

    def get_smoothed_grid_value(self, ebdyc):
        """Grid values rolled off smoothly to zero across the annulus via
        the collection's smooth step (reference:
        ipde/embedded_function.py:190-194): suitable for global-FFT
        consumers that need a C^k periodic extension of the field."""
        return self.grid * ebdyc.grid_step_dev

    def __repr__(self):
        return (f"EmbeddedFunction(grid={jnp.shape(self.grid)}, "
                f"radials={[jnp.shape(r) for r in self.radials]})")

    # -- observability -----------------------------------------------------------
    def plot(self, ebdyc, ax=None, **kwargs):
        """Pseudocolor plot of the function over the physical region plus
        the radial grids (the reference's de-facto debugging tool;
        reference: ipde/embedded_function.py:139-183).  Returns (ax, quad)
        like the reference; requires matplotlib."""
        import matplotlib.pyplot as plt
        if ax is None:
            _, ax = plt.subplots()
        g = ebdyc.grid
        data = np.where(np.asarray(ebdyc.phys), np.asarray(self.grid),
                        np.nan)
        vmin = np.nanmin(data)
        vmax = np.nanmax(data)
        xh, yh = g.xh / 2.0, g.yh / 2.0
        clf = ax.pcolormesh(g.xv - xh, g.yv - yh, data.T, shading="auto",
                            vmin=vmin, vmax=vmax, **kwargs)
        for e, fr in zip(ebdyc, self.radials):
            ax.pcolormesh(e.radial_x, e.radial_y, np.asarray(fr),
                          shading="auto", vmin=vmin, vmax=vmax, **kwargs)
        return ax, clf

    # -- persistence -----------------------------------------------------------
    def save(self) -> dict:
        return {"grid": np.asarray(self.grid),
                "radials": [np.asarray(r) for r in self.radials]}

    @classmethod
    def load(cls, d: dict) -> "EmbeddedFunction":
        return cls(jnp.asarray(d["grid"]),
                   [jnp.asarray(r) for r in d["radials"]])


@jax.tree_util.register_pytree_node_class
class BoundaryFunction:
    """One value array per boundary (tuple of (N_b,) arrays)."""

    def __init__(self, values: Sequence):
        self.values = tuple(values)

    def tree_flatten(self):
        return (self.values,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    @classmethod
    def from_function(cls, ebdyc, f: Callable) -> "BoundaryFunction":
        return cls([jnp.asarray(f(e.bdy.x, e.bdy.y)) for e in ebdyc])

    def concat(self):
        return jnp.concatenate(self.values)

    def _binop(self, o, op):
        if isinstance(o, BoundaryFunction):
            return BoundaryFunction([op(a, b) for a, b in
                                     zip(self.values, o.values)])
        return BoundaryFunction([op(a, o) for a in self.values])

    def __add__(self, o):
        return self._binop(o, lambda a, b: a + b)

    def __sub__(self, o):
        return self._binop(o, lambda a, b: a - b)

    def __mul__(self, o):
        return self._binop(o, lambda a, b: a * b)

    def __getitem__(self, i):
        return self.values[i]
