"""Chunked vs per-source patch scan (_plan_patch_chunks / IPDE_PATCH)
must agree to roundoff, including multi-curve junction chunks that fall
into the per-source remainder scan."""

import pytest
import os, numpy as np
import ipde_tpu
import jax.numpy as jnp
from ipde_tpu.geometry.grid import Grid

def build(chunk):
    os.environ["IPDE_PATCH"] = chunk
    from ipde_tpu.ops.grid_eval import FreespaceGridEvaluator, \
        StokesFreespaceGridEvaluator
    g = Grid((-1.2, 1.2), 128, (-1.2, 1.2), 128)
    th = np.linspace(0, 2*np.pi, 301, endpoint=False)
    # two concentric curves (exercises the junction/remainder path)
    sx = np.concatenate([0.7*np.cos(th), 0.4*np.cos(th)])
    sy = np.concatenate([0.7*np.sin(th), 0.4*np.sin(th)])
    fe = FreespaceGridEvaluator(g, sx, sy, kernel="laplace")
    se = StokesFreespaceGridEvaluator(g, sx, sy)
    return fe, se, sx.size

def test_chunked_patch_scan_matches():
    fe0, se0, S = build("scan")
    fe1, se1, _ = build("pull")
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal(S))
    qy = jnp.asarray(rng.standard_normal(S))
    a = np.asarray(fe0(q)); b = np.asarray(fe1(q))
    print("laplace diff:", np.abs(a - b).max(), "scale", np.abs(a).max())
    assert np.abs(a - b).max() < 1e-13 * max(1.0, np.abs(a).max())
    u0, v0, p0 = [np.asarray(x) for x in se0(q, qy)]
    u1, v1, p1 = [np.asarray(x) for x in se1(q, qy)]
    for n_, x0, x1 in (("u", u0, u1), ("v", v0, v1), ("p", p0, p1)):
        d = np.abs(x0 - x1).max()
        print(f"stokes {n_} diff:", d)
        assert d < 1e-12 * max(1.0, np.abs(x0).max()), d
    print("chunked patch scan OK")
