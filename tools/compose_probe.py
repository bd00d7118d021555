"""Minimal on-hardware reproduction of the device QFS compose at reduced
size: builds a synthetic wide QFS-like system (graded exponential column
norms, like the filtered upsampled QFS operators), runs minnorm_compose,
and reports the TRUE residual vs a host LAPACK reference -- plus a direct
exact_mm-vs-host check on the same operands.

Decides whether the dd-cell residual floor lives in minnorm_compose (and
whether exact_mm/ozaki actually engages there) without paying the full
geometry + formation cost of tools/qfs_decompose.py.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from ipde_tpu.ops.device_linalg import exact_mm, minnorm_compose, _mm

    n = int(os.environ.get("N", 2000))
    print("backend", jax.default_backend(), "n", n, flush=True)
    rng = np.random.default_rng(0)

    # QFS-like wide system: smooth kernel matrix with graded spectrum
    th_s = 2 * np.pi * np.arange(n) / n
    th_t = 2 * np.pi * np.arange(n) / n
    sx, sy = 1.08 * np.cos(th_s), 1.08 * np.sin(th_s)
    tx = np.cos(th_t) * (1 + 0.2 * np.cos(5 * th_t))
    ty = np.sin(th_t) * (1 + 0.2 * np.cos(5 * th_t))
    A = -np.log((tx[:, None] - sx[None, :]) ** 2
                + (ty[:, None] - sy[None, :]) ** 2) / (4 * np.pi)
    F = np.linalg.qr(rng.standard_normal((n, n)))[0] * 0.5

    Ad, Fd = jnp.asarray(A), jnp.asarray(F)

    # direct product accuracy on the compose operands
    ref = A @ F
    em = np.asarray(exact_mm(Ad, Fd))
    pm = np.asarray(_mm(Ad, Fd))
    sc = np.abs(ref).max()
    print(f"exact_mm vs host: {np.abs(em - ref).max():.3e} "
          f"({np.abs(em - ref).max()/sc:.3e} rel)", flush=True)
    print(f"plain _mm vs host: {np.abs(pm - ref).max():.3e} "
          f"({np.abs(pm - ref).max()/sc:.3e} rel)", flush=True)
    print(f"exact_mm == _mm bitwise: {np.array_equal(em, pm)}", flush=True)

    print("cond(A A^T) ~", np.linalg.cond(A @ A.T), flush=True)
    t0 = time.time()
    maps = minnorm_compose(Ad, [Fd], refine=2)
    M = np.asarray(maps[0])
    print(f"compose {time.time()-t0:.0f}s", flush=True)
    R = F - A @ M
    print(f"device compose residual |F - A M|_inf = {np.abs(R).max():.3e}",
          flush=True)
    # host reference
    Mh, *_ = np.linalg.lstsq(A, F, rcond=None)
    Rh = F - A @ Mh
    print(f"host lstsq residual            = {np.abs(Rh).max():.3e}",
          flush=True)


if __name__ == "__main__":
    main()
