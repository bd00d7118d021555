"""Time the pieces of the jitted blocked Cholesky ON TPU at setup shapes.

The r5 jitted factorization executes ~150 s per compose-size call on chip
(tools/profile_setup.py 2026-08-21) -- this isolates whether the time is
in the diagonal-block sequential loops (_chol_unblocked/_tril_inv fori),
the Ozaki panel GEMMs, or the fori_loop program as a whole.

Usage: PROBE_N=2560 PROBE_BLOCK=256 python tools/chol_probe.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(outs):
    """block_until_ready returns early through the axon tunnel; a
    one-element host fetch is the only reliable barrier."""
    import jax
    import numpy as np
    leaves = jax.tree_util.tree_leaves(outs)
    for x in leaves:
        _ = np.asarray(jax.lax.slice(x.ravel(), (0,), (1,)))


def timeit(tag, fn, *args, n=3):
    _sync(fn(*args))  # compile + settle
    t0 = time.time()
    for _ in range(n):
        _sync(fn(*args))
    dt = (time.time() - t0) / n * 1e3
    print(f"{tag}: {dt:.1f} ms", flush=True)
    return dt


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    import jax.numpy as jnp
    from ipde_tpu.ops import device_linalg as dl

    n = int(os.environ.get("PROBE_N", 2560))
    block = int(os.environ.get("PROBE_BLOCK", 256))
    rng = np.random.default_rng(0)
    A = rng.standard_normal((n, n))
    G = A @ A.T + n * np.eye(n)
    Gd = jnp.asarray(G)

    # whole factorization
    f = jax.jit(dl._cholesky_blocked_jit, static_argnames=("block",))
    t0 = time.time()
    L, Dinv = f(Gd, block)
    jax.block_until_ready((L, Dinv))
    print(f"cholesky first (incl compile): {time.time()-t0:.1f}s",
          flush=True)
    timeit("cholesky_blocked_jit", lambda: f(Gd, block), n=2)

    # diagonal-block primitives at (block, block)
    Ab = jnp.asarray(G[:block, :block])
    cu = jax.jit(dl._chol_unblocked)
    timeit("chol_unblocked(block)", lambda: cu(Ab))
    Lb = cu(Ab)
    ti = jax.jit(dl._tril_inv)
    timeit("tril_inv(block)", lambda: ti(Lb))

    # one Ozaki panel GEMM at (n, block) x (block, n) and Schur-size
    from ipde_tpu.ops.ozaki import ozaki_mm
    P = jnp.asarray(rng.standard_normal((n, block)))
    oz = jax.jit(lambda a: ozaki_mm(a, a.T))
    timeit("ozaki (n,block)x(block,n)", lambda: oz(P))

    # plain emulated-f64 GEMM for scale
    mm = jax.jit(lambda a: jnp.matmul(a, a.T,
                                      precision=jax.lax.Precision.HIGHEST))
    timeit("f64 dot (n,block)x(block,n)", lambda: mm(P))


if __name__ == "__main__":
    main()
