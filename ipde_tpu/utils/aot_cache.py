"""Disk cache of compiled executables (VERDICT r2 item 5: per-shape
compile latency is 150 s through the TPU tunnel and jax's persistent
compilation cache hangs on this system).

`maybe_aot(jfn, args, tag)` returns a compiled callable: on a cache hit
it deserializes a previously compiled executable (sub-second) instead of
recompiling; on a miss it compiles, stores, and returns.  Enabled by
setting IPDE_AOT_CACHE=<dir>; off otherwise (returns jfn unchanged).

Cache key = (tag, jax/jaxlib versions, backend + device kind, git HEAD,
abstract shapes/dtypes of args).  Including the commit hash makes stale
hits across code changes impossible at the cost of cold caches after
every commit -- the right trade for a benchmark/experiment loop where
one shape is rerun many times per revision.

Reference analogue: none (the reference pays scipy/numba warmup per
process); this is TPU-tunnel-specific infrastructure.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import subprocess
import time


def _git_head() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), timeout=10,
        ).stdout.strip() or "nogit"
    except Exception:
        return "nogit"


def _key(tag: str, args) -> str:
    import jax
    import numpy as np
    parts = [tag, jax.__version__, jax.default_backend(),
             jax.devices()[0].device_kind, _git_head()]
    # env flags that change the traced program at identical shapes
    for flag in ("IPDE_PALLAS", "IPDE_PRECOND_F32", "IPDE_NATIVE_FFT",
                 "IPDE_NO_STRATIFIED"):
        parts.append(f"{flag}={os.environ.get(flag, '')}")
    for leaf in jax.tree_util.tree_leaves(args):
        parts.append(f"{np.shape(leaf)}:{np.asarray(leaf).dtype}")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:24]


def maybe_aot(jfn, args, tag: str, verbose: bool = True):
    """Wrap a jitted OR planified function with the executable disk cache
    (see module docstring).  `args` must be example arguments with the
    production shapes; the returned callable accepts the same tree."""
    cache_dir = os.environ.get("IPDE_AOT_CACHE", "")
    if not cache_dir:
        return jfn
    import jax
    if jax.device_count() > 1:
        # deserialized executables bind to the full device set and reject
        # single-shard args; the cache targets the single-chip bench loop
        if verbose:
            print("# aot-cache disabled: multi-device runtime", flush=True)
        return jfn
    if hasattr(jfn, "inner") and hasattr(jfn, "plans"):
        # planified callable (utils/planify.py): lower the inner jit with
        # the plan pytree prepended, re-thread the plans on every call
        plans = jfn.plans
        compiled = maybe_aot(jfn.inner, (plans, *args), tag, verbose)
        if compiled is jfn.inner:
            return jfn
        return lambda *a: compiled(plans, *a)
    from jax.experimental import serialize_executable as se
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, _key(tag, args) + ".jaxexe")
    if os.path.exists(path):
        t0 = time.time()
        try:
            with open(path, "rb") as fh:
                compiled = se.deserialize_and_load(*pickle.load(fh))
            if verbose:
                print(f"# aot-cache hit {tag}: loaded in "
                      f"{time.time() - t0:.1f}s", flush=True)
            return compiled
        except Exception as e:              # stale/incompatible blob
            if verbose:
                print(f"# aot-cache load failed ({type(e).__name__}: {e}); "
                      f"recompiling", flush=True)
            os.remove(path)
    t0 = time.time()
    compiled = jfn.lower(*args).compile()
    compile_s = time.time() - t0
    try:
        blob = pickle.dumps(se.serialize(compiled))
        with open(path, "wb") as fh:
            fh.write(blob)
        if verbose:
            print(f"# aot-cache miss {tag}: compiled {compile_s:.1f}s, "
                  f"stored {len(blob) / 1e6:.1f} MB", flush=True)
    except Exception as e:                  # serialization unsupported
        if verbose:
            print(f"# aot-cache store failed ({type(e).__name__}: {e}); "
                  f"continuing uncached", flush=True)
    return compiled
