"""Disk cache of compiled executables (VERDICT r2 item 5: per-shape
compile latency is 150 s through the TPU tunnel and jax's persistent
compilation cache hangs on this system).

`maybe_aot(jfn, args, tag)` returns a compiled callable: on a cache hit
it deserializes a previously compiled executable (sub-second) instead of
recompiling; on a miss it compiles, stores, and returns.  Default cache
directory is a PER-USER path (tempdir/ipde_aot_cache_<uid>, created mode
0700 and ownership-checked before any blob is unpickled -- executables
load via pickle, so a world-writable shared dir would be arbitrary code
execution); override with IPDE_AOT_CACHE=<dir> or disable with
IPDE_AOT_CACHE=0.

Cache key = (tag, jax/jaxlib versions, backend + device kind, a content
hash of all package .py files plus the repo-root entry scripts, abstract
shapes/dtypes of args).  Hashing the SOURCES (not the git commit) makes
stale hits across code changes impossible while keeping the cache warm
across doc-only commits and dirty worktrees -- the right trade for a
benchmark/experiment loop where one shape is rerun many times per
revision.

Reference analogue: none (the reference pays scipy/numba warmup per
process); this is TPU-tunnel-specific infrastructure.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile
import time


_SRC_HASH = None


def _default_cache_dir() -> str:
    uid = os.getuid() if hasattr(os, "getuid") else 0
    return os.path.join(tempfile.gettempdir(), f"ipde_aot_cache_{uid}")


def _dir_is_safe(path: str) -> bool:
    """True iff `path` is a directory owned by us and not writable by
    others -- the precondition for trusting pickled blobs inside it."""
    try:
        st = os.stat(path)
    except OSError:
        return False
    if hasattr(os, "getuid") and st.st_uid != os.getuid():
        return False
    return not (st.st_mode & 0o022)


def _src_hash() -> str:
    """Content hash of all package .py files (tracked or not) plus the
    repo-root entry scripts, with paths hashed RELATIVE to the repo root
    so identical trees at different checkout locations share entries.
    Computed once per process."""
    global _SRC_HASH
    if _SRC_HASH is not None:
        return _SRC_HASH
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = os.path.dirname(pkg)
    h = hashlib.sha256()
    paths = []
    for base in (pkg,):
        for dirpath, _, names in os.walk(base):
            paths.extend(os.path.join(dirpath, n) for n in names
                         if n.endswith(".py"))
    for extra in ("bench.py", "__graft_entry__.py"):
        p = os.path.join(root, extra)
        if os.path.exists(p):
            paths.append(p)
    for p in sorted(paths):
        h.update(os.path.relpath(p, root).encode())
        try:
            with open(p, "rb") as fh:
                h.update(fh.read())
        except OSError:
            pass
    _SRC_HASH = h.hexdigest()[:16]
    return _SRC_HASH


def _key(tag: str, args) -> str:
    import jax
    import numpy as np
    parts = [tag, jax.__version__, jax.default_backend(),
             jax.devices()[0].device_kind, _src_hash()]
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
    cache_dir = os.environ.get("IPDE_AOT_CACHE", _default_cache_dir())
    if cache_dir in ("", "0", "off"):
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
    os.makedirs(cache_dir, mode=0o700, exist_ok=True)
    if not _dir_is_safe(cache_dir):
        # not ours / group-or-world-writable: never unpickle from it
        if verbose:
            print(f"# aot-cache disabled: {cache_dir} is not a private "
                  f"directory owned by this user", flush=True)
        return jfn
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
            try:
                os.remove(path)
            except FileNotFoundError:
                pass
    t0 = time.time()
    compiled = jfn.lower(*args).compile()
    compile_s = time.time() - t0
    try:
        blob = pickle.dumps(se.serialize(compiled))
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, path)
        if verbose:
            print(f"# aot-cache miss {tag}: compiled {compile_s:.1f}s, "
                  f"stored {len(blob) / 1e6:.1f} MB", flush=True)
    except Exception as e:                  # serialization unsupported
        if verbose:
            print(f"# aot-cache store failed ({type(e).__name__}: {e}); "
                  f"continuing uncached", flush=True)
    return compiled
