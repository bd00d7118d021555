"""Persistent XLA compilation cache for the TPU-tunnel environment.

Setup is dominated by COMPILE LATENCY, not compute: at bench sizes the
eager setup path (device QFS/BIE formation + blocked factorizations)
triggers ~522 distinct single-op XLA compilations (measured with
JAX_LOG_COMPILES at nb=600 Stokes), each serialized through the axon
tunnel at ~1-3 s -- that IS the observed 650-1600 s setup wall clock
(total host CPU over the same span: ~25 s).

jax's persistent compilation cache writes every compiled executable to
disk keyed by (HLO, platform, flags); warm runs skip the tunnel compile
entirely.  This module turns it on process-wide at a per-user directory
(same threat model as utils/aot_cache.py: executables are code, so the
directory is created 0700 and ownership-checked).

Env contract:
  IPDE_XLA_CACHE=0       disable
  IPDE_XLA_CACHE=<dir>   cache directory override
  (unset)                ON at tempdir/ipde_xla_cache_<uid>

enable_persistent_cache() is idempotent and cheap; it is called from the
heavy setup entry points (EmbeddedBoundary/solver constructors) rather
than at import so plain library imports never touch jax.config.

History: round 2 reported the persistent cache "hanging" on this system;
re-probed 2026-08-19 (tools/compile_cache_probe.py) -- mechanics work on
CPU, and executable (de)serialization on the axon backend is proven daily
by utils/aot_cache.py.  tools/xla_cache_probe.py is the bounded on-TPU
probe.  Reference analogue: none (TPU-tunnel-specific infrastructure).
"""

from __future__ import annotations

import os
import stat
import tempfile

_DONE = False


def _default_dir() -> str:
    uid = os.getuid() if hasattr(os, "getuid") else 0
    return os.path.join(tempfile.gettempdir(), f"ipde_xla_cache_{uid}")


def _dir_is_safe(path: str) -> bool:
    try:
        st = os.stat(path)
    except OSError:
        return False
    if hasattr(os, "getuid") and st.st_uid != os.getuid():
        return False
    return not (st.st_mode & (stat.S_IWGRP | stat.S_IWOTH))


def enable_persistent_cache() -> bool:
    """Idempotently point jax at the on-disk compilation cache.  Returns
    True when the cache is active."""
    global _DONE
    if _DONE:
        return True
    flag = os.environ.get("IPDE_XLA_CACHE", "").strip()
    if flag in ("0", "off", "false", "no"):
        return False
    explicit_dir = bool(flag) and flag not in ("1", "on", "true", "yes")
    if not explicit_dir:
        # default-on ONLY on the tunnel backend: that is where compile
        # latency lives.  On this system even "cpu" compiles can happen on
        # the remote compile service, whose machine features differ from
        # the local host -- cached CPU executables then load with
        # feature-mismatch warnings (and possible SIGILL).  An explicit
        # IPDE_XLA_CACHE=<dir> opts in on any backend.
        import jax
        if jax.default_backend() != "tpu":
            return False
    cache_dir = flag if explicit_dir else _default_dir()
    if not os.path.isdir(cache_dir):
        try:
            os.makedirs(cache_dir, mode=0o700, exist_ok=True)
        except OSError:
            return False
    if not _dir_is_safe(cache_dir):
        return False
    import jax
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # default thresholds skip exactly the tiny eager-op programs that
    # dominate setup; cache everything
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _DONE = True
    return True
