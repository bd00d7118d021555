"""Probe compile-latency mitigation options on the TPU tunnel (VERDICT r2
item 5): (a) the jax persistent compilation cache (reported hanging on
this system in round 2), (b) AOT serialize/deserialize of a compiled
executable (jax.experimental.serialize_executable).

Writes results to stdout; safe to re-run.  Usage:
    python tools/compile_cache_probe.py            # probe both
    PROBE=cache python tools/compile_cache_probe.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
PROBE = os.environ.get("PROBE", "both")
CACHE_DIR = "/tmp/jax_cache_probe"


def heavy_fn():
    import jax
    import jax.numpy as jnp

    def f(x):
        # a moderately big program: several FFTs + matmuls + scan
        def body(c, _):
            y = jnp.fft.rfft(c, axis=0)
            z = jnp.fft.irfft(y, n=c.shape[0], axis=0)
            return z @ (z.T @ c) * 1e-6 + c, None
        out, _ = jax.lax.scan(body, x, None, length=8)
        return jnp.sum(out)
    return f


def probe_cache():
    import jax
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    f = jax.jit(heavy_fn())
    x = jnp.asarray(np.random.default_rng(0).standard_normal((512, 512)))
    t0 = time.time()
    _ = float(f(x))
    print(f"persistent-cache: first compile+run {time.time()-t0:.1f} s",
          flush=True)
    entries = os.listdir(CACHE_DIR) if os.path.isdir(CACHE_DIR) else []
    print(f"persistent-cache: {len(entries)} cache entries", flush=True)


def probe_serialize():
    import pickle

    import jax
    import jax.numpy as jnp
    f = jax.jit(heavy_fn())
    x = jnp.asarray(np.random.default_rng(0).standard_normal((512, 512)))
    t0 = time.time()
    lowered = f.lower(x)
    compiled = lowered.compile()
    print(f"serialize: lower+compile {time.time()-t0:.1f} s", flush=True)
    try:
        from jax.experimental import serialize_executable as se
        t0 = time.time()
        blob = pickle.dumps(se.serialize(compiled))
        print(f"serialize: serialized {len(blob)/1e6:.1f} MB "
              f"in {time.time()-t0:.1f} s", flush=True)
        t0 = time.time()
        unloaded = se.deserialize_and_load(*pickle.loads(blob))
        out = unloaded(x)
        print(f"serialize: deserialize+run {time.time()-t0:.1f} s "
              f"(val {float(out):.3e})", flush=True)
    except Exception as e:
        print(f"serialize: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    if PROBE in ("cache", "both"):
        probe_cache()
    if PROBE in ("serialize", "both"):
        probe_serialize()
