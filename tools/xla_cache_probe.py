"""Bounded probe: does jax's persistent compilation cache work on the
axon TPU backend?  (Round 2 reported it hanging; utils/xla_cache.py only
defaults it on because this probe passed on hardware.)

Runs the SAME tiny eager-op sequence twice in two subprocesses sharing a
fresh cache dir, each under a hard timeout, and reports cold vs warm
wall clock + cache entry count.  Usage:
    python tools/xla_cache_probe.py [timeout_s]
"""

import os
import subprocess
import sys
import tempfile
import time

CHILD = r"""
import os, sys, time
import numpy as np
sys.path.insert(0, os.environ["IPDE_REPO"])
from ipde_tpu.utils.xla_cache import enable_persistent_cache
ok = enable_persistent_cache()
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
t0 = time.time()
x = jnp.asarray(np.linspace(0.0, 1.0, 600))
a = x[:, None] - x[None, :]
b = jnp.sin(a) * jnp.cos(a) + a * a
c = jnp.where(a > 0.5, b, -b) / (1.0 + a * a)
d = jnp.matmul(c, c.T, precision=jax.lax.Precision.HIGHEST)
s = float(jnp.sum(d))
print(f"child: cache_on={ok} backend={jax.default_backend()} "
      f"ops+fetch {time.time()-t0:.1f}s (sum {s:.3e})", flush=True)
"""


def main():
    timeout = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    cache = tempfile.mkdtemp(prefix="xla_probe_")
    env = dict(os.environ, IPDE_XLA_CACHE=cache,
               IPDE_REPO=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    for label in ("cold", "warm"):
        t0 = time.time()
        try:
            r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                               timeout=timeout, capture_output=True,
                               text=True)
            print(f"{label}: rc={r.returncode} {time.time()-t0:.1f}s total")
            print("  " + (r.stdout.strip() or r.stderr.strip()[-400:]))
        except subprocess.TimeoutExpired:
            print(f"{label}: TIMEOUT after {timeout}s -- cache unusable "
                  f"on this backend")
            return 1
        n = len(os.listdir(cache))
        print(f"  cache entries: {n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
