"""Executable disk cache (utils/aot_cache.py): correctness + hit path.

The cache only engages on single-device runtimes (deserialized
executables bind to the full device set), so the roundtrip tests run in
a single-device subprocess; the in-process tests cover the disabled
paths."""

import os
import subprocess
import sys
import textwrap

import jax
import jax.numpy as jnp

from ipde_tpu.utils.aot_cache import maybe_aot

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_disabled_is_identity(monkeypatch):
    # unset now means ENABLED (per-user default dir); "0" is the off switch
    monkeypatch.setenv("IPDE_AOT_CACHE", "0")
    f = jax.jit(lambda x: x + 1)
    assert maybe_aot(f, (jnp.zeros(4),), "t") is f


def test_multidevice_is_identity(monkeypatch, tmp_path):
    # conftest forces 8 virtual devices
    monkeypatch.setenv("IPDE_AOT_CACHE", str(tmp_path))
    f = jax.jit(lambda x: x + 1)
    assert maybe_aot(f, (jnp.zeros(4),), "t") is f


def test_roundtrip_single_device(tmp_path):
    script = textwrap.dedent(f"""
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
        os.environ["IPDE_AOT_CACHE"] = {str(tmp_path)!r}
        import sys
        sys.path.insert(0, {_REPO!r})
        import numpy as np
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp
        from ipde_tpu.utils.aot_cache import maybe_aot
        from ipde_tpu.utils.planify import planified

        f = jax.jit(lambda x: jnp.sum(x * x) + 1.0)
        x = jnp.asarray(np.arange(64, dtype=np.float64))
        want = float(f(x))
        c1 = maybe_aot(f, (x,), "t1")
        assert float(c1(x)) == want
        c2 = maybe_aot(f, (x,), "t1")     # hit
        assert float(c2(x)) == want
        n = len([p for p in os.listdir({str(tmp_path)!r})
                 if p.endswith(".jaxexe")])
        assert n == 1, n

        class H: pass
        h = H(); h.plan = jnp.asarray(np.linspace(0, 1, 16))
        def step(y): return y * h.plan + 1.0
        jstep = planified(step, h)
        y = jnp.asarray(np.arange(16, dtype=np.float64))
        want2 = np.asarray(jstep(y))
        c = maybe_aot(jstep, (y,), "plan1")
        assert np.abs(np.asarray(c(y)) - want2).max() == 0.0
        c2 = maybe_aot(jstep, (y,), "plan1")   # hit path
        assert np.abs(np.asarray(c2(y)) - want2).max() == 0.0

        # a group/world-writable cache dir must be refused (pickle safety)
        unsafe = {str(tmp_path)!r} + "_unsafe"
        os.makedirs(unsafe, exist_ok=True)
        os.chmod(unsafe, 0o777)
        os.environ["IPDE_AOT_CACHE"] = unsafe
        assert maybe_aot(f, (x,), "t2") is f
        print("OK")
    """)
    out = subprocess.run([sys.executable, "-c", script], capture_output=True,
                         text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK" in out.stdout
