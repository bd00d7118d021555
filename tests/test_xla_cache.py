"""Persistent XLA compilation cache plumbing (utils/xla_cache.py).

Setup wall clock on the tunnel backend is compile-latency-bound (~522
single-op programs at bench sizes); the cache must (a) default on at a
safe per-user dir, (b) honor the =0 / <dir> env contract, (c) refuse
unsafe directories.  The cold/warm behavior on hardware is probed by
tools/xla_cache_probe.py, not here.
"""

import os
import stat

import jax
import pytest

from ipde_tpu.utils import xla_cache


@pytest.fixture(autouse=True)
def _reset():
    before = xla_cache._DONE
    prev = os.environ.pop("IPDE_XLA_CACHE", None)
    xla_cache._DONE = False
    yield
    xla_cache._DONE = before
    if prev is None:
        os.environ.pop("IPDE_XLA_CACHE", None)
    else:
        os.environ["IPDE_XLA_CACHE"] = prev


def test_disabled_by_env():
    os.environ["IPDE_XLA_CACHE"] = "0"
    assert xla_cache.enable_persistent_cache() is False
    assert xla_cache._DONE is False


def test_enabled_at_explicit_dir(tmp_path):
    d = tmp_path / "cache"
    os.environ["IPDE_XLA_CACHE"] = str(d)
    assert xla_cache.enable_persistent_cache() is True
    assert jax.config.jax_compilation_cache_dir == str(d)
    mode = stat.S_IMODE(os.stat(d).st_mode)
    assert not (mode & (stat.S_IWGRP | stat.S_IWOTH))
    # idempotent (second call is a no-op returning True)
    assert xla_cache.enable_persistent_cache() is True


def test_default_dir_is_per_user():
    d = xla_cache._default_dir()
    uid = os.getuid() if hasattr(os, "getuid") else 0
    assert d.endswith(f"ipde_xla_cache_{uid}")


def test_unsafe_dir_refused(tmp_path):
    d = tmp_path / "open"
    d.mkdir()
    os.chmod(d, 0o777)
    os.environ["IPDE_XLA_CACHE"] = str(d)
    assert xla_cache.enable_persistent_cache() is False
