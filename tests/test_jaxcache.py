"""Persistent-compile-cache gating (mpnn_tpu/utils/jaxcache.py).

The cache must engage for TPU runs (remote compiles are minutes each) but
stay OFF for explicit-CPU runs and under tests: XLA:CPU executables are
AOT-compiled for the exact host feature set, and this project's cache dir
outlives any one microVM profile (loading a foreign binary can SIGILL).
Gating is by the caller's explicit platform — never by sniffing
jax.config.jax_platforms, which the env var populates but the axon TPU
plugin ignores."""

import os

import jax

from mpnn_tpu.utils import jaxcache


def _without_env(key):
    saved = os.environ.pop(key, None)

    def restore():
        if saved is not None:
            os.environ[key] = saved
    return restore


def test_cpu_platform_skips_cache(tmp_path):
    restore = _without_env("MPNN_NO_JAX_CACHE")
    try:
        assert jaxcache.enable(cache_dir=str(tmp_path),
                               platform="cpu") is None
        assert not jax.config.jax_compilation_cache_dir == str(tmp_path)
    finally:
        restore()


def test_env_optout_skips_cache(tmp_path):
    saved = os.environ.get("MPNN_NO_JAX_CACHE")
    os.environ["MPNN_NO_JAX_CACHE"] = "1"
    try:
        assert jaxcache.enable(cache_dir=str(tmp_path)) is None
    finally:
        if saved is None:
            del os.environ["MPNN_NO_JAX_CACHE"]
        else:
            os.environ["MPNN_NO_JAX_CACHE"] = saved


def test_default_enables_cache(tmp_path):
    restore = _without_env("MPNN_NO_JAX_CACHE")
    prev = jax.config.jax_compilation_cache_dir
    try:
        got = jaxcache.enable(cache_dir=str(tmp_path))
        assert got == str(tmp_path)
        assert jax.config.jax_compilation_cache_dir == str(tmp_path)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        restore()
