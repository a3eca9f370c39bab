"""Persistent XLA compilation cache.

TPU compiles of the full scanned train program are expensive (observed
0.5-11 min through a remote-compile service); the on-disk cache makes every
subsequent process reuse them. Enabled by all CLIs, the bench, and the
driver entry points."""

import os

import jax


def enable(cache_dir=None, platform=None):
    # CPU executables are AOT-compiled for the exact host feature set; this
    # sandbox's microVMs expose different sets run to run, and XLA loading a
    # cached CPU binary built elsewhere warns of possible SIGILL. CPU
    # compiles are seconds — only the (remote, minutes-long) TPU compiles
    # need persistence, so skip the cache when the caller explicitly runs
    # on CPU (`platform` is the CLI's --platform value; sniffing
    # jax.config.jax_platforms instead would be wrong both ways: the env
    # var populates it but the axon plugin ignores the env var, and
    # priority lists like "tpu,cpu" aren't a CPU run). Tests opt out via
    # MPNN_NO_JAX_CACHE=1 (conftest).
    if platform == "cpu" or os.environ.get("MPNN_NO_JAX_CACHE") == "1":
        return None
    cache_dir = cache_dir or os.environ.get(
        "MPNN_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail a run over it
    return cache_dir
