"""Persistent XLA compilation cache.

TPU compiles of the full scanned train program are expensive (observed
0.5-11 min through a remote-compile service); the on-disk cache makes every
subsequent process reuse them. Enabled by all CLIs, the bench, and the
driver entry points."""

import os

import jax


def enable(cache_dir=None):
    # CPU executables are AOT-compiled for the exact host feature set; this
    # sandbox's microVMs expose different sets run to run, and XLA loading a
    # cached CPU binary built elsewhere warns of possible SIGILL. CPU
    # compiles are seconds — only the (remote, minutes-long) TPU compiles
    # need persistence, so skip the cache when CPU is explicitly forced.
    # All callers force the platform before calling enable(), so reading the
    # config (never the backend — that would initialize it) is safe.
    try:
        if "cpu" in str(jax.config.jax_platforms or "").lower():
            return None
    except Exception:
        pass
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
