"""Persistent XLA compilation cache.

TPU compiles of the full scanned train program are expensive (observed
0.5-11 min through a remote-compile service); the on-disk cache makes every
subsequent process reuse them. Enabled by all CLIs, the bench, and the
driver entry points."""

import os

import jax


def wait_for_backend(attempts=5, sleep_s=120):
    """Bounded retry for transient TPU-tunnel outages (observed
    2026-08-17: backend init hangs minutes then raises UNAVAILABLE).
    Each attempt pings the default backend in a fresh subprocess because
    a failed PJRT init poisons the in-process backend registry. Returns
    silently either way -- on exhaustion the caller's real run surfaces
    the error."""
    import subprocess
    import sys
    import time
    if os.environ.get("MPNN_NO_BACKEND_WAIT") == "1":
        return  # tests force CPU in-process; the default-backend ping
        # would probe the (possibly down) TPU tunnel for minutes.
    # Hand the ping child the persistent compile cache (JAX reads these
    # env vars at import): without it every attempt -- including the one
    # on each HEALTHY bench/entry start -- pays a fresh remote TPU compile
    # of the 8x8 matmul, and a slow-but-working compile service could eat
    # the whole retry budget.
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", _default_cache_dir())
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, numpy as np, jax.numpy as jnp;"
                 "np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))"],
                capture_output=True, text=True, timeout=600, env=env)
            ok, err_text = r.returncode == 0, r.stderr
        except subprocess.TimeoutExpired:
            ok, err_text = False, "ping subprocess timed out (600s)"
        if ok:
            return
        if i < attempts - 1:
            err = (err_text.strip().splitlines() or ["?"])[-1][:120]
            print(f"# backend init attempt {i + 1} failed, retrying in "
                  f"{sleep_s}s: {err}", file=sys.stderr, flush=True)
            time.sleep(sleep_s)


def _default_cache_dir():
    return os.environ.get(
        "MPNN_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))


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
    cache_dir = cache_dir or _default_cache_dir()
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail a run over it
    return cache_dir
