"""Test config: run on CPU with 8 virtual devices.

This is the standard JAX substitute for a fake multi-device backend
(SURVEY.md section 4): sharding/pjit tests exercise the same GSPMD
partitioner that runs on a real TPU mesh. Must set env vars BEFORE jax
imports."""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
# Tests never want the persistent compile cache: CPU AOT executables are
# host-feature-set specific and .jax_cache persists across microVMs
# (possible SIGILL loading another profile's binary). Subprocess tests
# (CLI smoke, multihost, graft-entry) inherit this via the environment.
os.environ["MPNN_NO_JAX_CACHE"] = "1"
# Likewise skip the TPU-outage backend ping (jaxcache.wait_for_backend):
# tests force CPU in-process, but the ping subprocess would probe the
# default (axon) backend and stall for minutes when the tunnel is down.
os.environ["MPNN_NO_BACKEND_WAIT"] = "1"

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; the config knob after import
# does force the CPU backend (with the 8 virtual devices from XLA_FLAGS).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synth_dataset():
    from mpnn_tpu.data import Dataset, synth
    return Dataset(synth.make_synthetic(n_tr=256, n_ts=96, h=16, w=16,
                                        n_cls=10, seed=0))


@pytest.fixture(scope="session")
def rng():
    import jax
    return jax.random.PRNGKey(0)
