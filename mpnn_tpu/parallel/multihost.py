"""Multi-host (DCN) initialization hook.

The reference is strictly single-process (SURVEY.md section 2.2). This
framework's mesh abstraction already spans hosts: `jax.distributed` makes
every host's local chips part of one global device list, and
`mpnn_tpu.parallel.make_mesh` over `jax.devices()` then produces a global
('data', 'model') mesh whose collectives ride ICI within a slice and DCN
across slices -- no other code changes (mesh axes are named, shardings are
declarative).

Typical multi-host launch (one process per host):

    from mpnn_tpu.parallel import multihost, make_mesh
    multihost.initialize()            # env-driven (TPU pods auto-detect)
    mesh = make_mesh()                # all global devices on 'data'

Single-host runs need not call this at all."""

import jax


def initialize(coordinator_address=None, num_processes=None,
               process_id=None):
    """Initialize jax.distributed; on TPU pods all arguments auto-detect
    from the environment. Safe to call once per process, before any other
    JAX calls."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def is_primary():
    """True on the process that should write checkpoints/stats/logs."""
    return jax.process_index() == 0
