"""Multi-host (DCN) communication backend.

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
    batch = multihost.global_batch(mesh, local_batch)   # shard over hosts
    ...
    if multihost.is_primary():        # one writer for stats/checkpoints
        write_net(...)

Exercised for real in tests/test_multihost.py: two coordinated processes
(CPU backend, gloo collectives) run a shared data-parallel gradient step
with per-process batch shards and assert bitwise-identical losses."""

import numpy as np
import jax


def initialize(coordinator_address=None, num_processes=None,
               process_id=None, cpu_collectives="gloo"):
    """Initialize jax.distributed; on TPU pods all arguments auto-detect
    from the environment. Safe to call once per process, before any other
    JAX backend touch. For CPU-backend multi-process runs (tests, dev
    boxes) `cpu_collectives` selects the cross-process CPU collective
    implementation."""
    if coordinator_address is not None and cpu_collectives:
        try:
            jax.config.update("jax_cpu_collectives_implementation",
                              cpu_collectives)
        except Exception:
            pass  # TPU runs don't need it; flag name is version-dependent
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


def global_batch(mesh, local_arrays, axis="data"):
    """Assemble per-process host shards into global device arrays sharded
    over `axis` (the cross-host data-parallel input path: each host feeds
    only its own examples; no host ever materializes the global batch).

    local_arrays: one array per leaf with the PER-PROCESS batch slice;
    returns arrays whose global leading dim is process_count * local."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(a):
        a = np.asarray(a)
        global_shape = (a.shape[0] * jax.process_count(),) + a.shape[1:]
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(axis)), a, global_shape)

    return jax.tree.map(put, local_arrays)


def replicate_to_global(mesh, tree):
    """Turn per-process host/local arrays into globally-REPLICATED
    jax.Arrays on a multi-process mesh.

    Multi-process jit rejects process-local committed jax.Arrays (e.g.
    init_training outputs or PRNG keys created per process); every process
    holds identical values here, so each one supplies the full array as its
    local shard of a fully-replicated global array. Host numpy inputs pass
    through jit unchanged either way, so calling this in a single-process
    run is a cheap no-op placement."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())

    def put(a):
        a = np.asarray(a)
        return jax.make_array_from_process_local_data(sharding, a, a.shape)

    return jax.tree.map(put, tree)


def sync_global_devices(tag="barrier"):
    """Cross-process barrier (e.g. before the primary writes files that
    other processes will read)."""
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(tag)
