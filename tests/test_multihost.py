"""Real multi-process communication-backend test (SURVEY.md section 2.2
"distributed comm backend" row): two coordinated OS processes on the CPU
backend run a shared data-parallel gradient step with per-process batch
shards and must agree bitwise on the loss.

This is the closest single-machine stand-in for a two-host DCN run: the
same jax.distributed client, the same global-mesh construction, the same
make_array_from_process_local_data input path, with gloo providing the
cross-process collectives."""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import sys

proc_id = int(sys.argv[1])
port = sys.argv[2]

import jax
jax.config.update("jax_platforms", "cpu")
from mpnn_tpu.parallel import multihost, mesh as mesh_lib

idx, count = multihost.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2,
    process_id=proc_id)
assert (idx, count) == (proc_id, 2), (idx, count)
assert len(jax.devices()) == 2, jax.devices()

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

m = mesh_lib.make_mesh(n_data=2, n_model=1)

# Each process holds only ITS half of the global batch.
rng = np.random.RandomState(100 + proc_id)
local_x = rng.rand(8, 4).astype(np.float32)
gx = multihost.global_batch(m, local_x)
assert gx.shape == (16, 4), gx.shape

# Replicated params, process-sharded batch, cross-process grad psum.
w = jax.device_put(jnp.ones((4, 2)), NamedSharding(m, P()))

@jax.jit
def loss_and_grad(w, x):
    def loss(w):
        return jnp.mean(jnp.square(x @ w))
    return jax.value_and_grad(loss)(w)

c, g = loss_and_grad(w, gx)
c = float(c)
g0 = float(np.asarray(jax.device_get(g))[0, 0])
multihost.sync_global_devices("done")
print(f"RESULT {proc_id} {c:.9f} {g0:.9f}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.filterwarnings("ignore")
def test_two_process_dp_step_agrees():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one real CPU device per process
    procs = [subprocess.Popen(
        [sys.executable, "-c", WORKER, str(i), str(port)],
        cwd=repo, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process workers timed out")
        if p.returncode != 0 and ("gloo" in err.lower()
                                  or "collectives" in err.lower()):
            pytest.skip(f"CPU cross-process collectives unavailable: "
                        f"{err[-300:]}")
        assert p.returncode == 0, err[-3000:]
        outs.append(out)

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, c, g = line.split()
                results[int(pid)] = (c, g)
    assert set(results) == {0, 1}, outs
    # Both processes computed the SAME global loss and gradient (the batch
    # halves came from different processes, so agreement proves the
    # cross-process collective actually ran).
    assert results[0] == results[1], results
