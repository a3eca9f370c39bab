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


DRIVER_WORKER = r"""
import os
import sys

proc_id = int(sys.argv[1])
port = sys.argv[2]
workdir = sys.argv[3]

import jax
jax.config.update("jax_platforms", "cpu")
from mpnn_tpu.parallel import multihost, mesh as mesh_lib

idx, count = multihost.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2,
    process_id=proc_id)
assert (idx, count) == (proc_id, 2)

import numpy as np
from mpnn_tpu.data import Dataset, synth
from mpnn_tpu.models import SRNet, Schedules
from mpnn_tpu.train import train_one_net
from mpnn_tpu.ops import (Chain, LinTrans, Select, Softmax,
                          CrossEntropyError, ToPyramid, MultiscaleConvMax,
                          MultiscaleRect)

ds = Dataset(synth.make_synthetic(n_tr=64, n_ts=32, h=16, w=16,
                                  n_cls=10, seed=0), device_put=False)
root = Chain(comps=[ToPyramid(n_scales=2),
                    MultiscaleConvMax(n_chan=[4, 4], supp=3),
                    MultiscaleRect(),
                    Select(i=-1),
                    LinTrans(n_chan=10),
                    Softmax(), CrossEntropyError()])
net = SRNet(x0_shape=ds.x0_shape, y_shape=ds.y_shape, root=root)

mesh = mesh_lib.make_mesh(n_data=2, n_model=1)
out_dir = os.path.join(workdir, f"proc{proc_id}", "synth-sr-mh")
params, state, vel, desc = train_one_net(
    net, ds, schedules=Schedules(lr=lambda t: 0.05), tau_fn=None,
    n_iter=8, t_log=4, batch_size=8, out_dir=out_dir, net_index=0,
    seed=0, verbose=False, mesh=mesh)

acc = float(np.asarray(desc["stats_ts"]["acc"]))
moc = float(np.asarray(desc["stats_ts"]["moc"]))
multihost.sync_global_devices("driver-done")
print(f"DRIVER_RESULT {proc_id} {acc:.9f} {moc:.9f}", flush=True)
"""


@pytest.mark.filterwarnings("ignore")
def test_two_process_train_driver_single_writer(tmp_path):
    """The ACTUAL training driver across two coordinated processes
    (VERDICT r2 Next #3): a real train_one_net run over a 2-process
    ('data','model') mesh with globally-staged data must (a) produce
    bitwise-identical eval stats on both processes (the cross-process
    gradient psum ran), and (b) write stats/log/checkpoint files from
    process 0 ONLY (single-writer gating)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one real CPU device per process
    procs = [subprocess.Popen(
        [sys.executable, "-c", DRIVER_WORKER, str(i), str(port),
         str(tmp_path)],
        cwd=repo, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("driver workers timed out")
        if p.returncode != 0 and ("gloo" in err.lower()
                                  or "collectives" in err.lower()):
            pytest.skip(f"CPU cross-process collectives unavailable: "
                        f"{err[-300:]}")
        assert p.returncode == 0, err[-3000:]
        outs.append(out)

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("DRIVER_RESULT"):
                _, pid, acc, moc = line.split()
                results[int(pid)] = (acc, moc)
    assert set(results) == {0, 1}, outs
    # Identical final eval stats on both processes: each fed the step
    # through the same global mesh, so agreement proves the sharded step +
    # gradient collective ran coherently.
    assert results[0] == results[1], results

    # Single-writer: process 0's out_dir has the full on-disk contract;
    # process 1 wrote NOTHING.
    p0 = tmp_path / "proc0" / "synth-sr-mh"
    p1 = tmp_path / "proc1" / "synth-sr-mh"
    assert (p0 / "0000.npy").exists()
    assert (p0 / "0000-stats.npy").exists()
    assert (p0 / "0000-log.txt").exists()
    assert not p1.exists(), list(p1.iterdir())
