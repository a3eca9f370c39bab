"""Mesh parallelism on the virtual 8-device CPU mesh: data-parallel and
dp x tp training steps compile, execute, and agree with single-device
results (the JAX substitute for a fake multi-device backend, SURVEY.md
section 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpnn_tpu.parallel import (make_mesh, shard_params, replicate_tree,
                               batch_sharding)
from mpnn_tpu.models import (ActorNet, Schedules, make_train_step,
                             init_training)
from .test_train_e2e import pyr, rcm, reg


def _net(ds):
    root = pyr(rcm([8, 8, 8], reg(10), rcm([8, 8], reg(10))))
    return ActorNet(x0_shape=ds.x0_shape, y_shape=ds.y_shape, root=root,
                    k_cpt=1e-9)


def _run_steps(net, ds, mesh, n_model, n_steps=4, batch=32):
    params, state, vel = init_training(net, seed=0)
    if mesh is not None:
        params = shard_params(params, mesh, model_parallel=(n_model > 1),
                              min_chan=8)
        vel = shard_params(vel, mesh, model_parallel=(n_model > 1),
                           min_chan=8)
        state = replicate_tree(state, mesh)
    sched = Schedules(lr=lambda t: 0.05, tau=lambda t: 1.0)
    step = make_train_step(net, batch, sched, mesh=mesh)
    x0_tr, y_tr, m_sym = ds.train_arrays
    if mesh is not None:
        x0_tr, y_tr, m_sym = (replicate_tree(a, mesh)
                              for a in (x0_tr, y_tr, m_sym))
    rng = jax.random.PRNGKey(5)
    losses = []
    for t in range(n_steps):
        params, state, vel, c = step(params, state, vel, t, rng,
                                     x0_tr, y_tr, m_sym)
        losses.append(float(c))
    return params, losses


def test_devices_available():
    assert len(jax.devices()) >= 8


def test_dp_matches_single_device(synth_dataset):
    """Pure DP over 8 devices reproduces the single-device training
    trajectory (same rng, same batches; the sharding constraint only
    partitions work)."""
    net = _net(synth_dataset)
    mesh = make_mesh(n_data=8, n_model=1)
    _, losses_dp = _run_steps(net, synth_dataset, mesh, 1)
    net2 = _net(synth_dataset)
    _, losses_1d = _run_steps(net2, synth_dataset, None, 1)
    np.testing.assert_allclose(losses_dp, losses_1d, rtol=1e-4)


def test_dp_tp_mesh_runs(synth_dataset):
    """4x2 dp x tp mesh: model-axis sharded params train without error and
    match the single-device losses."""
    net = _net(synth_dataset)
    mesh = make_mesh(n_data=4, n_model=2)
    params, losses = _run_steps(net, synth_dataset, mesh, 2)
    assert np.isfinite(losses).all()
    net2 = _net(synth_dataset)
    _, losses_1d = _run_steps(net2, synth_dataset, None, 1)
    np.testing.assert_allclose(losses, losses_1d, rtol=1e-3)


def test_batch_actually_sharded(synth_dataset):
    """The sampled batch inside the step is laid out over the data axis:
    check via the sharding of a jitted identity on a constrained array."""
    mesh = make_mesh(n_data=8, n_model=1)
    x = jnp.zeros((64, 4))
    xs = jax.device_put(x, batch_sharding(mesh))
    assert len(xs.sharding.device_set) == 8
