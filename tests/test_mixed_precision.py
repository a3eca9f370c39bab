"""bf16 activation-policy tests.

Under `config.set_compute_dtype(jnp.bfloat16)` activations flow bf16
end-to-end (the TPU train step is HBM-bandwidth-bound on activation
traffic) while every precision-critical quantity stays fp32: batch-norm
moments/EMA, router logits (eps-mixture floors ~1e-7), class
probabilities, losses, statistics, parameters and their updates.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpnn_tpu.ops import config
from mpnn_tpu.models import ActorNet, Schedules, init_training
from mpnn_tpu.models.net import Ctx
from mpnn_tpu.models.steps import make_train_loop
from mpnn_tpu.models import state_stats

from .test_train_e2e import pyr, rcm, reg


@pytest.fixture
def bf16_policy():
    config.set_compute_dtype(jnp.bfloat16)
    yield
    config.set_compute_dtype(None)


def _net(ds):
    root = pyr(rcm([8, 8, 8], reg(10), rcm([8, 8], reg(10))))
    return ActorNet(x0_shape=ds.x0_shape, y_shape=ds.y_shape, root=root,
                    k_cpt=1e-9)


def test_bf16_dtypes_and_fp32_islands(synth_dataset, bf16_policy):
    net = _net(synth_dataset)
    params, state, _ = init_training(net, seed=0)
    x0_tr, y_tr, _ = synth_dataset.train_arrays
    x0, y = x0_tr[:16], y_tr[:16]
    ctx = Ctx(train=True, rng=jax.random.PRNGKey(0), tau=1.0, eps=1e-6,
              k_cpt=1e-9)
    recs, new_state = net.forward(params, state, x0, y, ctx)

    # Conv-stage activations are bf16 (list-of-scales pyramid).
    rcm_node = net.root.sinks[0]
    assert all(xi.dtype == jnp.bfloat16 for xi in recs[rcm_node].x)
    # Router logits recorded fp32; leaf probabilities fp32 (Softmax).
    assert recs[rcm_node].router_x.dtype == jnp.float32
    leaf = rcm_node.sinks[0]
    assert recs[leaf].x.dtype == jnp.float32
    assert recs[leaf].c_err.dtype == jnp.float32
    # BatchNorm EMA state stays fp32.
    bn_state = jax.tree.leaves(new_state)
    assert all(s.dtype == jnp.float32 for s in bn_state if s.ndim > 0)

    # Loss and stats fp32.
    c = net.loss(recs, 16, ctx)
    assert c.dtype == jnp.float32
    net.route_for_stats(recs, 16, ctx)
    stats = state_stats(net, recs, y)
    assert all(v.dtype == jnp.float32 for v in stats.values())
    # eps floor survives: leaf p_tr >= eps * n_leaves(l)/n_leaves(root).
    deep_leaf_ptr = np.asarray(recs[rcm_node.sinks[1].sinks[0]].p_tr)
    assert (deep_leaf_ptr >= 1e-6 / 3 - 1e-12).all()


def test_bf16_training_converges(synth_dataset, bf16_policy):
    net = _net(synth_dataset)
    params, state, vel = init_training(net, seed=0)
    sched = Schedules(lr=lambda t: 0.02, tau=lambda t: 1.0)
    loop = make_train_loop(net, 32, sched)
    x0_tr, y_tr, m_sym = synth_dataset.train_arrays
    _, _, _, cs = loop(params, state, vel, 0, jax.random.PRNGKey(9),
                       x0_tr, y_tr, m_sym, 60)
    cs = np.asarray(cs)
    assert np.isfinite(cs).all()
    assert np.mean(cs[-10:]) < np.mean(cs[:10])
    # Params/velocity remain fp32 master copies.


def test_bf16_params_stay_fp32(synth_dataset, bf16_policy):
    net = _net(synth_dataset)
    params, state, vel = init_training(net, seed=0)
    sched = Schedules(lr=lambda t: 0.02, tau=lambda t: 1.0)
    loop = make_train_loop(net, 32, sched)
    x0_tr, y_tr, m_sym = synth_dataset.train_arrays
    params, state, vel, _ = loop(params, state, vel, 0, jax.random.PRNGKey(9),
                                 x0_tr, y_tr, m_sym, 3)
    for leaf in jax.tree.leaves(params) + jax.tree.leaves(vel):
        assert leaf.dtype == jnp.float32
