"""Analytic weight-L2 exactness: with ops.config.analytic_l2, the c_mod
weight penalty moves out of the traced loss into a closed-form gradient
(2*k_l2*(w - w_eq), weighted by mean p_tr exactly as the sg(p_tr)-weighted
loss term would be) plus one fused value reduction. Loss values AND one-step
updated parameters must match the in-graph version to fp tolerance, for both
the flat-buffer loop and the pytree step, SR and actor nets."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpnn_tpu.ops import config
from mpnn_tpu.models import SRNet, ActorNet, Schedules, init_training, \
    make_train_step
from mpnn_tpu.models.steps import make_train_loop

from .test_train_e2e import pyr, rcm, reg


@pytest.fixture
def l2_toggle():
    yield
    config.set_analytic_l2(False)


def _nets(ds):
    sr = SRNet(x0_shape=ds.x0_shape, y_shape=ds.y_shape,
               root=pyr(rcm([8, 8], reg(10))))
    root = pyr(rcm([8, 8, 8], reg(10), rcm([8, 8], reg(10))))
    ac = ActorNet(x0_shape=ds.x0_shape, y_shape=ds.y_shape, root=root,
                  k_cpt=1e-9)
    return sr, ac


def _run_loop(net, ds, n=3):
    params, state, vel = init_training(net, seed=0)
    sched = Schedules(lr=lambda t: 0.02, tau=lambda t: 1.0)
    loop = make_train_loop(net, 16, sched)
    x0_tr, y_tr, m_sym = ds.train_arrays
    params, state, vel, cs = loop(params, state, vel, 0,
                                  jax.random.PRNGKey(4), x0_tr, y_tr,
                                  m_sym, n)
    return np.asarray(cs), jax.tree.leaves(params)


def _run_step(net, ds):
    params, state, vel = init_training(net, seed=0)
    sched = Schedules(lr=lambda t: 0.02, tau=lambda t: 1.0)
    step = make_train_step(net, 16, sched)
    x0_tr, y_tr, m_sym = ds.train_arrays
    params, state, vel, c = step(params, state, vel, 0,
                                 jax.random.PRNGKey(4), x0_tr, y_tr, m_sym)
    return float(c), jax.tree.leaves(params)


@pytest.mark.parametrize("which", ["sr", "ac"])
@pytest.mark.parametrize("runner", [_run_loop, _run_step])
def test_analytic_l2_exact(synth_dataset, l2_toggle, which, runner):
    sr, ac = _nets(synth_dataset)
    net = sr if which == "sr" else ac

    config.set_analytic_l2(False)
    cs_ref, leaves_ref = runner(net, synth_dataset)
    config.set_analytic_l2(True)
    cs_new, leaves_new = runner(net, synth_dataset)

    np.testing.assert_allclose(cs_new, cs_ref, rtol=2e-6, atol=1e-7)
    for a, b in zip(leaves_new, leaves_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)
