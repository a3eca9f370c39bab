"""The globopt ("Actor Nets, Regularized Policy") actor variant.

The reference's figure scripts plot `hybrid-ac-globopt`
(scripts/make-acc-eff-plots:109, make-pres-figs:128) but its registry
never defines the experiment; mpnn_tpu reconstructs it (see
models/actor.py docstring): bare-softmax routing (no eps mixture),
policy entropy regularizer instead of the decisiveness term, talr=False.
These tests pin the reconstruction to the float64 oracle the same way
the standard actor is pinned."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mpnn_tpu.ops.layers import (Chain, Conv, LinTrans, Rect, Softmax,
                                 BatchNorm, CrossEntropyError)
from mpnn_tpu.models import ActorNet, Ctx
from mpnn_tpu import oracle
from mpnn_tpu.paritycheck import check_grad_parity

B, H, W, C, NCLS = 6, 8, 8, 3, 4
RTOL = 2e-5
ATOL = 1e-5

HYPERS = dict(k_cpt=3e-9, k_pol=0.02, τ=0.7, globopt=True, talr=False)


def _reg(n_cls=NCLS):
    return Chain(comps=[LinTrans(n_chan=n_cls, k_l2=1e-4, σ_w=1.5),
                        Softmax(), CrossEntropyError()])


def _router(n_sinks):
    return Chain(comps=[LinTrans(n_chan=8, k_l2=1e-4), BatchNorm(), Rect(),
                        LinTrans(n_chan=n_sinks, k_l2=1e-4, σ_w=0.5)])


def _body():
    return [Conv(n_chan=C, supp=3, k_l2=1e-4, res=True), BatchNorm(), Rect()]


def _two_switch_tree(net_cls, **hypers):
    """Same two-switch/three-leaf fixture as test_reference_oracle.py."""
    inner = Chain(comps=_body(), router=_router(2),
                  sinks=[_reg(), _reg()])
    root = Chain(comps=_body(), router=_router(2),
                 sinks=[_reg(), inner])
    return net_cls(root=root, x0_shape=(H, W, C), y_shape=(NCLS,), **hypers)


def _data(seed=0):
    r = np.random.RandomState(seed)
    x0 = r.rand(B, H, W, C).astype(np.float32)
    y = np.eye(NCLS, dtype=np.float32)[r.randint(0, NCLS, B)]
    return x0, y


def _np_tree(t):
    return jax.tree.map(lambda a: np.asarray(a, np.float64), t)


def _run_repo(net, train, tau=0.7, eps=0.05, k_cpt=3e-9, seed=0):
    params, state = net.init(jax.random.PRNGKey(seed))
    x0, y = _data()
    ctx = Ctx(train=train, rng=None, tau=tau, eps=eps, k_cpt=k_cpt)
    recs, _ = net.forward(params, jax.tree.map(jnp.asarray, state),
                          jnp.asarray(x0), jnp.asarray(y), ctx)
    loss = net.loss(recs, B, ctx)
    return params, state, x0, y, recs, float(loss)


def test_globopt_requires_notalr():
    with pytest.raises(ValueError, match="talr"):
        _two_switch_tree(ActorNet, globopt=True, talr=True)
    # And the reference default (talr on) is also rejected when only
    # globopt is given.
    with pytest.raises(ValueError, match="talr"):
        _two_switch_tree(ActorNet, globopt=True)


def test_globopt_route_is_bare_softmax():
    net = _two_switch_tree(ActorNet, **HYPERS)
    params, state, x0, y, recs, loss = _run_repo(net, train=True, tau=0.7,
                                                 eps=0.05)
    for l in net.switches:
        rx = np.asarray(recs[l].router_x, np.float64)
        z = rx / 0.7
        soft = np.exp(z - z.max(1, keepdims=True))
        soft /= soft.sum(1, keepdims=True)
        np.testing.assert_allclose(np.asarray(recs[l].pi_tr), soft,
                                   rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(
            np.asarray(recs[l].pi_tr).sum(1), 1.0, rtol=1e-6)


@pytest.mark.parametrize("train", [False, True])
def test_globopt_matches_oracle(train):
    net = _two_switch_tree(ActorNet, **HYPERS)
    params, state, x0, y, recs, loss = _run_repo(net, train, tau=0.7,
                                                 eps=0.05)

    infos = oracle.net_forward(net, _np_tree(params), _np_tree(state),
                               np.float64(x0), np.float64(y), train)
    oracle.route(net.root, infos, eps=0.05, tau=0.7, mixture=False)
    o_loss, parts = oracle.actor_loss(net, infos, k_cpt=3e-9, k_dec=0.01,
                                      globopt=True, k_pol=0.02)

    for l in net.layers:
        np.testing.assert_allclose(np.asarray(recs[l].p_tr), infos[l].p_tr,
                                   rtol=RTOL, atol=ATOL, err_msg=l.name)
        np.testing.assert_allclose(np.asarray(recs[l].p_ev), infos[l].p_ev,
                                   rtol=RTOL, atol=ATOL, err_msg=l.name)
    assert np.isclose(loss, o_loss, rtol=RTOL), (loss, o_loss)
    # The entropy regularizer is active and negative (pi ln pi < 0).
    assert np.all(parts["c_dec"] < 0)


def test_globopt_grad_parity():
    """Training-gradient parity through the sg boundaries: gradient must
    flow through BOTH factors of the entropy term (pi and ln pi) but not
    through its sg(p_tr) weight."""
    net = _two_switch_tree(ActorNet, **HYPERS)
    params, state = net.init(jax.random.PRNGKey(0))
    x0, y = _data()
    rep = check_grad_parity(net, params, state, x0, y, tau=0.7, eps=0.05)
    assert rep["ok"], rep


def test_globopt_registry_and_sweep_step():
    """hybrid-ac-globopt / synth-ac-globopt exist, construct, and train a
    step; the built net carries globopt=True, talr=False."""
    from mpnn_tpu.experiments import make_experiments
    from mpnn_tpu.models import steps

    e = make_experiments()
    assert "hybrid-ac-globopt" in e and "synth-ac-globopt" in e
    expt = e["synth-ac-globopt"]
    assert expt.sweep_k_cpts is not None

    net = expt.nets[3]((8, 8, 3), (4,))
    assert net.hypers.globopt and not net.hypers.talr

    params, state = net.init(jax.random.PRNGKey(1))
    vel = jax.tree.map(jnp.zeros_like, params)
    r = np.random.RandomState(0)
    x0_tr = jnp.asarray(r.rand(32, 8, 8, 3), jnp.float32)
    y_tr = jnp.asarray(np.eye(4, dtype=np.float32)[r.randint(0, 4, 32)])
    m_sym = jnp.zeros((4,), jnp.float32)
    sch = steps.Schedules(lr=lambda t: 1e-2, tau=expt.tau)
    step = steps.make_train_step(net, batch_size=8, schedules=sch)
    leaves0 = [np.asarray(a) for a in jax.tree.leaves(params)]
    new_params, _, _, loss = step(params, state, vel, 0,
                                  jax.random.PRNGKey(2),
                                  x0_tr, y_tr, m_sym, jnp.float32(1e-9))
    assert np.isfinite(float(loss))
    leaves1 = jax.tree.leaves(new_params)
    assert any(not np.allclose(a, np.asarray(b))
               for a, b in zip(leaves0, leaves1))
