"""Routing probability propagation: eps-mixture exactness, one-hot eval
paths, leaf-count apportionment (reference scripts/lib/net_types.py:108-131)
and the critic cost-to-go recursion on a hand-computable tree
(reference :232-243)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mpnn_tpu.ops import (Chain, LinTrans, Select, Softmax,
                          CrossEntropyError, NoOp)
from mpnn_tpu.models import ActorNet, CriticNet, n_leaves
from mpnn_tpu.models.net import Ctx
from mpnn_tpu.models.routing import switch_probs


def _tiny_switch_net(net_cls, n_cls=3, **hypers):
    """Root with a router and two LogReg leaves."""
    def leaf(name):
        return Chain(name=name, comps=[
            LinTrans(n_chan=n_cls), Softmax(), CrossEntropyError()])
    rtr = Chain(name="Router", comps=[LinTrans(n_chan=2)])
    root = Chain(name="Root", comps=[LinTrans(n_chan=8)],
                 router=rtr, sinks=[leaf("A"), leaf("B")])
    return net_cls(x0_shape=(4,), y_shape=(n_cls,), root=root, **hypers)


def test_n_leaves():
    net = _tiny_switch_net(ActorNet)
    assert n_leaves(net.root) == 2
    assert [n_leaves(s) for s in net.root.sinks] == [1, 1]


def test_pi_tr_rows_sum_to_one_and_floor():
    """pi_tr rows sum to 1 and each sink keeps at least its eps floor share
    (reference scripts/lib/net_types.py:120-126)."""
    net = _tiny_switch_net(ActorNet)
    node = net.root
    B = 16
    router_x = jnp.asarray(np.random.RandomState(0).randn(B, 2)
                           .astype(np.float32) * 5)
    p_tr = jnp.ones((B,))
    eps = 1e-2
    pi_tr, pi_ev = switch_probs(node, router_x, p_tr, 0.5, eps, 2)
    np.testing.assert_allclose(np.asarray(pi_tr).sum(1), 1.0, rtol=1e-6)
    # eps floor: each sink prob >= eps * n_leaves(sink)/n_leaves(root) = eps/2
    assert np.asarray(pi_tr).min() >= eps / 2 - 1e-7
    # pi_ev is exactly one-hot argmax
    np.testing.assert_array_equal(
        np.asarray(pi_ev),
        np.eye(2)[np.asarray(router_x).argmax(1)])


def test_probabilities_multiply_down_tree():
    """Child p_tr = parent p_tr * pi_tr[:, i]; leaves' p_tr sums to 1."""
    net = _tiny_switch_net(ActorNet)
    B = 8
    x0 = jnp.asarray(np.random.RandomState(1).rand(B, 4).astype(np.float32))
    y = jnp.asarray(np.eye(3, dtype=np.float32)[np.zeros(B, int)])
    params, state = net.init(jax.random.PRNGKey(0))
    ctx = Ctx(train=True, tau=1.0, eps=1e-6, k_cpt=0.0)
    recs, _ = net.forward(params, state, x0, y, ctx)
    from mpnn_tpu.models.routing import propagate
    propagate(net, recs, B, ctx.tau, ctx.eps)
    leaves = list(net.leaves)
    p_sum = sum(np.asarray(recs[l].p_tr) for l in leaves)
    np.testing.assert_allclose(p_sum, 1.0, rtol=1e-5)
    pe_sum = sum(np.asarray(recs[l].p_ev) for l in leaves)
    np.testing.assert_allclose(pe_sum, 1.0)


def test_critic_cost_to_go_two_leaves():
    """Hand-check c_ev / c_opt / c_cre on the 2-leaf switch
    (reference scripts/lib/net_types.py:232-243)."""
    net = _tiny_switch_net(CriticNet, k_cpt=1e-3, k_cre=1.0)
    B = 4
    x0 = jnp.asarray(np.random.RandomState(2).rand(B, 4).astype(np.float32))
    y = jnp.asarray(np.eye(3, dtype=np.float32)[np.zeros(B, int)])
    params, state = net.init(jax.random.PRNGKey(1))
    ctx = Ctx(train=True, tau=0.01, eps=1e-6, k_cpt=net.hypers.k_cpt)
    recs, _ = net.forward(params, state, x0, y, ctx)
    from mpnn_tpu.models.routing import propagate
    propagate(net, recs, B, ctx.tau, ctx.eps)
    net._cost_to_go(recs, ctx)

    leafA, leafB = net.root.sinks
    k = net.hypers.k_cpt
    # Leaves: c_ev = c_err + k_cpt*n_ops (no sinks)
    np.testing.assert_allclose(
        np.asarray(recs[leafA].c_ev),
        np.asarray(recs[leafA].c_err) + k * leafA.n_ops, rtol=1e-5)
    # Root: c_ev = c_err + k*(ops+router ops) + sum_i pi_ev_i * sink_i.c_ev
    root_rec = recs[net.root]
    ops = net.root.n_ops + net.root.router.n_ops
    expect = (np.asarray(root_rec.c_err) + k * ops
              + np.asarray(root_rec.pi_ev[:, 0])
              * np.asarray(recs[leafA].c_ev)
              + np.asarray(root_rec.pi_ev[:, 1])
              * np.asarray(recs[leafB].c_ev))
    np.testing.assert_allclose(np.asarray(root_rec.c_ev), expect, rtol=1e-5)
    # c_opt uses the min over sinks.
    expect_opt = (np.asarray(root_rec.c_err) + k * ops
                  + np.minimum(np.asarray(recs[leafA].c_opt),
                               np.asarray(recs[leafB].c_opt)))
    np.testing.assert_allclose(np.asarray(root_rec.c_opt), expect_opt,
                               rtol=1e-5)
    # c_cre regresses router logits toward -c_ev targets.
    expect_cre = ((np.asarray(root_rec.router_x[:, 0])
                   + np.asarray(recs[leafA].c_ev)) ** 2
                  + (np.asarray(root_rec.router_x[:, 1])
                     + np.asarray(recs[leafB].c_ev)) ** 2)
    np.testing.assert_allclose(np.asarray(root_rec.c_cre), expect_cre,
                               rtol=1e-4)


def test_critic_use_cls_err():
    """use_cls_err swaps c_err for the 0/1 misclassification indicator
    (reference scripts/lib/net_types.py:204-207)."""
    net = _tiny_switch_net(CriticNet, use_cls_err=True, k_cpt=0.0)
    B = 4
    x0 = jnp.asarray(np.random.RandomState(3).rand(B, 4).astype(np.float32))
    y = jnp.asarray(np.eye(3, dtype=np.float32)[np.zeros(B, int)])
    params, state = net.init(jax.random.PRNGKey(1))
    ctx = Ctx(train=True, tau=0.01, eps=1e-6, k_cpt=0.0)
    recs, _ = net.forward(params, state, x0, y, ctx)
    from mpnn_tpu.models.routing import propagate
    propagate(net, recs, B, ctx.tau, ctx.eps)
    net._cost_to_go(recs, ctx)
    leafA = net.root.sinks[0]
    np.testing.assert_allclose(np.asarray(recs[leafA].c_ev),
                               1.0 - np.asarray(recs[leafA].delta_cor),
                               atol=1e-6)


def test_propagate_rejects_nonpositive_eps():
    """eps=0 would let a sharp-tau softmax underflow produce 0/0 = NaN in
    the eps-mixture division; propagate fails loudly instead."""
    net = _tiny_switch_net(ActorNet, k_cpt=0.0)
    B = 2
    x0 = jnp.asarray(np.random.RandomState(0).rand(B, 4).astype(np.float32))
    y = jnp.asarray(np.eye(3, dtype=np.float32)[np.zeros(B, int)])
    params, state = net.init(jax.random.PRNGKey(0))
    ctx = Ctx(train=True, tau=1.0, eps=0.0, k_cpt=0.0)
    recs, _ = net.forward(params, state, x0, y, ctx)
    from mpnn_tpu.models.routing import propagate
    with pytest.raises(ValueError, match="eps"):
        propagate(net, recs, B, ctx.tau, ctx.eps)
