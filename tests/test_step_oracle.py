"""FULL-train-step repo-vs-oracle composition parity.

The per-piece oracle tests pin forward values (test_reference_oracle),
gradient/stop-gradient placement (test_grad_oracle), TALR scale factors,
and the analytic-L2 grads (test_analytic_l2) -- but not the STEP's
composition of them: grads(total loss) -> [+ analytic-L2 grads] -> TALR
scaling -> momentum(lr(t)) with the schedules indexed at the step's own t
(reference scripts/train-nets:137-143 feeds lambda_lrn(t)/tau(t) each
iteration; scripts/lib/net_types.py:24-37 scales the total-cost grads).

These tests run ONE compiled train step (identity augmentation: r_shift=0,
m_sym=0) from zero momentum, where

    new_vel    == (params - new_params) / lr(t)          (elementwise)
    new_params == params - lr(t) * S (g_loss [+ g_L2])   so, directionally,
    <params - new_params, d> / lr(t) == FD_{S d}[ L_sg ]

using <S g, d> = <g, S d> (TALR's S is diagonal) with the finite
difference taken on the oracle's sg-explicit loss in float64 along the
TALR-scaled direction. A wrong lr/tau index (t+-1), a mis-ordered
L2-vs-TALR composition, or a broken momentum wiring each shifts the
directional value far beyond the tolerance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mpnn_tpu.models import ActorNet, CriticNet, SRNet
from mpnn_tpu.models.steps import Schedules, _train_step_body
from mpnn_tpu.models.optim import momentum_init
from mpnn_tpu.ops import config as ops_config
from mpnn_tpu.ops.layers import (Chain, LinTrans, Softmax,
                                 CrossEntropyError)

from mpnn_tpu import oracle
from .test_reference_oracle import (_two_switch_tree, _body, _data,
                                    _np_tree, B, H, W, C, NCLS)
from .test_grad_oracle import _perturb, _direction

T0 = 3
TAU0, EPS_RTE, K_CPT, K_DEC, K_CRE = 0.8, 0.05, 3e-9, 0.02, 1e-2
ALPHA_RTR = 0.3
FD_EPS = 1e-6


def _lr(t):
    return 0.01 / (1.0 + t)


def _tau(t):
    return TAU0 / (1.0 + 0.1 * t)


def _oracle_infos(net, params_np, state_np, x0, y, tau):
    infos = oracle.net_forward(net, params_np, state_np, np.float64(x0),
                               np.float64(y), True)
    if list(net.switches):
        oracle.route(net.root, infos, eps=EPS_RTE, tau=tau)
    return infos


def _scaled_direction(net, d, infos, talr):
    """S d for TALR's diagonal per-node scaling (layer s, router
    alpha_rtr*s), computed from the ORACLE's scale factors."""
    scales = oracle.talr_scales(net, infos, ALPHA_RTR, talr=talr)

    def walk(node, dd):
        s_layer, s_router = scales[node]
        return {
            "layer": jax.tree.map(lambda a: s_layer * a, dd["layer"]),
            "router": jax.tree.map(lambda a: s_router * a, dd["router"]),
            "sinks": [walk(s, ds)
                      for s, ds in zip(node.sinks, dd["sinks"])],
        }

    return walk(net.root, d)


def _fd_directional(net, params_np, state_np, x0, y, d, loss_sg, tau):
    frozen = _oracle_infos(net, params_np, state_np, x0, y, tau)
    lo = loss_sg(_oracle_infos(net, _perturb(params_np, d, -FD_EPS),
                               state_np, x0, y, tau), frozen)
    hi = loss_sg(_oracle_infos(net, _perturb(params_np, d, +FD_EPS),
                               state_np, x0, y, tau), frozen)
    return (hi - lo) / (2 * FD_EPS), frozen


def _run_one_step(net, params, state, analytic_l2):
    vel = momentum_init(params)
    sch = Schedules(lr=_lr, tau=_tau)
    step = _train_step_body(net, B, sch, r_shift=0, mesh=None,
                            presampled=True)
    x0, y = _data(9)
    m_sym = np.zeros(NCLS, np.float32)  # no flips
    old = ops_config.analytic_l2
    ops_config.set_analytic_l2(analytic_l2)
    try:
        new_params, _, new_vel, c_tot = jax.jit(step)(
            params, state, vel, T0, jax.random.PRNGKey(99),
            jnp.asarray(x0), jnp.asarray(y), jnp.asarray(m_sym))
    finally:
        ops_config.set_analytic_l2(old)
    return (x0, y, jax.tree.map(np.asarray, new_params),
            jax.tree.map(np.asarray, new_vel), float(c_tot))


def _check_step(net, loss_sg, loss_value, talr, analytic_l2, seed=9):
    params, state = net.init(jax.random.PRNGKey(seed))
    x0, y, new_params, new_vel, c_tot = _run_one_step(
        net, params, state, analytic_l2)
    params_np, state_np = _np_tree(params), _np_tree(state)
    lr = _lr(T0)

    # Momentum wiring from vel0=0: vel' = g_scaled, params' = p - lr vel'.
    for p0, p1, v1 in zip(jax.tree.leaves(params),
                          jax.tree.leaves(new_params),
                          jax.tree.leaves(new_vel)):
        np.testing.assert_allclose(np.float64(p0) - np.float64(p1),
                                   lr * np.float64(v1),
                                   rtol=1e-5, atol=5e-7)

    # Directional parity of the whole update against the oracle.
    d = _direction(params, 21)
    frozen = _oracle_infos(net, params_np, state_np, x0, y, _tau(T0))
    sd = (_scaled_direction(net, d, frozen, talr)
          if net.uses_expectation_optimizer else d)
    fd, frozen = _fd_directional(net, params_np, state_np, x0, y, sd,
                                 loss_sg, _tau(T0))
    delta_dot = sum(
        float(np.sum((np.float64(p0) - np.float64(p1)) * np.float64(dd)))
        for p0, p1, dd in zip(jax.tree.leaves(params),
                              jax.tree.leaves(new_params),
                              jax.tree.leaves(d))) / lr
    assert np.isclose(delta_dot, fd, rtol=2e-3, atol=1e-7), (delta_dot, fd)

    # The step's reported loss is the oracle's FULL loss (with analytic_l2
    # the in-graph c_mod is zero and tree_l2_decay adds the same value).
    assert np.isclose(c_tot, loss_value(frozen), rtol=2e-4), (
        c_tot, loss_value(frozen))


@pytest.mark.parametrize("analytic_l2", [False, True])
def test_actor_full_step_matches_oracle(analytic_l2):
    net = _two_switch_tree(ActorNet, k_cpt=K_CPT, k_dec=K_DEC, τ=TAU0,
                           ϵ=EPS_RTE, α_rtr=ALPHA_RTR)
    _check_step(
        net,
        loss_sg=lambda live, frozen: oracle.actor_loss_sg(
            net, live, frozen, K_CPT, K_DEC),
        loss_value=lambda infos: oracle.actor_loss(
            net, infos, K_CPT, K_DEC)[0],
        talr=True, analytic_l2=analytic_l2)


def test_critic_full_step_matches_oracle():
    net = _two_switch_tree(CriticNet, k_cpt=K_CPT, k_cre=K_CRE, τ=TAU0,
                           ϵ=EPS_RTE, α_rtr=ALPHA_RTR)
    _check_step(
        net,
        loss_sg=lambda live, frozen: oracle.critic_loss_sg(
            net, live, frozen, K_CPT, K_CRE, False, False),
        loss_value=lambda infos: oracle.critic_loss(
            net, infos, K_CPT, K_CRE, False, False)[0],
        talr=True, analytic_l2=False)


def test_sr_full_step_matches_oracle():
    body = Chain(comps=_body() + [LinTrans(n_chan=NCLS, k_l2=1e-4),
                                  Softmax(), CrossEntropyError()])
    net = SRNet(root=body, x0_shape=(H, W, C), y_shape=(NCLS,))
    _check_step(
        net,
        loss_sg=lambda live, frozen: oracle.sr_loss(net, live),
        loss_value=lambda infos: oracle.sr_loss(net, infos),
        talr=False, analytic_l2=False)
