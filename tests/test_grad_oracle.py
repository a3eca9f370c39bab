"""Gradient-level repo-vs-oracle parity: stop_gradient placement.

The AC/CR losses' correctness hinges on WHICH factors carry gradients
(reference net_types.py:167-177, 275-280; SURVEY.md 'hard parts'). Value
comparisons cannot see sg placement, so these tests check the repo's
actual jax.grad against central finite differences of the oracle's
sg-explicit losses (reference_oracle.actor_loss_sg / critic_loss_sg):
quantities the reference wraps in stop_gradient are held at the
unperturbed parameters while everything else moves.

A directional derivative along a random direction d is compared:
  oracle:  [L(theta + eps*d; frozen=theta) - L(theta - eps*d; frozen=theta)] / 2eps
  repo:    <jax.grad L(theta), d>
Agreement to ~1e-3 relative pins every sg boundary; moving any sg (e.g.
letting gradient flow into the critic targets or the c_mod p_tr weights)
breaks it."""

import numpy as np
import jax
import jax.numpy as jnp

from mpnn_tpu.models import ActorNet, CriticNet, Ctx

from mpnn_tpu import oracle
from .test_reference_oracle import _two_switch_tree, _data, _np_tree, B

TAU, EPS_RTE, K_CPT = 0.8, 0.05, 3e-9
FD_EPS = 1e-6


def _perturb(tree, d, eps):
    return jax.tree.map(lambda a, b: a + eps * b, tree, d)


def _direction(tree, seed):
    r = np.random.RandomState(seed)
    return jax.tree.map(
        lambda a: np.float64(r.randn(*np.shape(a))), tree)


def _oracle_infos(net, params_np, state_np, x0, y, k_cpt):
    infos = oracle.net_forward(net, params_np, state_np, np.float64(x0),
                               np.float64(y), True)
    oracle.route(net.root, infos, eps=EPS_RTE, tau=TAU)
    return infos


def _repo_grad_dot(net, params, state, x0, y, d):
    ctx = Ctx(train=True, rng=None, tau=TAU, eps=EPS_RTE, k_cpt=K_CPT)

    def loss_fn(p):
        recs, _ = net.forward(p, jax.tree.map(jnp.asarray, state),
                              jnp.asarray(x0), jnp.asarray(y), ctx)
        return net.loss(recs, B, ctx)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    dot = sum(float(jnp.sum(jnp.asarray(gd, jnp.float64) * jnp.asarray(dd)))
              for gd, dd in zip(jax.tree.leaves(grads), jax.tree.leaves(d)))
    return float(loss), dot


def _fd_directional(net, params_np, state_np, x0, y, d, loss_sg):
    frozen = _oracle_infos(net, params_np, state_np, x0, y, K_CPT)
    lo = loss_sg(_oracle_infos(net, _perturb(params_np, d, -FD_EPS),
                               state_np, x0, y, K_CPT), frozen)
    hi = loss_sg(_oracle_infos(net, _perturb(params_np, d, +FD_EPS),
                               state_np, x0, y, K_CPT), frozen)
    return (hi - lo) / (2 * FD_EPS)


def test_actor_grad_matches_oracle_fd():
    net = _two_switch_tree(ActorNet, k_cpt=K_CPT, k_dec=0.02, τ=TAU,
                           ϵ=EPS_RTE)
    params, state = net.init(jax.random.PRNGKey(4))
    x0, y = _data(4)
    params_np, state_np = _np_tree(params), _np_tree(state)
    d = _direction(params, 11)

    fd = _fd_directional(
        net, params_np, state_np, x0, y, d,
        lambda live, frozen: oracle.actor_loss_sg(net, live, frozen,
                                                  K_CPT, 0.02))
    _, dot = _repo_grad_dot(net, params, state, x0, y, d)
    assert np.isclose(dot, fd, rtol=2e-3, atol=1e-7), (dot, fd)
    # Sanity: sg placement is load-bearing — the NAIVE (no-sg) FD differs
    # from the sg FD by far more than the sg FD differs from the repo
    # gradient (i.e. the agreement above is not insensitive to sg).
    fd_naive = _fd_directional(
        net, params_np, state_np, x0, y, d,
        lambda live, frozen: oracle.actor_loss(net, live, K_CPT, 0.02)[0])
    assert abs(fd_naive - fd) > 10 * abs(fd - dot), (fd_naive, fd, dot)


def test_critic_grad_matches_oracle_fd():
    net = _two_switch_tree(CriticNet, k_cpt=K_CPT, k_cre=1e-2, τ=TAU,
                           ϵ=EPS_RTE)
    params, state = net.init(jax.random.PRNGKey(5))
    x0, y = _data(5)
    params_np, state_np = _np_tree(params), _np_tree(state)
    d = _direction(params, 12)

    fd = _fd_directional(
        net, params_np, state_np, x0, y, d,
        lambda live, frozen: oracle.critic_loss_sg(
            net, live, frozen, K_CPT, 1e-2, False, False))
    _, dot = _repo_grad_dot(net, params, state, x0, y, d)
    assert np.isclose(dot, fd, rtol=2e-3, atol=1e-7), (dot, fd)
    # The critic's whole training signal lives in c_cre's sg targets; the
    # no-sg FD (gradient flowing into targets) must disagree by far more
    # than the sg FD's own error vs the repo gradient.
    fd_naive = _fd_directional(
        net, params_np, state_np, x0, y, d,
        lambda live, frozen: oracle.critic_loss(net, live, K_CPT, 1e-2,
                                                False, False)[0])
    assert abs(fd_naive - fd) > 10 * abs(fd - dot), (fd_naive, fd, dot)
