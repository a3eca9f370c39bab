"""Routing probability propagation shared by actor and critic nets.

Implements the reference's `_route` machinery
(scripts/lib/net_types.py:108-131 and :216-231) as a pure top-down walk over
the static tree:

- training path probability per switch:
      pi_tr = (1 - eps_l / p_tr) * softmax(router_x / tau) + eps_sinks / p_tr
  where eps_l = eps * n_leaves(l) / n_leaves(root) apportions the exploration
  floor by leaf count (scripts/lib/net_types.py:120-126); rows sum to 1 and
  every sink keeps probability >= its eps floor.
- eval path: hard one-hot argmax of router logits
  (scripts/lib/net_types.py:127-129).
- probabilities multiply down the tree (scripts/lib/net_types.py:130-131).

This is masked dense execution: probabilities only reweight losses and
statistics -- all paths always run (SURVEY.md section 3.2)."""

import jax
import jax.numpy as jnp

from .net import n_leaves


def switch_probs(node, router_x, p_tr, tau, eps, n_leaves_root,
                 mixture=True):
    """(pi_tr, pi_ev) for a switch node, each (B, n_sinks).

    mixture=False drops the eps-exploration mixture: pi_tr is the bare
    softmax policy (the `globopt` actor variant — the training
    distribution IS the policy; exploration is maintained by the
    entropy regularizer in the loss instead of by forced mixing)."""
    soft = jax.nn.softmax(router_x / tau, axis=1)
    if mixture:
        eps_node = eps * n_leaves(node) / n_leaves_root
        eps_sinks = jnp.asarray(
            [n_leaves(s) / n_leaves_root for s in node.sinks],
            jnp.float32) * eps
        pi_tr = ((1.0 - eps_node / p_tr[:, None]) * soft
                 + eps_sinks[None, :] / p_tr[:, None])
    else:
        pi_tr = soft
    pi_ev = jax.nn.one_hot(jnp.argmax(router_x, axis=1), len(node.sinks),
                           dtype=jnp.float32)
    return pi_tr, pi_ev


def propagate(net, recs, batch_size, tau, eps, mixture=True):
    """Fill p_tr / p_ev (and pi_tr / pi_ev at switches) on every node's Rec.

    Root starts at probability 1 (reference scripts/lib/net_types.py:166).
    With mixture=False (globopt actor nets) the eps floor is unused: pi_tr
    is the bare softmax, so no division by the running p_tr occurs and
    eps may be anything.
    """
    if mixture and not eps > 0:
        # The eps-mixture divides by the running p_tr, whose positive floor
        # is eps * n_leaves(sink)/n_leaves(root); with eps=0 a sharp-tau
        # softmax underflow makes that 0/0 = NaN with no error. Fail loudly
        # instead (eps is a static hyper, so this costs nothing traced).
        raise ValueError("routing eps must be > 0 (got %r)" % (eps,))
    ones = jnp.ones((batch_size,), jnp.float32)

    def visit(node, p_tr, p_ev):
        rec = recs[node]
        rec.p_tr, rec.p_ev = p_tr, p_ev
        if len(node.sinks) < 2:
            for s in node.sinks:
                visit(s, p_tr, p_ev)
        else:
            pi_tr, pi_ev = switch_probs(
                node, rec.router_x, p_tr, tau, eps, net._n_leaves_root,
                mixture=mixture)
            rec.pi_tr, rec.pi_ev = pi_tr, pi_ev
            for i, s in enumerate(node.sinks):
                visit(s, p_tr * pi_tr[:, i], p_ev * pi_ev[:, i])

    visit(net.root, ones, ones)
    return recs
