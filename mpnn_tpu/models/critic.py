"""Critic networks: value-estimation routing
(reference CriticNet, scripts/lib/net_types.py:187-284).

Router logits regress toward the NEGATIVE downstream cost-to-go, so the
argmax routes each example down its cheapest-best path. Per-node, post-order
(reference :232-243):

  c_ev  = c_err' + k_cpt * ops + sum_i pi_ev[:, i] * sink_i.c_ev
  c_opt = c_err' + k_cpt * ops + min_i sink_i.c_opt        (optimistic)
  c_cre = k_cre * sum_i (router_x[:, i] + sg(target_i))^2  (switches only)

where c_err' is the per-example error cost, or the 0/1 misclassification
indicator when use_cls_err (reference :204-207, :219-222), ops includes the
router's op count only at switches (reference :233, :245), and
target = c_opt if optimistic else c_ev.

Total loss: all of c_err, c_cre, c_mod weighted by sg(p_tr) -- no policy
gradient term (reference :275-280)."""

from functools import reduce

import jax.numpy as jnp
from jax import lax

from .net import Net
from .routed import DynRoutedMixin
from .routing import propagate


class CriticNet(DynRoutedMixin, Net):
    default_hypers = dict(
        Net.default_hypers,
        k_cpt=0.0, k_cre=1e-3, ϵ=1e-6, τ=0.01, optimistic=False,
        dyn_k_cpt=False, α_cpt=1e7, use_cls_err=False, λ_lrn=1e-3, μ_lrn=0.9,
        talr=True, α_rtr=1.0)

    uses_expectation_optimizer = True

    def _cost_to_go(self, recs, ctx):
        """Post-order c_ev / c_opt / c_cre computation."""
        h = self.hypers
        k_cpt = jnp.asarray(ctx.k_cpt, jnp.float32)

        def visit(node):
            for s in node.sinks:
                visit(s)
            rec = recs[node]
            if h.use_cls_err:
                # Layers without a correctness indicator contribute 0
                # (reference getattr(l, 'delta_cor', 1) => 1 - 1).
                c_err = (1.0 - rec.delta_cor) if rec.delta_cor is not None \
                    else 0.0
            else:
                c_err = rec.c_err
            if len(node.sinks) < 2:
                rec.c_ev = (c_err + k_cpt * node.n_ops
                            + sum(recs[s].c_ev for s in node.sinks))
                rec.c_opt = (c_err + k_cpt * node.n_ops
                             + sum(recs[s].c_opt for s in node.sinks))
                rec.c_cre = 0.0
            else:
                ops = node.n_ops + node.router.n_ops
                rec.c_ev = (c_err + k_cpt * ops
                            + sum(rec.pi_ev[:, i] * recs[s].c_ev
                                  for i, s in enumerate(node.sinks)))
                rec.c_opt = (c_err + k_cpt * ops
                             + reduce(jnp.minimum,
                                      (recs[s].c_opt for s in node.sinks)))
                rec.c_cre = h.k_cre * sum(
                    jnp.square(rec.router_x[:, i] + lax.stop_gradient(
                        recs[s].c_opt if h.optimistic else recs[s].c_ev))
                    for i, s in enumerate(node.sinks))

        visit(self.root)
        return recs

    def loss(self, recs, batch_size, ctx):
        propagate(self, recs, batch_size, ctx.tau, ctx.eps)
        self._cost_to_go(recs, ctx)
        c_err = sum(lax.stop_gradient(recs[l].p_tr) * recs[l].c_err
                    for l in self.layers)
        c_cre = sum(lax.stop_gradient(recs[l].p_tr) * recs[l].c_cre
                    for l in self.layers)
        c_mod = sum(lax.stop_gradient(recs[l].p_tr)
                    * (recs[l].c_mod + recs[l].router_c_mod)
                    for l in self.layers)
        return jnp.mean(c_err + c_cre + c_mod
                        + jnp.zeros((batch_size,), jnp.float32))
