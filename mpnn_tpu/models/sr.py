"""Statically-routed networks (reference SRNet, scripts/lib/net_types.py:85-97).

Every layer executes with p_ev = 1; the loss is the dataset mean of the
summed per-layer error + regularization costs, trained with plain momentum
SGD (no TALR)."""

import jax.numpy as jnp

from .net import Net


class SRNet(Net):
    default_hypers = dict(Net.default_hypers, λ_lrn=1e-3, μ_lrn=0.9)

    uses_expectation_optimizer = False

    def route_for_stats(self, recs, batch_size, ctx):
        ones = jnp.ones((batch_size,), jnp.float32)
        for l in self.layers:
            recs[l].p_ev = ones
        return recs

    def loss(self, recs, batch_size, ctx):
        self.route_for_stats(recs, batch_size, ctx)
        c_tot = jnp.mean(sum(recs[l].c_err + recs[l].c_mod
                             for l in self.layers)
                         + jnp.zeros((batch_size,), jnp.float32))
        return c_tot
