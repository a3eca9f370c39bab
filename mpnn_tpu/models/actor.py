"""Actor networks: stochastic-policy routing trained by policy gradient
(reference ActorNet, scripts/lib/net_types.py:103-181).

Loss terms (reference :167-177):
  c_err = sum_l p_tr * c_err_l          (grad flows through p_tr => REINFORCE)
  c_cpt = sum_l p_tr * k_cpt * (n_ops_l + router_n_ops_l)
  c_mod = sum_l sg(p_tr) * (c_mod_l + router_c_mod_l)
  c_dec = sum_switches sg(p_tr) * k_dec * sum(router_x^2)   (decisiveness)
Trained with TALR-scaled momentum (minimize_expectation,
scripts/lib/net_types.py:24-37)."""

import jax.numpy as jnp
from jax import lax

from .net import Net
from .routed import DynRoutedMixin
from .routing import propagate


class ActorNet(DynRoutedMixin, Net):
    default_hypers = dict(
        Net.default_hypers,
        k_cpt=0.0, k_dec=0.01, ϵ=1e-6, τ=1.0, λ_lrn=1e-3, μ_lrn=0.9,
        dyn_k_cpt=False, α_cpt=1e7, talr=True, α_rtr=1.0)

    uses_expectation_optimizer = True

    def loss(self, recs, batch_size, ctx):
        propagate(self, recs, batch_size, ctx.tau, ctx.eps)
        h = self.hypers
        k_cpt = jnp.asarray(ctx.k_cpt, jnp.float32)

        c_err = sum(recs[l].p_tr * recs[l].c_err for l in self.layers)
        c_cpt = sum(recs[l].p_tr * k_cpt * (l.n_ops + self.router_n_ops(l))
                    for l in self.layers)
        c_mod = sum(lax.stop_gradient(recs[l].p_tr)
                    * (recs[l].c_mod + recs[l].router_c_mod)
                    for l in self.layers)
        c_dec = sum(lax.stop_gradient(recs[l].p_tr)
                    * h.k_dec * jnp.sum(jnp.square(recs[l].router_x), axis=1)
                    for l in self.switches)
        return jnp.mean(c_err + c_cpt + c_mod + c_dec
                        + jnp.zeros((batch_size,), jnp.float32))
