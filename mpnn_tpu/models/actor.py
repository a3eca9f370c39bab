"""Actor networks: stochastic-policy routing trained by policy gradient
(reference ActorNet, scripts/lib/net_types.py:103-181).

Loss terms (reference :167-177):
  c_err = sum_l p_tr * c_err_l          (grad flows through p_tr => REINFORCE)
  c_cpt = sum_l p_tr * k_cpt * (n_ops_l + router_n_ops_l)
  c_mod = sum_l sg(p_tr) * (c_mod_l + router_c_mod_l)
  c_dec = sum_switches sg(p_tr) * k_dec * sum(router_x^2)   (decisiveness)
Trained with TALR-scaled momentum (minimize_expectation,
scripts/lib/net_types.py:24-37).

globopt=True is the "globally optimized" actor variant: the reference's
figure scripts plot an experiment `hybrid-ac-globopt` labeled "Actor
Nets, Regularized Policy" (reference scripts/make-acc-eff-plots:109,
make-pres-figs:128) that the reference registry never defines, so this
is a RECONSTRUCTION, documented as such:
  - no eps-exploration mixture: pi_tr is the bare softmax policy
    (the expected cost is optimized under the policy itself, globally,
    rather than under an eps-smoothed training distribution);
  - the decisiveness term is replaced by an explicit policy entropy
    regularizer c_pol = sum_switches sg(p_tr) * k_pol * sum(pi ln pi)
    (minimizing negative entropy keeps the policy stochastic — the
    "Regularized Policy" of the figure label);
  - requires talr=False: TALR's 1/sqrt(E[p_tr^2]) is only bounded by the
    mixture's eps floor; without it a converged policy drives p_tr -> 0
    on unused subtrees and the scale diverges (construction fails loud)."""

import jax.numpy as jnp
from jax import lax

from .net import Net
from .routed import DynRoutedMixin
from .routing import propagate


class ActorNet(DynRoutedMixin, Net):
    default_hypers = dict(
        Net.default_hypers,
        k_cpt=0.0, k_dec=0.01, ϵ=1e-6, τ=1.0, λ_lrn=1e-3, μ_lrn=0.9,
        dyn_k_cpt=False, α_cpt=1e7, talr=True, α_rtr=1.0,
        globopt=False, k_pol=0.01)

    uses_expectation_optimizer = True

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        if self.hypers.globopt and self.hypers.talr:
            raise ValueError(
                "globopt requires talr=False: without the eps-mixture floor "
                "TALR's 1/sqrt(E[p_tr^2]) scale is unbounded (see ActorNet "
                "docstring)")

    def loss(self, recs, batch_size, ctx):
        h = self.hypers
        propagate(self, recs, batch_size, ctx.tau, ctx.eps,
                  mixture=not h.globopt)
        k_cpt = jnp.asarray(ctx.k_cpt, jnp.float32)

        c_err = sum(recs[l].p_tr * recs[l].c_err for l in self.layers)
        c_cpt = sum(recs[l].p_tr * k_cpt * (l.n_ops + self.router_n_ops(l))
                    for l in self.layers)
        c_mod = sum(lax.stop_gradient(recs[l].p_tr)
                    * (recs[l].c_mod + recs[l].router_c_mod)
                    for l in self.layers)
        if h.globopt:
            # Policy entropy regularizer (negative entropy penalty): at a
            # switch, pi_tr IS the softmax policy (mixture off above).
            # +1e-12 guards pi*ln(pi) where a sharp-tau softmax underflows
            # a row entry to exactly 0 in fp32.
            c_reg = sum(
                lax.stop_gradient(recs[l].p_tr) * h.k_pol
                * jnp.sum(recs[l].pi_tr
                          * jnp.log(recs[l].pi_tr + 1e-12), axis=1)
                for l in self.switches)
        else:
            c_reg = sum(
                lax.stop_gradient(recs[l].p_tr) * h.k_dec
                * jnp.sum(jnp.square(recs[l].router_x), axis=1)
                for l in self.switches)
        return jnp.mean(c_err + c_cpt + c_mod + c_reg
                        + jnp.zeros((batch_size,), jnp.float32))
