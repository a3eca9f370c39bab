"""Shared machinery for dynamically-routed nets (actor + critic).

Covers the dyn_k_cpt cost-of-compute router feature: when enabled, each
router sees its layer's activations flattened per scale with an extra column
alpha_cpt * k_cpt appended, making the per-example compute price an input the
routing policy can condition on (reference scripts/lib/net_types.py:146-164
and :245-266)."""

import numpy as np
import jax.numpy as jnp


def _prod(shape):
    return int(np.prod(shape)) if len(shape) else 1


class DynRoutedMixin:
    """Mixin for Net subclasses with routers and optional dyn_k_cpt."""

    def route_for_stats(self, recs, batch_size, ctx):
        """Fill p_tr/p_ev on every Rec for the stats pass (shared by actor
        and critic nets; the loss paths call propagate themselves). A
        globopt actor routes by the bare softmax policy in stats too."""
        from .routing import propagate
        return propagate(self, recs, batch_size, ctx.tau, ctx.eps,
                         mixture=not getattr(self.hypers, "globopt", False))

    def _router_in_shape(self, node):
        if not self.hypers.dyn_k_cpt:
            return node.out_shape
        shp = node.out_shape
        if isinstance(shp, list):
            return [(_prod(s) + 1,) for s in shp]
        return (_prod(shp) + 1,)

    def _router_input(self, x, ctx):
        if not self.hypers.dyn_k_cpt:
            return x

        def cat(xi):
            flat = xi.reshape((xi.shape[0], -1))
            k = jnp.asarray(ctx.k_cpt, jnp.float32)
            kcol = (self.hypers.α_cpt * k).reshape(-1, 1) \
                * jnp.ones((xi.shape[0], 1), jnp.float32)
            return jnp.concatenate([flat, kcol.astype(flat.dtype)], axis=1)

        return [cat(xi) for xi in x] if isinstance(x, list) else cat(x)

    def router_n_ops(self, node):
        return node.router.n_ops if node.router is not None else 0.0
