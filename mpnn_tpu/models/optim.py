"""Momentum SGD with throughput-adaptive learning rates (TALR).

The reference's `minimize_expectation` (scripts/lib/net_types.py:24-37)
computes gradients once, then rescales each parameter's gradient by its
owning tree node's 1 / sqrt(mean(p_tr^2)) (identity when talr=False), with
router parameters additionally scaled by alpha_rtr, before feeding them to a
TF MomentumOptimizer. Because our params pytree mirrors the tree
({"layer": ..., "router": ..., "sinks": [...]}), that is a structural walk:
each node's "layer" subtree gets scale_l, its "router" subtree
alpha_rtr * scale_l.

Momentum matches tf.train.MomentumOptimizer:
    vel <- mu * vel + grad;  param <- param - lr * vel
with the (possibly TALR-scaled) gradient entering the accumulator, exactly as
apply_gradients on pre-scaled grads does."""

import jax
import jax.numpy as jnp


def talr_scale_grads(net, grads, p_tr_by_uid, alpha_rtr=1.0, talr=True):
    """Rescale a node-structured grads pytree by per-node TALR factors.

    p_tr_by_uid maps str(node._uid) -> that node's (B,) training path
    probability from the same forward pass whose gradients these are (the
    reference uses the same graph's p_tr, scripts/lib/net_types.py:25-27)."""

    def visit(node, g):
        if talr:
            p_tr = p_tr_by_uid[str(node._uid)]
            s = 1.0 / jnp.sqrt(jnp.mean(jnp.square(p_tr)))
        else:
            s = 1.0
        out = {
            "layer": jax.tree.map(lambda a: s * a, g["layer"]),
            "router": jax.tree.map(lambda a: (alpha_rtr * s) * a,
                                   g["router"]),
            "sinks": [visit(snk, gs)
                      for snk, gs in zip(node.sinks, g["sinks"])],
        }
        return out

    return visit(net.root, grads)


def momentum_init(params):
    return jax.tree.map(jnp.zeros_like, params)


def momentum_update(params, vel, grads, lr, mu):
    new_vel = jax.tree.map(lambda v, g: mu * v + g, vel, grads)
    new_params = jax.tree.map(lambda p, v: p - lr * v, params, new_vel)
    return new_params, new_vel
