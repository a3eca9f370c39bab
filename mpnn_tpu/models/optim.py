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

import numpy as np
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



def tree_l2_decay(net, params, grads, p_tr_by_uid):
    """Analytic weight-L2 (ops.config.analytic_l2): adds each decayed
    weight's closed-form gradient coeff * 2*k_l2 * (w - w_eq) and returns
    (new_grads, loss_value), where coeff is the node's mean p_tr (the
    sg(p_tr) weighting of the c_mod loss term, scripts/lib/
    net_types.py:171-173,277-279) or 1.0 for SR nets. Exactly equal to
    differentiating the in-graph c_mod (tests/test_analytic_l2.py) while
    removing ~one forward reduction per weight tensor."""
    value = jnp.float32(0.0)

    def layer_mod(layer, p, g, coeff):
        nonlocal value
        if layer.comps:
            out = dict(g)
            out["comps"] = [layer_mod(c, pc, gc, coeff)
                            for c, pc, gc in
                            zip(layer.comps, p["comps"], g["comps"])]
            return out
        specs = layer.l2_specs()
        out = dict(g)
        for name, (k2, weq) in specs.items():
            if k2 == 0.0:
                continue
            weqa = (jnp.float32(0.0) if weq is None
                    else jnp.asarray(weq, jnp.float32))
            diff = p[name] - weqa
            out[name] = g[name] + coeff * (2.0 * k2) * diff
            value = value + coeff * k2 * jnp.sum(jnp.square(diff))
        return out

    def node_mod(node, p, g):
        uid = str(node._uid)
        coeff = (jnp.mean(p_tr_by_uid[uid]) if uid in p_tr_by_uid
                 else jnp.float32(1.0))
        return {
            "layer": layer_mod(node, p["layer"], g["layer"], coeff),
            "router": (layer_mod(node.router, p["router"], g["router"],
                                 coeff)
                       if node.router is not None else g["router"]),
            "sinks": [node_mod(s, ps, gs) for s, ps, gs in
                      zip(node.sinks, p["sinks"], g["sinks"])],
        }

    return node_mod(net.root, params, grads), value


def momentum_init(params):
    return jax.tree.map(jnp.zeros_like, params)


def momentum_update(params, vel, grads, lr, mu):
    new_vel = jax.tree.map(lambda v, g: mu * v + g, vel, grads)
    new_params = jax.tree.map(lambda p, v: p - lr * v, params, new_vel)
    return new_params, new_vel
