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


def _walk_packed_group(grp, fn, *trees):
    """Walk one stack-plan group's member-stacked subtree(s) over the
    TEMPLATE topology, calling fn(tnode, members, *node_dicts) at each
    template node; fn returns that node's output dict WITHOUT "sinks"
    (this walk fills them by recursing). `members` is the list of each
    member's own node at the current position -- the preorder-cursor
    bookkeeping that must stay aligned with Net._stack_plan's
    "preorders", kept in exactly one place for all packed walks."""
    pres = grp["preorders"]  # [member][preorder j] -> that member's node
    n_mem = len(grp["members"])
    pos = [0]

    def rec(tnode, *ts):
        j = pos[0]
        pos[0] += 1
        members = [pres[mi][j] for mi in range(n_mem)]
        out = fn(tnode, members, *ts)
        out["sinks"] = [rec(snk, *[t["sinks"][i] for t in ts])
                        for i, snk in enumerate(tnode.sinks)]
        return out

    return rec(grp["members"][0], *trees)


def talr_scale_grads(net, grads, p_tr_by_uid, alpha_rtr=1.0, talr=True):
    """Rescale a node-structured grads pytree by per-node TALR factors.

    p_tr_by_uid maps str(node._uid) -> that node's (B,) training path
    probability from the same forward pass whose gradients these are (the
    reference uses the same graph's p_tr, scripts/lib/net_types.py:25-27).

    Also accepts pack_tree's PACKED layout (group members' grads stacked
    with a leading member axis): pruned member slots stay empty dicts and
    each group stack is scaled by a per-template-node (G,) vector of its
    members' factors, broadcast over the param dims."""

    def scale_of(node):
        p_tr = p_tr_by_uid[str(node._uid)]
        return 1.0 / jnp.sqrt(jnp.mean(jnp.square(p_tr)))

    packed = net.is_packed(grads)
    member_ids = net.packed_member_ids() if packed else set()

    def visit(node, g):
        s = scale_of(node) if talr else 1.0
        out = {
            "layer": jax.tree.map(lambda a: s * a, g["layer"]),
            "router": jax.tree.map(lambda a: (alpha_rtr * s) * a,
                                   g["router"]),
            "sinks": [({} if id(snk) in member_ids else visit(snk, gs))
                      for snk, gs in zip(node.sinks, g["sinks"])],
        }
        return out

    if not packed:
        return visit(net.root, grads)

    def gvisit(tnode, members, gg):
        if talr:
            s = jnp.stack([scale_of(m) for m in members])
        else:
            s = jnp.ones((len(members),), jnp.float32)

        def mul(a, extra=1.0):
            return a * (extra * s).reshape(
                (len(members),) + (1,) * (a.ndim - 1))

        return {
            "layer": jax.tree.map(mul, gg["layer"]),
            "router": jax.tree.map(
                lambda a: mul(a, extra=alpha_rtr), gg["router"]),
        }

    out_groups = [_walk_packed_group(g, gvisit, gg)
                  for g, gg in zip(net._stack_plan, grads["groups"])]
    return {"tree": visit(net.root, grads["tree"]), "groups": out_groups}



def tree_l2_decay(net, params, grads, p_tr_by_uid):
    """Analytic weight-L2 (ops.config.analytic_l2): adds each decayed
    weight's closed-form gradient coeff * 2*k_l2 * (w - w_eq) and returns
    (new_grads, loss_value), where coeff is the node's mean p_tr (the
    sg(p_tr) weighting of the c_mod loss term, scripts/lib/
    net_types.py:171-173,277-279) or 1.0 for SR nets. Exactly equal to
    differentiating the in-graph c_mod (tests/test_analytic_l2.py) while
    removing ~one forward reduction per weight tensor.

    Accepts pack_tree's PACKED layout like talr_scale_grads: group stacks
    get a per-template-node (G,) coefficient vector (each member's own
    mean p_tr) broadcast over the param dims, and the loss value sums the
    members' contributions -- exactly what the serial member walk adds."""
    value = jnp.float32(0.0)

    def layer_mod(layer, p, g, coeff, vec_n=None):
        # coeff: scalar, or a (G,) per-member vector when vec_n == G.
        nonlocal value
        if layer.comps:
            out = dict(g)
            out["comps"] = [layer_mod(c, pc, gc, coeff, vec_n)
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
            diff = p[name] - weqa  # weq broadcasts over a leading member axis
            if vec_n is None:
                out[name] = g[name] + coeff * (2.0 * k2) * diff
                value = value + coeff * k2 * jnp.sum(jnp.square(diff))
            else:
                c = coeff.reshape((vec_n,) + (1,) * (diff.ndim - 1))
                out[name] = g[name] + c * (2.0 * k2) * diff
                value = value + k2 * jnp.sum(coeff * jnp.sum(
                    jnp.square(diff),
                    axis=tuple(range(1, diff.ndim))))
        return out

    def coeff_of(node):
        uid = str(node._uid)
        return (jnp.mean(p_tr_by_uid[uid]) if uid in p_tr_by_uid
                else jnp.float32(1.0))

    packed = net.is_packed(grads)
    member_ids = net.packed_member_ids() if packed else set()

    def node_mod(node, p, g):
        coeff = coeff_of(node)
        return {
            "layer": layer_mod(node, p["layer"], g["layer"], coeff),
            "router": (layer_mod(node.router, p["router"], g["router"],
                                 coeff)
                       if node.router is not None else g["router"]),
            "sinks": [({} if id(s) in member_ids else node_mod(s, ps, gs))
                      for s, ps, gs in
                      zip(node.sinks, p["sinks"], g["sinks"])],
        }

    if not packed:
        return node_mod(net.root, params, grads), value

    def gmod(tnode, members, p, g):
        coeff = jnp.stack([coeff_of(m) for m in members])
        n_mem = len(members)
        return {
            "layer": layer_mod(tnode, p["layer"], g["layer"], coeff,
                               vec_n=n_mem),
            "router": (layer_mod(tnode.router, p["router"],
                                 g["router"], coeff, vec_n=n_mem)
                       if tnode.router is not None else g["router"]),
        }

    out_groups = [_walk_packed_group(grp, gmod, gp, gg)
                  for grp, gp, gg in zip(net._stack_plan, params["groups"],
                                         grads["groups"])]
    return ({"tree": node_mod(net.root, params["tree"], grads["tree"]),
             "groups": out_groups}, value)


def momentum_init(params):
    return jax.tree.map(jnp.zeros_like, params)


def momentum_update(params, vel, grads, lr, mu):
    new_vel = jax.tree.map(lambda v, g: mu * v + g, vel, grads)
    new_params = jax.tree.map(lambda p, v: p - lr * v, params, new_vel)
    return new_params, new_vel
