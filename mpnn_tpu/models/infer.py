"""Routed sparse inference: actually skip the compute the router skips.

The reference executes every branch for every example even at eval time --
hard routing only masks the statistics, and `moc` is an accounting metric,
not a measured saving (SURVEY.md section 3.2; reference
scripts/lib/net_types.py:127-129, scripts/train-nets:120). This engine
realizes the savings on TPU with fully static shapes, using the
capacity-factor idea from MoE systems:

- examples flow down the chain in a fixed-capacity "active" buffer;
- after each stage, the router's argmax decides exit-vs-continue
  (identical to the dense pi_ev rule);
- continuing examples are compacted to the front (stable argsort) and the
  next stage processes only a statically-sized prefix (capacity);
- if more examples want to continue than the capacity allows, the overflow
  is force-exited at the current early-exit head (the standard capacity
  trade-off; capacities=1.0 reproduces dense hard routing exactly);
- exited examples' class probabilities, exit depth and realized op count
  are scattered to their original batch rows (out-of-range sentinel rows
  drop, so no masking bookkeeping).

Works for chain-topology nets (every switch = [early-exit leaf, continue]),
the reference's main experiment family. Tree nets fall back to dense
evaluation."""

import numpy as np
import jax
import jax.numpy as jnp

from .net import Ctx


def chain_stages(net):
    """Decompose a chain net into [(node, leaf_or_None, next_or_None)].

    Raises ValueError for non-chain topologies (trees)."""
    stages = []
    cur = net.root
    while True:
        if len(cur.sinks) == 0:
            stages.append((cur, None, None))
            return stages
        if len(cur.sinks) == 1:
            stages.append((cur, None, cur.sinks[0]))
            cur = cur.sinks[0]
        elif (len(cur.sinks) == 2 and len(cur.sinks[0].sinks) == 0):
            stages.append((cur, cur.sinks[0], cur.sinks[1]))
            cur = cur.sinks[1]
        else:
            raise ValueError(
                "routed inference requires a chain topology "
                "(every switch = [leaf, continue]); got a node with sinks "
                f"{[s.name for s in cur.sinks]}")


def _gather_act(act, idx):
    if isinstance(act, list):
        return [a[idx] for a in act]
    return act[idx]


def make_routed_infer_fn(net, batch_size, capacities=1.0):
    """Build a jitted routed-inference function for a chain net.

    infer(params, state, x0) -> dict with
      probs:     (B, n_cls) class probabilities from each example's exit head
      exit_idx:  (B,) index of the switch stage the example exited at
      ops:       (B,) realized op count (the measured analogue of `moc`)

    capacities: scalar fraction or per-switch list; stage j+1 processes at
    most ceil(capacity_j * B) examples. 1.0 == dense hard routing."""
    stages = chain_stages(net)
    n_switches = sum(1 for _, leaf, _ in stages if leaf is not None)
    if np.isscalar(capacities):
        capacities = [float(capacities)] * n_switches
    caps = []
    b = batch_size
    k = 0
    for node, leaf, nxt in stages:
        caps.append(b)
        if leaf is not None:
            b = min(b, int(np.ceil(capacities[k] * batch_size)))
            b = max(b, 1)
            k += 1
    # caps[i] = active-buffer size while processing stage i.

    n_cls = int(net.hypers.y_shape[0])
    eps_rte = float(getattr(net.hypers, "ϵ", 1e-6))

    def infer(params, state, x0):
        ctx = Ctx(train=False, rng=None, tau=1.0, eps=eps_rte,
                  k_cpt=getattr(net.hypers, "k_cpt", 0.0))
        B = batch_size
        probs = jnp.zeros((B, n_cls), jnp.float32)
        exit_idx = jnp.full((B,), -1, jnp.int32)
        ops_out = jnp.zeros((B,), jnp.float32)

        act = x0
        active_idx = jnp.arange(B, dtype=jnp.int32)  # B == valid sentinel+1
        ops_acc = jnp.zeros((B,), jnp.float32)
        np_ptr, ns_ptr = params, state
        y_dummy = jnp.zeros((caps[0], n_cls), jnp.float32)

        switch_i = 0
        for si, (node, leaf, nxt) in enumerate(stages):
            cap = caps[si]
            yd = y_dummy[:cap]
            act, _, aux = node.apply(np_ptr["layer"], ns_ptr["layer"], act,
                                     yd, ctx)
            ops_acc = ops_acc + node.n_ops

            if leaf is None and nxt is None:
                # Terminal leaf: remaining active examples exit with this
                # node's own (softmax) output.
                out_p = act
                valid = active_idx < B
                idx = jnp.where(valid, active_idx, B)
                probs = probs.at[idx].set(out_p.astype(jnp.float32),
                                          mode="drop")
                exit_idx = exit_idx.at[idx].set(switch_i, mode="drop")
                ops_out = ops_out.at[idx].set(ops_acc, mode="drop")
                break

            if leaf is None:
                # Pass-through node (e.g. the pyramid builder).
                np_ptr = np_ptr["sinks"][0]
                ns_ptr = ns_ptr["sinks"][0]
                continue

            # Switch: early-exit head + router decision.
            r_x, _, _ = node.router.apply(
                np_ptr["router"], ns_ptr["router"],
                net._router_input(act, ctx), yd, ctx)
            leaf_p = np_ptr["sinks"][0]
            leaf_s = ns_ptr["sinks"][0]
            out_p, _, _ = leaf.apply(leaf_p["layer"], leaf_s["layer"], act,
                                     yd, ctx)

            valid = active_idx < B
            cont = (jnp.argmax(r_x, axis=1) == 1) & valid
            # Capacity: continuing examples compact to the front; overflow
            # beyond the next stage's capacity force-exits here.
            next_cap = caps[si + 1]
            order = jnp.argsort(~cont, stable=True)  # continuers first
            rank_of = jnp.argsort(order, stable=True)
            kept = cont & (rank_of < next_cap)
            exits = valid & ~kept

            # Exiting examples (router chose the leaf, or overflowed):
            # record this head's output. Exiters also paid the router and
            # the leaf head (reference moc counts router ops at switches
            # and the leaf's ops for exiters: scripts/train-nets:119-120).
            ops_here = ops_acc + node.router.n_ops
            idx = jnp.where(exits, active_idx, B)
            probs = probs.at[idx].set(out_p.astype(jnp.float32),
                                      mode="drop")
            exit_idx = exit_idx.at[idx].set(switch_i, mode="drop")
            ops_out = ops_out.at[idx].set(ops_here + leaf.n_ops,
                                          mode="drop")

            # Compact continuers into the next stage's buffer.
            perm = order[:next_cap]
            act = _gather_act(act, perm)
            active_idx = jnp.where(kept[perm], active_idx[perm], B)
            ops_acc = ops_here[perm]
            y_dummy = y_dummy[:next_cap]
            np_ptr = np_ptr["sinks"][1]
            ns_ptr = ns_ptr["sinks"][1]
            switch_i += 1

        return {"probs": probs, "exit_idx": exit_idx, "ops": ops_out}

    return jax.jit(infer)
