"""Routed sparse inference: actually skip the compute the router skips.

The reference executes every branch for every example even at eval time --
hard routing only masks the statistics, and `moc` is an accounting metric,
not a measured saving (SURVEY.md section 3.2; reference
scripts/lib/net_types.py:127-129, scripts/train-nets:120). This engine
realizes the savings on TPU with fully static shapes, using the
capacity-factor idea from MoE systems:

- examples flow through the routing tree in fixed-capacity "active"
  buffers (one static buffer size per tree edge);
- at each switch the router's argmax picks a sink per example (identical
  to the dense pi_ev rule, net_types.py:127-129);
- each child's selected examples are compacted to the front of its buffer
  (stable argsort) and the child subtree processes only that buffer;
- internal children have capacity ceil(f * batch); selected examples beyond
  capacity are force-exited through the switch's early-exit leaf (the
  standard MoE capacity trade-off; f = 1.0 reproduces dense hard routing
  EXACTLY -- same exits, probabilities, and per-example op counts);
- exited examples' class probabilities, exit leaf index and realized op
  count scatter to their original batch rows via out-of-range-sentinel
  indices with mode='drop' (no masking bookkeeping).

Handles arbitrary tree topologies (the reference's 3-way-fanout trees
included), not just chains. Requirements: every switch that can overflow
(f < 1) must have at least one leaf child to force-exit through -- true of
every reference architecture."""

import numpy as np
import jax
import jax.numpy as jnp

from .net import Ctx


def chain_stages(net):
    """Decompose a chain net into [(node, leaf_or_None, next_or_None)] --
    a structural helper (raises ValueError for trees)."""
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
                "not a chain topology; got a node with sinks "
                f"{[s.name for s in cur.sinks]}")


def _gather_act(act, idx):
    if isinstance(act, list):
        return [a[idx] for a in act]
    return act[idx]


def calibrate_capacities(net, params, state, x0, *, margin=1.5,
                         k_cpt=None, floor=1.0 / 64.0, grid=32):
    """Per-switch capacity fractions fitted to the TRAINED routing
    distribution — the MoE capacity-factor calibration step.

    At capacities=1.0 every internal buffer stays batch-wide, so routed
    inference executes near-DENSE compute even when realized per-example
    ops drop 80% (the savings are an accounting truth, not a wall-clock
    one). The wall-clock win comes from shrinking the static buffers to
    what the routers actually use: this helper runs exact hard routing
    (capacity 1.0) on a calibration batch, measures each switch's
    worst-internal-child arrival rate w.r.t. the ORIGINAL batch, and
    returns per-switch fractions `min(1, max(floor, margin * rate))` in
    the preorder switch order `make_routed_infer_fn` expects. `margin`
    absorbs batch-to-batch routing variance (overflow examples are
    force-exited, degrading accuracy gracefully, never dropped);
    `floor` keeps rarely-taken subtrees servable.

    Fractions are rounded UP to multiples of 1/`grid` so the static
    buffer shapes `ceil(f * B)` they induce are stable across checkpoint
    retrains: raw arrival rates jitter by a few examples per batch, and
    unquantized fractions would give every retrained checkpoint its own
    buffer shapes — a guaranteed persistent-compile-cache miss in the
    timed bench window (remote TPU compiles run 27 s - 14 min). On the
    1/32 grid the shapes only change when the routing distribution
    genuinely shifts across a ~3% boundary; rounding up only adds
    slack, never forced exits.

    Realizes the eval-routing semantics of reference
    scripts/lib/net_types.py:127-129 as a deployable buffer schedule."""
    B = len(x0)
    infer = make_routed_infer_fn(net, B, capacities=1.0)
    exit_idx = np.asarray(infer(params, state, x0, k_cpt)["exit_idx"])
    leaves = [l for l in net.layers if len(l.sinks) == 0]
    switches = [l for l in net.layers if len(l.sinks) > 1]
    from .net import _subtree_nodes
    fracs = []
    for sw in switches:
        worst = 0
        for sink in sw.sinks:
            if len(sink.sinks) == 0:
                continue
            sub_leaf_ids = {i for i, l in enumerate(leaves)
                            if any(n is l for n in _subtree_nodes(sink))}
            worst = max(worst, int(np.isin(exit_idx,
                                           list(sub_leaf_ids)).sum()))
        raw = max(floor, margin * worst / B)
        fracs.append(float(min(1.0, np.ceil(raw * grid) / grid)))
    return fracs


def make_routed_infer_fn(net, batch_size, capacities=1.0):
    """Build a jitted routed-inference function for any tree net.

    infer(params, state, x0, k_cpt=None) -> dict with
      probs:     (B, n_cls) class probabilities from each example's exit head
      exit_idx:  (B,) preorder index of the leaf the example exited through
      ops:       (B,) realized op count (the measured analogue of `moc`)
      forced:    (n_switches,) per-switch count of examples the router
                 selected for an internal child but that overflowed its
                 capacity buffer and were force-exited through the
                 switch's early-exit leaf (switches in preorder). All
                 zeros at capacity 1.0; the engine's central trade-off —
                 forced exits degrade accuracy as capacity shrinks — is
                 measured by sweeping capacities (scripts/infer-bench
                 --capacity, bench.py's capacity_sweep field).

    capacities: scalar fraction, or a per-switch list in preorder; internal
    children of switch s get buffers of ceil(f_s * B). 1.0 == dense hard
    routing.

    k_cpt: optional scalar cost-of-compute price. For dyn_k_cpt nets
    (reference scripts/lib/net_types.py:146-164) the routers condition on
    this price, so ONE deployed adaptive net serves any accuracy/compute
    point; it is a traced operand, so every price shares one compiled
    program. None uses the net's trained hypers.k_cpt (non-adaptive nets
    ignore it)."""
    switches = [l for l in net.layers if len(l.sinks) > 1]
    if np.isscalar(capacities):
        fracs = {id(sw): float(capacities) for sw in switches}
    else:
        fracs = {id(sw): float(f) for sw, f in zip(switches, capacities)}
    leaves = [l for l in net.layers if len(l.sinks) == 0]
    leaf_index = {id(l): i for i, l in enumerate(leaves)}
    n_cls = int(net.hypers.y_shape[0])
    from .steps import _hyper  # NFKC-normalized lookup (kwarg ϵ -> attr ε)
    eps_rte = float(_hyper(net, "ϵ", 1e-6))

    for sw in switches:
        has_leaf_child = any(len(s.sinks) == 0 for s in sw.sinks)
        if fracs[id(sw)] < 1.0 and not has_leaf_child:
            raise ValueError(
                f"switch {sw.name} has capacity < 1 but no leaf child to "
                "force-exit overflow through")

    def infer(params, state, x0, k_cpt=None):
        kc = (getattr(net.hypers, "k_cpt", 0.0) if k_cpt is None
              else jnp.asarray(k_cpt, jnp.float32))
        ctx = Ctx(train=False, rng=None, tau=1.0, eps=eps_rte, k_cpt=kc)
        B = batch_size  # B doubles as the invalid-index sentinel
        out = {
            "probs": jnp.zeros((B, n_cls), jnp.float32),
            "exit_idx": jnp.full((B,), -1, jnp.int32),
            "ops": jnp.zeros((B,), jnp.float32),
            "forced": jnp.zeros((len(switches),), jnp.int32),
        }
        switch_pos = {id(sw): i for i, sw in enumerate(switches)}

        def recurse(node, p, s, act, active_idx, ops_acc, cap):
            yd = jnp.zeros((cap, n_cls), jnp.float32)
            act, _, _ = node.apply(p["layer"], s["layer"], act, yd, ctx)
            ops_acc = ops_acc + node.n_ops

            if len(node.sinks) == 0:
                # Exit head reached: scatter results to original rows.
                idx = jnp.where(active_idx < B, active_idx, B)
                out["probs"] = out["probs"].at[idx].set(
                    act.astype(jnp.float32), mode="drop")
                out["exit_idx"] = out["exit_idx"].at[idx].set(
                    leaf_index[id(node)], mode="drop")
                out["ops"] = out["ops"].at[idx].set(ops_acc, mode="drop")
                return

            if len(node.sinks) == 1:
                recurse(node.sinks[0], p["sinks"][0], s["sinks"][0], act,
                        active_idx, ops_acc, cap)
                return

            # Switch: router argmax decides the sink per example.
            r_x, _, _ = node.router.apply(
                p["router"], s["router"], net._router_input(act, ctx), yd,
                ctx)
            ops_acc = ops_acc + node.router.n_ops
            valid = active_idx < B
            choice = jnp.argmax(r_x, axis=1)
            frac = fracs[id(node)]
            first_leaf = next((i for i, sk in enumerate(node.sinks)
                               if len(sk.sinks) == 0), None)

            # Internal children first: capacity-cap their selections and
            # collect the overflow.
            sels = [(choice == i) & valid for i in range(len(node.sinks))]
            overflow = jnp.zeros((cap,), bool)
            plans = []
            for i, sink in enumerate(node.sinks):
                if len(sink.sinks) == 0:
                    continue
                child_cap = max(1, min(cap,
                                       int(np.ceil(frac * batch_size))))
                sel = sels[i]
                order = jnp.argsort(~sel, stable=True)
                rank = jnp.argsort(order, stable=True)
                kept = sel & (rank < child_cap)
                overflow = overflow | (sel & ~kept)
                plans.append((i, sink, kept, order[:child_cap]))
            out["forced"] = out["forced"].at[switch_pos[id(node)]].add(
                jnp.sum(overflow).astype(jnp.int32))
            # Leaf children: their own selections, plus (for the first leaf)
            # everything that overflowed an internal child.
            for i, sink in enumerate(node.sinks):
                if len(sink.sinks) != 0:
                    continue
                sel = sels[i] | (overflow if i == first_leaf else False)
                order = jnp.argsort(~sel, stable=True)
                plans.append((i, sink, sel, order[:cap]))

            for i, sink, kept, perm in plans:
                child_idx = jnp.where(kept[perm], active_idx[perm], B)
                recurse(sink, p["sinks"][i], s["sinks"][i],
                        _gather_act(act, perm), child_idx, ops_acc[perm],
                        len(perm))

        recurse(net.root, params, state, x0, jnp.arange(B, dtype=jnp.int32),
                jnp.zeros((B,), jnp.float32), B)
        return out

    return jax.jit(infer)
