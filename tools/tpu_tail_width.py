#!/usr/bin/env python3
"""Tail-template width microbench (dev tool): bounds the ceiling of the
one formulation VERDICT r2 Next #7 left open for the 8-tree sweep.

Context (docs/perf.md): the nested-vmap stacked-tails sweep is REFUTED by
profile (23.7 vs 15.4 ms/step; +copies/+reshapes/+216 us nested-batched
template convs). The remaining idea is HIERARCHICAL grouping: trunk
templates 8-wide (one per net, as the serial sweep already runs them) and
the 64 congruent tails merged into ONE single-level 64-wide vmap. Its
best case is bounded by the marginal efficiency of widening the tail
template vmap 8 -> 64 at fixed total instances:

    fn8  = 8 sequential vmap(tail_fwd_bwd) calls at member width 8
           (what the serial sweep's trace effectively realizes today)
    fn64 = 1 vmap(tail_fwd_bwd) call at member width 64
           (the hierarchical proposal's tail half, WITHOUT the extra
           inter-group gather/reshape it would also need)

If fn64 >= fn8, hierarchical grouping cannot beat the serial sweep and
the item is closed by measurement.

Usage: python tools/tpu_tail_width.py [--batch 128] [--iters 20]
Sync via host materialization (axon: block_until_ready returns early).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20,
                    help="scanned fwd+bwd iterations per timed call")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from mpnn_tpu.utils import jaxcache
    jaxcache.enable()
    import jax.numpy as jnp
    from mpnn_tpu.ops import config
    config.set_compute_dtype(jnp.bfloat16)
    config.set_analytic_l2(True)

    from mpnn_tpu.experiments import ac_tree
    from mpnn_tpu.models import init_training
    from mpnn_tpu.models.net import Ctx

    B = args.batch
    net = ac_tree(k_cpt=0.0)((32, 32, 3), (10,))
    plan = net._stack_plan
    assert plan, "ac_tree has no congruent-subtree groups?"
    group = plan[0]
    members = group["members"]
    M0 = len(members)
    assert M0 == 8, f"expected 8 congruent tails, got {M0}"
    template = members[0]

    # Member param/state subtrees sliced out of a real full-net init, so
    # shapes/dtypes match production exactly.
    params, state, _ = init_training(net, seed=0)

    def member_tree(tree, member):
        """Params/state subtree at `member`'s position in the net tree."""
        def walk(node, t):
            for i, s in enumerate(node.sinks):
                if s is member:
                    return t["sinks"][i]
                r = walk(s, t["sinks"][i])
                if r is not None:
                    return r
            return None
        r = walk(net.root, tree)
        assert r is not None
        return r

    import jax.tree_util as jtu
    p_list = [member_tree(params, m) for m in members]
    s_list = [member_tree(state, m) for m in members]

    # The template's input: its parent's multiscale out_shape.
    parent = next(n for n in net.layers if any(s is m for m in members
                                               for s in n.sinks))
    scale_shapes = parent.out_shape
    assert isinstance(scale_shapes, list), scale_shapes
    rng = np.random.RandomState(0)
    dt = config.compute_dtype or jnp.float32

    def make_x(m):
        return [jnp.asarray(rng.rand(m, B, *s).astype(np.float32), dt)
                for s in scale_shapes]

    y = jnp.asarray(np.eye(10, dtype=np.float32)[rng.randint(0, 10, B)])
    ctx = Ctx(train=True, rng=None, tau=1.0, eps=1e-6, k_cpt=0.0)

    def tail_loss(p, s, x):
        """One member's tail fwd; scalar touching every output (so the
        bwd covers the whole template, like training)."""
        outs = []
        net._walk_subtree(template, p, s, x, y, ctx, outs)
        acc = 0.0
        for o in outs:
            for v in jtu.tree_leaves((o["x"], o["c_err"], o["router_x"])):
                if hasattr(v, "astype"):
                    acc = acc + jnp.sum(v.astype(jnp.float32))
        return acc

    vgrad = jax.vmap(jax.value_and_grad(tail_loss), in_axes=(0, 0, 0))

    def stack_members(trees, reps):
        return jtu.tree_map(lambda *l: jnp.stack(l * reps), *trees)

    def timed(tag, m_width, n_calls):
        p_st = stack_members(p_list, m_width // M0)
        s_st = stack_members(s_list, m_width // M0)
        x_st = make_x(m_width)

        # p/s/x are jit ARGUMENTS, not closure captures: captured arrays
        # embed as HLO constants and the 64-wide activations (~256 MB)
        # overflow the remote-compile request limit (HTTP 413).
        @jax.jit
        def run(c0, p_st, s_st, x_st):
            def body(carry, _):
                # Perturb params by the carry so iterations can't be
                # CSE'd; grads keep the full bwd alive.
                acc = 0.0
                for _c in range(n_calls):
                    p_in = jtu.tree_map(
                        lambda a: a + carry.astype(a.dtype), p_st)
                    v, g = vgrad(p_in, s_st, x_st)
                    acc = (acc + jnp.sum(v)
                           + sum(jnp.sum(l.astype(jnp.float32)) * 1e-9
                                 for l in jtu.tree_leaves(g)))
                return carry + acc * 1e-20, ()
            c, _ = jax.lax.scan(body, c0, None, length=args.iters)
            return c

        c = run(jnp.float32(0.0), p_st, s_st, x_st)
        np.asarray(c)  # compile + settle
        t0 = time.perf_counter()
        c = run(jnp.float32(1e-9), p_st, s_st, x_st)
        np.asarray(c)
        dtime = time.perf_counter() - t0
        per_iter_us = dtime / args.iters * 1e6
        print(json.dumps({
            "config": tag, "m_width": m_width, "calls_per_iter": n_calls,
            "total_instances": m_width * n_calls,
            "us_per_iter": round(per_iter_us, 1)}), flush=True)
        return per_iter_us

    t8 = timed("8x (8-wide)", 8, 8)     # the serial sweep's realization
    t64 = timed("1x (64-wide)", 64, 1)  # hierarchical proposal's tails
    print(json.dumps({"verdict": "64-wide %s 8x8-wide by %.1f%%"
                      % ("beats" if t64 < t8 else "loses to",
                         abs(t8 - t64) / t8 * 100)}))


if __name__ == "__main__":
    main()
