#!/usr/bin/env python3
"""Tree-sweep scaling microbench (dev tool, not a user CLI).

The single-tree b128 train step measures ~5 ms (80k iters in ~7 min,
campaign synth-ac-tree-dynkcpt) -- exactly the ~7x compute scaling from the
0.70 ms chain step. But the VMAPPED 8-tree sweep historically ran at only
~3.7-4k img/s aggregate (~120+ ms/step net of evals/compile), far off the
~40 ms naive scaling. This tool times the vmapped tree-sweep loop at sweep
widths 1/2/4/8 to locate where the scaling breaks (HBM working-set spill vs
dispatch vs layout pathology).

Usage: python tools/tpu_tree_bench.py [--widths 1,2,4,8] [--chunk 50]
Sync via host materialization, never block_until_ready (axon gotcha).
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
    ap.add_argument("--widths", default="1,2,4,8")
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--n-chunks", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--stacked", action="store_true",
                    help="evaluate congruent tree tails as one vmapped "
                         "template (ops.config.stacked_tails)")
    args = ap.parse_args()

    import jax
    from mpnn_tpu.utils import jaxcache
    jaxcache.enable()
    import jax.numpy as jnp
    from mpnn_tpu.ops import config
    config.set_compute_dtype(jnp.bfloat16)
    config.set_analytic_l2(True)
    if args.stacked:
        config.set_stacked_tails(True)

    from mpnn_tpu.experiments import ac_tree, λ_lrn, τ_ds
    from mpnn_tpu.models import Schedules, init_training
    from mpnn_tpu.models.steps import (make_sweep_train_loop, stack_trees,
                                       make_train_loop)
    from mpnn_tpu.data import Dataset, synth

    B = args.batch_size
    ds = Dataset(synth.make_synthetic(n_tr=20000, n_ts=512, h=32, w=32,
                                      n_cls=10, seed=0))
    net = ac_tree(k_cpt=0.0)(ds.x0_shape, ds.y_shape)
    sched = Schedules(lr=λ_lrn, tau=τ_ds)
    x0_tr, y_tr, m_sym = ds.train_arrays
    rng = jax.random.PRNGKey(0)
    chunk = args.chunk

    def time_loop(tag, run, carry):
        tc = time.perf_counter()
        carry, cs = run(carry, 0)
        np.asarray(cs)  # compile + warmup
        compile_s = time.perf_counter() - tc
        t0 = time.perf_counter()
        t = chunk
        for _ in range(args.n_chunks):
            carry, cs = run(carry, t)
            t += chunk
        np.asarray(cs)
        dt = time.perf_counter() - t0
        us = dt / (args.n_chunks * chunk) * 1e6
        print(json.dumps({"config": tag, "us_per_step": round(us, 1),
                          "compile_warmup_s": round(compile_s, 1)}),
              flush=True)

    widths = [int(w) for w in args.widths.split(",")]
    for n in widths:
        if n == 1:
            loop = make_train_loop(net, B, sched)
            k = jnp.float32(0.0)

            def run1(carry, t, loop=loop, k=k):
                p, s, v = carry
                p, s, v, cs = loop(p, s, v, t, rng, x0_tr, y_tr, m_sym,
                                   chunk, k)
                return (p, s, v), cs

            p, s, v = init_training(net, seed=0)
            time_loop("tree x1", run1, (p, s, v))
            continue
        members = [init_training(net, seed=i) for i in range(n)]
        params_s = stack_trees([m[0] for m in members])
        state_s = stack_trees([m[1] for m in members])
        vel_s = stack_trees([m[2] for m in members])
        k_arr = jnp.zeros((n,), jnp.float32)
        sloop = make_sweep_train_loop(net, B, sched)

        def runn(carry, t, sloop=sloop, k_arr=k_arr):
            p, s, v = carry
            p, s, v, cs = sloop(p, s, v, t, rng, x0_tr, y_tr, m_sym,
                                chunk, k_arr)
            return (p, s, v), cs

        time_loop("tree x%i" % n, runn, (params_s, state_s, vel_s))


if __name__ == "__main__":
    main()
