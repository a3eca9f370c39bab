#!/usr/bin/env python3
"""HBM/MXU roofline account for the sweep train steps (VERDICT r3 weak #3).

Methodology (two gotchas make the naive version wrong, both verified):

1. XLA's HLO cost analysis counts a while-loop BODY ONCE — trip count is
   not folded in (verified: `flops` identical for lax.scan lengths 1, 2
   and 10 of the same body). So the scanned train loop's cost analysis
   already IS per-step (+ small prologue); dividing by the chunk length
   undercounts ~chunk-fold.
2. `bytes accessed` sums every fusion's full operand + output buffer
   bytes. For the SCANNED loop the body gathers each step's batch out of
   dataset-sized loop-invariant operands (20k images), and the analysis
   charges the full operand per gather — inflating "traffic" by GBs that
   never cross HBM. Cost-analyzing a SINGLE presampled step (batch
   arrays passed directly, no dataset operands in the program) removes
   that artifact; what remains is the inter-fusion buffer traffic, which
   on TPU does physically round-trip HBM (no cache between kernels).
   It still over-counts where one buffer feeds several consumer fusions,
   so treat it as an upper bound within ~2x.

For each configuration (chain sweep, tree sweep, optionally stacked
tails) this reports, from the single-step program's cost analysis and
the REAL scanned loop's measured time:

    implied_gbps = bytes_per_step / measured_s_per_step
    hbm_util     = implied_gbps / peak    (v5e-1 HBM ~ 819 GB/s)
    mxu_util     = flops_per_step / time / peak_flops (197 bf16 TFLOP/s)

A config with hbm_util near 1 is bandwidth-floor-bound: no
reformulation that keeps the same traffic can speed it up. One with low
hbm_util AND low mxu_util is bound by neither continuous resource —
i.e. by kernel-granularity overheads (many small ops), the known
single-net regime (docs/perf.md).

Usage: python tools/tpu_roofline.py [--configs chain,tree,tree-stacked]
                                    [--chunk 50] [--n-chunks 3]
Sync via host materialization, never block_until_ready (axon gotcha).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_HBM_GBPS = 819.0     # v5e single chip HBM bandwidth
V5E_BF16_TFLOPS = 197.0  # v5e bf16 peak


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="chain,tree,tree-stacked")
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--n-chunks", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--n-nets", type=int, default=8)
    ap.add_argument("--hbm-gbps", type=float, default=V5E_HBM_GBPS)
    ap.add_argument("--peak-tflops", type=float, default=V5E_BF16_TFLOPS)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (cpu = methodology smoke)")
    args = ap.parse_args()

    import jax
    from mpnn_tpu.utils import jaxcache
    jaxcache.enable(platform=args.platform)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from mpnn_tpu.ops import config
    config.set_compute_dtype(jnp.bfloat16)
    config.set_analytic_l2(True)

    from mpnn_tpu.experiments import ac_chain, ac_tree, λ_lrn, τ_ds
    from mpnn_tpu.models import Schedules, init_training
    from mpnn_tpu.models.steps import (_train_step_body, make_sweep_train_loop,
                                       stack_trees)
    from mpnn_tpu.data import Dataset, synth

    B, N, chunk = args.batch_size, args.n_nets, args.chunk
    ds = Dataset(synth.make_synthetic(n_tr=20000, n_ts=512, h=32, w=32,
                                      n_cls=10, seed=0))
    sched = Schedules(lr=λ_lrn, tau=τ_ds)
    x0_tr, y_tr, m_sym = ds.train_arrays
    rng = jax.random.PRNGKey(0)

    def cost(compiled):
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return (float(ca.get("bytes accessed", float("nan"))),
                float(ca.get("flops", float("nan"))))

    def account(tag, net):
        members = [init_training(net, seed=i) for i in range(N)]
        p = stack_trees([m[0] for m in members])
        s = stack_trees([m[1] for m in members])
        v = stack_trees([m[2] for m in members])
        k_arr = jnp.zeros((N,), jnp.float32)

        # --- traffic/flops: single presampled step, no dataset operands.
        step1 = _train_step_body(net, B, sched, presampled=True)
        vstep = jax.vmap(step1, in_axes=(0, 0, 0, None, None, None, None,
                                         None, 0))
        xb = jnp.asarray(x0_tr[:B], config.compute_dtype)
        yb = jnp.asarray(y_tr[:B])
        c1 = jax.jit(vstep).lower(p, s, v, 0, rng, xb, yb, m_sym,
                                  k_arr).compile()
        bytes_step, flops_step = cost(c1)

        # --- time: the REAL scanned production loop.
        loop = make_sweep_train_loop(net, B, sched)

        def one_chunk(p, s, v, rng, x0, y, m, k):
            return loop(p, s, v, 0, rng, x0, y, m, chunk, k)

        compiled = jax.jit(one_chunk).lower(p, s, v, rng, x0_tr, y_tr,
                                            m_sym, k_arr).compile()
        loop_bytes, loop_flops = cost(compiled)  # body-once, see header

        out = compiled(p, s, v, rng, x0_tr, y_tr, m_sym, k_arr)
        np.asarray(out[-1])  # settle
        t0 = time.perf_counter()
        for _ in range(args.n_chunks):
            out = compiled(*out[:3], rng, x0_tr, y_tr, m_sym, k_arr)
        np.asarray(out[-1])
        dt = time.perf_counter() - t0
        s_per_step = dt / (args.n_chunks * chunk)

        implied_gbps = bytes_step / s_per_step / 1e9
        rec = {
            "config": tag,
            "ms_per_step": round(s_per_step * 1e3, 3),
            "img_per_s": round(N * B / s_per_step),
            "step_bytes_mb": round(bytes_step / 1e6, 1),
            "step_flops_g": round(flops_step / 1e9, 2),
            "loop_body_bytes_mb": round(loop_bytes / 1e6, 1),
            "loop_body_flops_g": round(loop_flops / 1e9, 2),
            "implied_gbps": round(implied_gbps, 1),
            "hbm_util": round(implied_gbps / args.hbm_gbps, 3),
            "mxu_util": round(
                flops_step / s_per_step / (args.peak_tflops * 1e12), 3),
        }
        print(json.dumps(rec), flush=True)
        return rec

    for cfg in args.configs.split(","):
        config.set_stacked_tails(cfg.endswith("-stacked"))
        make = ac_chain if cfg.startswith("chain") else ac_tree
        net = make(k_cpt=0.0)(ds.x0_shape, ds.y_shape)
        try:
            account(cfg, net)
        except Exception as e:
            print(json.dumps({"config": cfg,
                              "error": f"{type(e).__name__}: {e}"}),
                  flush=True)


if __name__ == "__main__":
    main()
