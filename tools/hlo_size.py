#!/usr/bin/env python3
"""Trace-economics microbench (dev tool, CPU-only, no chip needed).

Lowers the tree train loop serial vs stacked(+packed carry) and reports
StableHLO size + trace/lower wall time — the proxy for what the remote
TPU compiler (10-20+ min per tree program) has to chew on. Measured
2026-08-18: serial 48.1k lines / 17.3 s, stacked+packed 28.7k / 9.7 s
(docs/perf.md).

Usage: python tools/hlo_size.py [--chunk 10] [--batch 32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["MPNN_NO_JAX_CACHE"] = "1"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=10)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mpnn_tpu.ops import config
    from mpnn_tpu.experiments import ac_tree, λ_lrn, τ_ds
    from mpnn_tpu.models import Schedules, init_training
    from mpnn_tpu.models.steps import make_train_loop
    from mpnn_tpu.data import Dataset, synth

    ds = Dataset(synth.make_synthetic(n_tr=512, n_ts=64, h=32, w=32,
                                      n_cls=10, seed=0))
    net = ac_tree(k_cpt=1e-9)(ds.x0_shape, ds.y_shape)
    sched = Schedules(lr=λ_lrn, tau=τ_ds)
    x0_tr, y_tr, m_sym = ds.train_arrays

    for tag, flag in [("serial", False), ("stacked+packed", True)]:
        config.set_stacked_tails(flag)
        try:
            loop = make_train_loop(net, args.batch, sched)
            p, s, v = init_training(net, seed=0)
            t0 = time.perf_counter()
            lowered = loop.lower(p, s, v, 0, jax.random.PRNGKey(0),
                                 x0_tr, y_tr, m_sym, args.chunk,
                                 jnp.float32(1e-9))
            txt = lowered.as_text()
            dt = time.perf_counter() - t0
        finally:
            config.set_stacked_tails(False)
        print(f"{tag}: stablehlo_lines={txt.count(chr(10))} "
              f"chars={len(txt)} trace_lower_s={dt:.1f}", flush=True)


if __name__ == "__main__":
    main()
