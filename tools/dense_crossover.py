#!/usr/bin/env python3
"""Where does routed sparse inference beat DENSE on wall-clock?

Round-5 discovery: with per-program warm-up windows in place, the
all-branches dense forward of the base-width flagship chain measures
~293k img/s at b1024 — the 11–12k "dense" numbers in earlier rounds
were COLD-START artifacts (the dense program was always the first one
timed in a fresh process), so "routed = 15–25× dense" wall-clock
claims used a depressed denominator. On the base-width chain the
truth is the reverse: the dense program is a single well-fused
feed-forward XLA program, while the routed engine pays argsort/
compaction/scatter plumbing per switch — 80% realized-op savings do
not cover that overhead at 3–16-channel widths.

This tool measures the honest crossover: dense (bench.py's
all-branches dense_fwd) vs calibrated routed inference, warm, at
b1024, across the width ladder (base → fat ×2 → fatter ×4). As width
grows, saved FLOPs grow quadratically while plumbing stays ~constant,
so routing should win wall-clock somewhere up the ladder — the claim
the serving story should rest on.

Usage: python tools/dense_crossover.py [--json results/dense-crossover.json]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LADDER = [
    ("base", "nets/hybrid-ac/0004.npy", "data/hybrid.npz"),
    ("fat-x2", "nets/cifar10-ac-fat/0004.npy", "data/cifar-10.npz"),
    ("fatter-x4", "nets/cifar10-ac-fatter/0004.npy", "data/cifar-10.npz"),
]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--json", default=os.path.join(
        REPO, "results", "dense-crossover.json"))
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--n-batches", type=int, default=10)
    args = ap.parse_args()

    from mpnn_tpu.utils import jaxcache
    jaxcache.wait_for_backend()
    import jax  # noqa: F401
    jaxcache.enable()
    import jax.numpy as jnp
    from mpnn_tpu.ops import config
    config.set_compute_dtype(jnp.bfloat16)
    config.set_analytic_l2(True)

    import bench
    rows = []
    for name, ckpt, data in LADDER:
        if not os.path.exists(os.path.join(REPO, ckpt)):
            print(json.dumps({"skip": name, "missing": ckpt}), flush=True)
            continue
        try:
            r = bench.measure_routed_inference(
                n_batches=args.n_batches, batch_size=args.batch_size,
                checkpoint=os.path.join(REPO, ckpt),
                data=os.path.join(REPO, data))
        except Exception as e:
            # One bad rung (torn checkpoint, tunnel outage mid-sweep)
            # must not discard the rungs already measured.
            rows.append({"net": name, "checkpoint": ckpt,
                         "error": f"{type(e).__name__}: {e}"})
            print(json.dumps(rows[-1]), flush=True)
            with open(args.json, "w") as f:
                json.dump({"batch_size": args.batch_size, "rows": rows},
                          f, indent=1)
            continue
        cal = next((e for e in r["capacity_sweep"]
                    if isinstance(e["capacity"], list)), None)
        row = {
            "net": name, "checkpoint": ckpt,
            "dense_images_per_sec": r["dense"]["images_per_sec"],
            "dense_ops": r["dense"]["mean_ops_per_example"],
            "routed_calibrated_images_per_sec":
                cal["images_per_sec"] if cal else None,
            "routed_ops": cal["mean_ops_per_example"] if cal else None,
            "routed_accuracy": cal.get("accuracy") if cal else None,
            "flops_savings": r.get("flops_savings_vs_dense"),
            "wallclock_speedup_routed_vs_dense":
                (round(cal["images_per_sec"]
                       / r["dense"]["images_per_sec"], 3) if cal else None),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        # Incremental write: completed rungs survive a later crash.
        with open(args.json, "w") as f:
            json.dump({"batch_size": args.batch_size, "rows": rows}, f,
                      indent=1)
    print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
