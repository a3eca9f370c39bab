#!/usr/bin/env python3
"""Measured serving frontier of an adaptive (dyn_k_cpt) net.

The reference's adaptive nets condition their routers on a per-example
cost-of-compute price (scripts/lib/net_types.py:146-164), so ONE
trained net spans the whole accuracy/efficiency frontier — but the
reference only ever *accounts* the savings (moc is a statistic; every
branch still executes, net_types.py:127-129). This tool measures the
frontier as DEPLOYED: for each reference price (experiments.k_cpts) it

  1. calibrates the per-switch capacity schedule to the routing
     distribution AT THAT PRICE (models/infer.calibrate_capacities, on
     a held-out train-split batch);
  2. serves the test split through the routed sparse-inference engine
     with those buffers (k_cpt is a traced operand, so prices whose
     1/32-grid schedules coincide share one compiled program);
  3. reports accuracy, realized ops/example, forced exits, and measured
     img/s — wall-clock, not accounting.

Output: one JSON line per price (+ a summary line), and an
accuracy-vs-ops frontier figure annotated with the measured throughput
at every point.

Usage: python tools/serving_frontier.py
         [--checkpoint nets/hybrid-ac-dynkcpt/net.npy]
         [--data data/hybrid.npz] [--batch-size 1024] [--n-batches 20]
         [--margin 1.5] [--platform cpu] [--json path]
         [--out figures/serving-frontier.svg]
Sync via host materialization with a chained value (axon
block_until_ready gotcha — same pattern as bench.py)."""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint",
                    default=os.path.join(REPO, "nets", "hybrid-ac-dynkcpt",
                                         "net.npy"))
    ap.add_argument("--data", default=os.path.join(REPO, "data",
                                                   "hybrid.npz"))
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--n-batches", type=int, default=20)
    ap.add_argument("--margin", type=float, default=1.5)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--json", default=None,
                    help="also write the records to this file (truncated "
                         "per run — these are committed evidence files; "
                         "appending re-runs would silently double them)")
    ap.add_argument("--out", default=os.path.join(REPO, "figures",
                                                  "serving-frontier.svg"))
    ap.add_argument("--no-figure", action="store_true")
    ap.add_argument("--measure-passes", type=int, default=2,
                    help="timing passes over the price list; img/s is the "
                         "max across passes (pass 1 right after each "
                         "compile is depressed for the FIRST program of a "
                         "process by the tunnel's cold-process transfer "
                         "penalty, and single measurements carry ~2x "
                         "run-to-run variance — see docs/results-r4.md)")
    args = ap.parse_args()

    import jax
    from mpnn_tpu.utils import jaxcache
    jaxcache.enable(platform=args.platform)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from mpnn_tpu.utils.serdes import read_net
    from mpnn_tpu.models.infer import (calibrate_capacities,
                                       make_routed_infer_fn)
    from mpnn_tpu.experiments import k_cpts
    from mpnn_tpu.data import Dataset

    net, params, state, _ = read_net(args.checkpoint)
    ds = Dataset(args.data, device_put=False)
    B = args.batch_size
    reps = -(-B // len(ds.x0_ts))
    x0 = jnp.asarray(np.tile(ds.x0_ts, (reps, 1, 1, 1))[:B])
    y_cls = np.argmax(np.tile(np.asarray(ds.y_ts), (reps, 1))[:B], axis=1)
    x0_cal = jnp.asarray(
        ds.x0_tr[:B] if len(ds.x0_tr) >= B
        else np.tile(ds.x0_tr, (-(-B // len(ds.x0_tr)), 1, 1, 1))[:B])

    def time_program(infer, price):
        """One timed window: n_batches steps, host-sync via a chained
        value (axon block_until_ready gotcha). Returns (img/s, result)."""
        r = infer(params, state, x0, price)
        np.asarray(r["ops"])  # sync after compile / warm the dispatch path
        t0 = time.perf_counter()
        acc_chain = 0.0
        for _ in range(args.n_batches):
            r = infer(params, state, x0, price)
            acc_chain = acc_chain + jnp.sum(r["ops"])
        np.asarray(acc_chain)  # sync bounds all device work
        dt = time.perf_counter() - t0
        return round(args.n_batches * B / dt, 1), r

    programs = {}  # schedule tuple -> compiled infer fn (shared shapes)
    records = []
    for price in k_cpts:
        fracs = calibrate_capacities(net, params, state, x0_cal,
                                     margin=args.margin, k_cpt=price)
        key = tuple(fracs)
        if key not in programs:
            programs[key] = make_routed_infer_fn(net, B, capacities=fracs)
        infer = programs[key]
        ips, r = time_program(infer, price)
        ops = np.asarray(r["ops"])
        forced = np.asarray(r["forced"])
        pred = np.argmax(np.asarray(r["probs"]), axis=1)
        rec = {
            "k_cpt": price,
            "capacities": [round(f, 4) for f in fracs],
            "images_per_sec": ips,
            "images_per_sec_passes": [ips],
            "mean_ops_per_example": float(ops.mean()),
            "accuracy": round(float(np.mean(pred == y_cls)), 4),
            "forced_exits": int(forced.sum()),
            "_program": key,
        }
        records.append(rec)
        print(json.dumps({k: v for k, v in rec.items()
                          if not k.startswith("_")}), flush=True)

    # Extra timing passes with every program compiled and the process
    # warm: the first program measured in a fresh process is depressed
    # 5-10x by the tunnel's early-process transfer penalty, and single
    # windows carry ~2x run-to-run variance. Deterministic columns
    # (accuracy/ops/forced) are unaffected; img/s becomes the max.
    for _ in range(max(0, args.measure_passes - 1)):
        for rec in records:
            ips, _ = time_program(programs[rec["_program"]], rec["k_cpt"])
            rec["images_per_sec_passes"].append(ips)
            rec["images_per_sec"] = max(rec["images_per_sec_passes"])
    for rec in records:
        del rec["_program"]
        if args.measure_passes > 1:
            print(json.dumps(rec), flush=True)

    summary = {
        "checkpoint": (os.path.relpath(args.checkpoint, REPO)
                       if os.path.abspath(args.checkpoint).startswith(REPO)
                       else os.path.basename(args.checkpoint)),
        "batch_size": B, "margin": args.margin,
        "n_programs": len(programs),
        "n_prices": len(k_cpts),
        "ops_span": round(max(r["mean_ops_per_example"] for r in records)
                          / min(r["mean_ops_per_example"] for r in records),
                          2),
    }
    print(json.dumps({"serving_frontier_summary": summary}), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            for rec in records + [{"serving_frontier_summary": summary}]:
                f.write(json.dumps(rec) + "\n")

    if not args.no_figure:
        render(records, summary, args.out)
        print(f"wrote {args.out}")


def render(records, summary, out):
    import mpnn_tpu.viz  # noqa: F401  (deterministic figure bytes)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    INK, BLUE = "#333333", "#2a6ccc"
    ops = [r["mean_ops_per_example"] for r in records]
    err = [1.0 - r["accuracy"] for r in records]
    fig, ax = plt.subplots(figsize=(5.6, 4.2))
    ax.grid(True, color="#dddddd", lw=0.6, zorder=0)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    ax.plot(ops, err, "-o", color=BLUE, lw=2, ms=6, zorder=3)
    ax.margins(y=0.18)
    # Selective labels (not a number on every point): skip a point whose
    # x sits within 4% of the previously labeled one — the near-dense
    # price cluster reads from the line; the subtitle carries the
    # throughput range.
    last_x = None
    for i, (r, o, e) in enumerate(zip(records, ops, err)):
        if last_x is not None and abs(o - last_x) < 0.04 * max(ops) \
                and i != len(records) - 1:
            continue
        last_x = o
        lab = (f"k_cpt={r['k_cpt']:g}"
               f"\n{r['images_per_sec']/1e3:.0f}k img/s")
        at_right = o > 0.9 * max(ops)
        ax.annotate(lab, (o, e),
                    xytext=(-6 if at_right else 6, 10),
                    textcoords="offset points",
                    ha="right" if at_right else "left",
                    fontsize=7.5, color=INK)
    ax.set_xscale("log")
    ax.set_xlabel("realized ops / example (measured, routed)",
                  fontsize=10, color=INK)
    ax.set_ylabel("test error", fontsize=10, color=INK)
    ips = [r["images_per_sec"] for r in records]
    ax.set_title("One deployed adaptive net, every operating point\n"
                 f"(b{summary['batch_size']}, {summary['n_programs']} "
                 f"programs / {summary['n_prices']} prices, "
                 f"{min(ips)/1e3:.0f}–{max(ips)/1e3:.0f}k img/s)",
                 fontsize=10, color=INK)
    ax.tick_params(colors=INK, labelsize=9)
    fig.tight_layout()
    os.makedirs(os.path.dirname(out), exist_ok=True)
    fig.savefig(out)


if __name__ == "__main__":
    main()
