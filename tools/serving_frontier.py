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

Each record also carries the DENSE cross-check (VERDICT r4 next #3):
accuracy + per-leaf exit occupancy/accuracy from exact dense hard
routing (capacity 1.0 — engine-identical to the reference's eval rule,
net_types.py:127-129) at the same price, next to the routed engine's
own per-leaf breakdown. With zero forced exits the two must agree
exactly (tests/test_infer.py pins this), so any routed-vs-dense
accuracy gap is a measured engine defect, and a with-price accuracy
RISE that shows up in the dense column too is a property of the
trained routing, not of the serving engine.

Optionally (--latency-prices) measures deployed per-example latency at
small batches (--latency-batches, default 1,8) for the chosen prices:
median + p90 wall ms per infer call, each call synced to the host —
the b1 serving story the reference's moc accounting never measures
(VERDICT r4 next #8).

Output: one JSON line per price (+ a summary line), and an
accuracy-vs-ops frontier figure annotated with the measured throughput
at every point.

Timing protocol (VERDICT r4 next #2 + ADVICE r4): every unique program
is compiled first, then given a throwaway warm window (the first
program executed in a fresh process is otherwise depressed 5-16x by
the tunnel's cold-process transfer penalty — measured in
results/serving-frontier/*-r4.json pass-1 columns); then
--measure-passes timed passes run over the programs in rotated order
(so no price is systematically first), one window per unique program
per pass (k_cpt is a traced operand: prices sharing a capacity
schedule share a program, and its throughput does not depend on the
price value). images_per_sec is the MEDIAN across passes (not max).

Usage: python tools/serving_frontier.py
         [--checkpoint nets/hybrid-ac-dynkcpt/net.npy]
         [--data data/hybrid.npz] [--batch-size 1024] [--n-batches 20]
         [--margin 1.5] [--platform cpu] [--json path]
         [--latency-prices min,max] [--latency-batches 1,8]
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


def leaf_breakdown(exit_idx, correct, n_leaves):
    """Per-exit-leaf occupancy + accuracy (preorder leaf index) — the
    per-leaf decomposition make-nlds renders (reference make-nlds:59-78),
    here from MEASURED routed exits."""
    rows = []
    for li in range(n_leaves):
        at = exit_idx == li
        n = int(at.sum())
        rows.append({"leaf": li, "n": n,
                     "acc": round(float(correct[at].mean()), 4)
                            if n else None})
    return rows


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
    ap.add_argument("--measure-passes", type=int, default=3,
                    help="timed passes per unique program (after a "
                         "throwaway warm window); img/s is the MEDIAN "
                         "across passes — single windows carry ~2x "
                         "run-to-run variance and max-of-N is upward-"
                         "biased (ADVICE r4)")
    ap.add_argument("--latency-prices", default=None,
                    help="comma list of k_cpt prices (or 'min,max') to "
                         "measure small-batch latency for; each adds "
                         "len(--latency-batches) compiles")
    ap.add_argument("--latency-batches", default="1,8",
                    help="comma list of batch sizes for --latency-prices")
    ap.add_argument("--latency-calls", type=int, default=30,
                    help="timed calls per latency point (median + p90 "
                         "reported; each call synced to host)")
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

    # Phase 1 — compile every unique program + deterministic columns
    # (accuracy/ops/forced + per-leaf breakdowns + the dense-eval
    # cross-check; none of these depend on timing).
    n_leaves = sum(1 for l in net.layers if len(l.sinks) == 0)
    n_switches = sum(1 for l in net.layers if len(l.sinks) > 1)
    dense_key = tuple([1.0] * n_switches)
    programs = {}  # schedule tuple -> compiled infer fn (shared shapes)
    records = []
    fracs_by_price = {}  # UNROUNDED schedule per price (latency reuses it)
    for price in k_cpts:
        fracs = calibrate_capacities(net, params, state, x0_cal,
                                     margin=args.margin, k_cpt=price)
        fracs_by_price[price] = fracs
        key = tuple(fracs)
        if key not in programs:
            programs[key] = make_routed_infer_fn(net, B, capacities=fracs)
        if dense_key not in programs:
            programs[dense_key] = make_routed_infer_fn(net, B,
                                                       capacities=1.0)
        r = programs[key](params, state, x0, price)
        ops = np.asarray(r["ops"])
        forced = np.asarray(r["forced"])
        pred = np.argmax(np.asarray(r["probs"]), axis=1)
        exit_idx = np.asarray(r["exit_idx"])
        # Dense cross-check: exact hard routing (capacity 1.0) at the
        # same price — the reference's own eval rule, so `accuracy` vs
        # `dense_accuracy` anchors the routed engine against net_desc's
        # metric (VERDICT r4 next #3 / weak #3).
        rd = programs[dense_key](params, state, x0, price)
        pred_d = np.argmax(np.asarray(rd["probs"]), axis=1)
        exit_d = np.asarray(rd["exit_idx"])
        rec = {
            "k_cpt": price,
            "capacities": [round(f, 4) for f in fracs],
            "images_per_sec": None,
            "images_per_sec_passes": [],
            "mean_ops_per_example": float(ops.mean()),
            "accuracy": round(float(np.mean(pred == y_cls)), 4),
            "dense_accuracy": round(float(np.mean(pred_d == y_cls)), 4),
            "dense_mean_ops_per_example":
                float(np.asarray(rd["ops"]).mean()),
            "forced_exits": int(forced.sum()),
            "per_leaf_routed": leaf_breakdown(exit_idx, pred == y_cls,
                                              n_leaves),
            "per_leaf_dense": leaf_breakdown(exit_d, pred_d == y_cls,
                                             n_leaves),
            "routed_matches_dense_exits":
                bool((exit_idx == exit_d).all()),
            "_program": key,
        }
        records.append(rec)

    # Phase 2 — throwaway warm windows per program: the first program
    # executed in a fresh process is depressed 5-16x by the tunnel's
    # cold-process transfer penalty (measured: *-r4.json pass-1), and a
    # SINGLE warm window is not always enough (chain-frontier-r5 first
    # measurement: warm window 13.7k, next window still 3.2k, then
    # 240k) — so warm ADAPTIVELY: repeat each program's window until
    # consecutive rates agree within 1.6x (max 4), recording them all.
    # NOTE a price whose calibrated schedule is all-1.0 shares the dense
    # cross-check's program; timed keys are those REFERENCED by records
    # (dense_key included then), not programs-minus-dense.
    keys = []
    for rec in records:
        if rec["_program"] not in keys:
            keys.append(rec["_program"])
    warmup = {}
    for key in keys:
        fn = programs[key]
        price = next(r["k_cpt"] for r in records if r["_program"] == key)
        wins = [time_program(fn, price)[0]]
        while len(wins) < 4:
            wins.append(time_program(fn, price)[0])
            hi, lo = max(wins[-2:]), min(wins[-2:])
            if lo > 0 and hi / lo < 1.6:
                break
        warmup[key] = wins

    # Phase 3 — timed passes, one window per unique program per pass,
    # program order rotated so no price is systematically first; each
    # pass's result fans out to the records sharing the program.
    for p in range(max(1, args.measure_passes)):
        for key in keys[p % len(keys):] + keys[:p % len(keys)]:
            price = next(r["k_cpt"] for r in records if r["_program"] == key)
            ips, _ = time_program(programs[key], price)
            for rec in records:
                if rec["_program"] == key:
                    rec["images_per_sec_passes"].append(ips)
    for rec in records:
        rec["images_per_sec_warmup_windows"] = warmup[rec["_program"]]
        del rec["_program"]
        rec["images_per_sec"] = round(
            float(np.median(rec["images_per_sec_passes"])), 1)
        print(json.dumps(rec), flush=True)

    # Small-batch serving latency (VERDICT r4 next #8): per-example
    # latency at b1/b8 for selected prices, every call synced — the
    # deployed low-latency story (includes the ~2 ms tunnel dispatch
    # this runtime pays per call; see CLAUDE.md).
    if args.latency_prices:
        if args.latency_prices == "min,max":
            lat_prices = [min(k_cpts), max(k_cpts)]
        else:
            lat_prices = [float(s) for s in args.latency_prices.split(",")]
        lat_batches = [int(s) for s in args.latency_batches.split(",")]
        for price in lat_prices:
            rec = min(records, key=lambda r: abs(r["k_cpt"] - price))
            rec.setdefault("latency_ms", {})
            # The UNROUNDED calibrated schedule: the rec's display
            # values are rounded to 4 decimals, which at larger latency
            # batches would induce different ceil(f*B) buffer shapes
            # than the schedule the frontier actually timed.
            fracs = fracs_by_price[rec["k_cpt"]]
            for lb in lat_batches:
                lfn = make_routed_infer_fn(net, lb, capacities=fracs)
                xs = x0[:lb]
                np.asarray(lfn(params, state, xs, price)["ops"])  # compile
                ts = []
                for _ in range(args.latency_calls):
                    t0 = time.perf_counter()
                    np.asarray(lfn(params, state, xs, price)["ops"])
                    ts.append((time.perf_counter() - t0) * 1e3)
                rec["latency_ms"][f"b{lb}"] = {
                    "median": round(float(np.median(ts)), 2),
                    "p90": round(float(np.percentile(ts, 90)), 2)}
            print(json.dumps({"k_cpt": rec["k_cpt"],
                              "latency_ms": rec["latency_ms"]}),
                  flush=True)

    summary = {
        "checkpoint": (os.path.relpath(args.checkpoint, REPO)
                       if os.path.abspath(args.checkpoint).startswith(REPO)
                       else os.path.basename(args.checkpoint)),
        "batch_size": B, "margin": args.margin,
        "measure_passes": args.measure_passes,
        "estimator": "median of timed passes (warm window discarded)",
        "n_programs": len(keys),  # programs referenced by price records
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
