#!/usr/bin/env python3
"""Render the routed-inference capacity trade-off figure from a bench
artifact (VERDICT r3 next #3's curve, as a picture).

Reads the `routed_inference.capacity_sweep` field of a BENCH_r{N}.json
(or the JSON line in a bench log) and renders two aligned panels over
capacity: test accuracy (the cost of forced exits) and measured
throughput (the payoff of shrinking the static buffers). The calibrated
per-switch schedule, which has no single scalar capacity, is drawn as a
reference line in both panels.

Usage: python tools/plot_capacity_curve.py [bench.json ...]
       [--out figures/capacity-curve.svg]
Default input: the newest BENCH_r*.json in the repo root, else the
newest nets/campaign-logs/bench*.log.
"""

import argparse
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import mpnn_tpu.viz  # noqa: F401  (pins SOURCE_DATE_EPOCH + svg.hashsalt)
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

INK = "#333333"
MUTED = "#888888"
BLUE = "#2a6ccc"   # single-hue marks; identity is carried by labels


def load_sweep(path):
    """The routed_inference dict from a bench JSON file or log, or None
    if the artifact predates the capacity_sweep field."""
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            ri = rec.get("routed_inference")
            if ri and ri.get("capacity_sweep"):
                return ri
    return None


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("bench", nargs="*", help="bench JSON/log file(s)")
    ap.add_argument("--out", default=os.path.join(REPO, "figures",
                                                  "capacity-curve.svg"))
    args = ap.parse_args()
    paths = args.bench or (
        sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
        + sorted(glob.glob(os.path.join(REPO, "nets", "campaign-logs",
                                        "bench*.log")),
                 key=os.path.getmtime))
    if not paths:
        raise SystemExit("no bench artifact found; pass one explicitly")
    # Newest artifact that actually carries the field (older BENCH files
    # predate capacity_sweep).
    ri = src = None
    for p in reversed(paths):
        ri = load_sweep(p)
        if ri:
            src = p
            break
    if ri is None:
        raise SystemExit("no routed_inference.capacity_sweep in any of: "
                         + ", ".join(paths))
    paths = [src]

    scalar = [e for e in ri["capacity_sweep"]
              if not isinstance(e["capacity"], list)]
    calib = [e for e in ri["capacity_sweep"]
             if isinstance(e["capacity"], list)]
    scalar.sort(key=lambda e: e["capacity"])
    caps = [e["capacity"] for e in scalar]
    acc = [e["accuracy"] for e in scalar]
    ips = [e["images_per_sec"] / 1e3 for e in scalar]
    forced = [e["forced_exits"] for e in scalar]
    dense = ri.get("dense", {}).get("images_per_sec")

    fig, (ax_a, ax_t) = plt.subplots(
        2, 1, figsize=(5.2, 5.4), sharex=True,
        gridspec_kw={"hspace": 0.12})
    for ax in (ax_a, ax_t):
        ax.grid(True, axis="y", color="#dddddd", lw=0.6, zorder=0)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        ax.tick_params(colors=INK, labelsize=9)

    # Panel 1 — accuracy: where forced exits start to cost.
    ax_a.plot(caps, acc, "-o", color=BLUE, lw=2, ms=6, zorder=3)
    for c, a, f in zip(caps, acc, forced):
        if f:
            ax_a.annotate(f"{f} forced exits", (c, a), xytext=(8, -2),
                          textcoords="offset points", fontsize=8,
                          color=INK)
    ax_a.set_ylabel("test accuracy", fontsize=10, color=INK)
    ax_a.set_ylim(min(acc) - 0.03, 1.0)

    # Panel 2 — throughput: the payoff of small static buffers.
    ax_t.plot(caps, ips, "-o", color=BLUE, lw=2, ms=6, zorder=3)
    ax_t.annotate("batch-wide buffers:\nnear-dense compute",
                  (caps[-1], ips[-1]), xytext=(-14, 26),
                  textcoords="offset points", ha="right", fontsize=8,
                  color=INK)
    if dense:
        ax_t.axhline(dense / 1e3, color=MUTED, lw=1.2, ls=":", zorder=2)
        ax_t.annotate("dense (no routing)", (caps[0], dense / 1e3),
                      xytext=(0, 4), textcoords="offset points",
                      fontsize=8, color=MUTED)
    if calib:
        y = calib[-1]["images_per_sec"] / 1e3
        ax_t.axhline(y, color=BLUE, lw=1.2, ls="--", alpha=0.6, zorder=2)
        ax_t.annotate("calibrated per-switch schedule "
                      f"(acc {calib[-1]['accuracy']:.3f})",
                      (caps[0], y), xytext=(0, -11),
                      textcoords="offset points", fontsize=8, color=BLUE)
        ax_a.axhline(calib[-1]["accuracy"], color=BLUE, lw=1.2, ls="--",
                     alpha=0.35, zorder=2)
    ax_t.set_ylabel("throughput (k images/s)", fontsize=10, color=INK)
    ax_t.set_xlabel("capacity factor (fraction of batch per internal "
                    "buffer)", fontsize=10, color=INK)
    ax_t.set_ylim(0, max(ips) * 1.22)
    ax_t.set_xticks(caps)

    ckpt = os.path.basename(str(ri.get("checkpoint", "")))
    fig.suptitle("Routed sparse inference: the capacity trade-off\n"
                 f"({ckpt}, batch {ri.get('batch_size', '?')}, "
                 "TPU v5e single chip)",
                 fontsize=10, color=INK)
    fig.subplots_adjust(top=0.88, bottom=0.10, left=0.13, right=0.97)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    fig.savefig(args.out)
    print(f"wrote {args.out} from {paths[-1]}")


if __name__ == "__main__":
    main()
