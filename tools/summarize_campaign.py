#!/usr/bin/env python3
"""Summarize campaign results: one markdown table row per experiment with
the (moc, test err) sweep endpoints and per-net curves.

Usage: python tools/summarize_campaign.py [--nets-dir nets]
"""

import glob
import os
import sys
from argparse import ArgumentParser
from os.path import basename, join

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def sweep_rows(nets_dir):
    for expt in sorted(os.listdir(nets_dir)):
        files = sorted(glob.glob(join(nets_dir, expt, "*-stats.npy")))
        if not files:
            continue
        curve = []
        for f in files:
            d = np.load(f, allow_pickle=True)[()]
            curve.append((basename(f).split("-")[0],
                          float(d["stats_ts"]["moc"]),
                          1.0 - float(d["stats_ts"]["acc"])))
        yield expt, curve


def main():
    p = ArgumentParser(description=__doc__)
    p.add_argument("--nets-dir", default="nets")
    p.add_argument("--full", action="store_true",
                   help="print every net of each sweep, not just endpoints")
    args = p.parse_args()

    print("| experiment | nets | err range (test) | moc range |")
    print("|---|---|---|---|")
    for expt, curve in sweep_rows(args.nets_dir):
        errs = [e for _, _, e in curve]
        mocs = [m for _, m, _ in curve]
        print(f"| {expt} | {len(curve)} | "
              f"{min(errs):.4f} – {max(errs):.4f} | "
              f"{min(mocs):.3g} – {max(mocs):.3g} |")
    if args.full:
        for expt, curve in sweep_rows(args.nets_dir):
            print(f"\n### {expt}")
            for name, moc, err in curve:
                print(f"  {name}: err={err:.4f} moc={moc:.4g}")


if __name__ == "__main__":
    main()
