#!/usr/bin/env python3
"""Summarize campaign results: one markdown table row per experiment with
the (moc, test err) sweep endpoints, plus a family-relative outlier
check (VERDICT r4 next #6).

Outlier bar: a member whose test err exceeds OUTLIER_X (3x) the sweep
median is FLAGGED in its row, annotated with the member's identity —
its k_cpt for cost-sweep experiments (registry sweep_k_cpts), its
depth for SR depth-sweeps. A flagged member at one of the two most
aggressive prices is annotated "aggressive price" (the expected family
behavior: high k_cpt prices push routing to the cheapest exits, which
costs accuracy); any other flagged member is marked UNEXPLAINED and
should be retried (tools/retrain_diverged.py) or investigated. This is
deliberately stricter than retrain_diverged's chance+5pp retry bar: a
half-diverged run can sit well below chance while still being 8x its
siblings (the r4 cifar10-ac-fat 0.39-err case).

Usage: python tools/summarize_campaign.py [--nets-dir nets] [--full]
"""

import glob
import os
import sys
from argparse import ArgumentParser
from os.path import basename, join

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

OUTLIER_X = 3.0


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


def member_labels(expt, n):
    """Identity of each sweep member: k_cpt for cost sweeps, chain depth
    for SR depth-sweeps (registry order is the file order). Returns
    (labels, aggressive_idx_set)."""
    try:
        from mpnn_tpu.experiments import make_experiments
        spec = make_experiments().get(expt)
    except Exception:
        spec = None
    ks = getattr(spec, "sweep_k_cpts", None) if spec is not None else None
    if ks and len(ks) >= n:
        labels = [f"k_cpt={k:g}" for k in ks[:n]]
        order = np.argsort(ks[:n])
        return labels, {int(i): "aggressive price" for i in order[-2:]}
    if spec is not None and not ks:
        # SR depth sweeps: the shallowest net's high err is capacity,
        # not divergence.
        return ([f"depth={i + 1}" for i in range(n)],
                {0: "shallowest net (capacity-limited)"})
    # Adaptive dirs (8 per-price snapshots of ONE net) and unknown
    # experiments: assume reference price order for annotation only.
    from mpnn_tpu.experiments import k_cpts
    if n == len(k_cpts):
        return ([f"k_cpt={k:g}" for k in k_cpts],
                {n - 2: "aggressive price", n - 1: "aggressive price"})
    return [f"member={i}" for i in range(n)], {}


def outliers(expt, curve, probe_dir=None):
    """probe_dir: a sibling tree of seed+100 probe retrains
    (`nets-probe/`); a flagged member whose probe result sits within the
    bar is annotated as seed instability instead of UNEXPLAINED."""
    errs = np.asarray([e for _, _, e in curve])
    med = float(np.median(errs))
    labels, expected = member_labels(expt, len(curve))
    flags = []
    for i, (name, _, err) in enumerate(curve):
        if med > 0 and err > OUTLIER_X * med:
            why = expected.get(i)
            if why is None and probe_dir:
                p = os.path.join(probe_dir, expt, f"{name}-stats.npy")
                if os.path.exists(p):
                    d = np.load(p, allow_pickle=True)[()]
                    perr = 1.0 - float(d["stats_ts"]["acc"])
                    why = (f"seed instability — seed+100 probe reaches "
                           f"err {perr:.3f} ({os.path.relpath(p)})"
                           if perr <= OUTLIER_X * med else
                           f"probe retrain ALSO high (err {perr:.3f}) — "
                           f"systematic, investigate")
            if why is None:
                why = "UNEXPLAINED — retry or investigate"
            flags.append(f"{name} ({labels[i]}): err {err:.3f} = "
                         f"{err / med:.1f}x median [{why}]")
    return flags


def main():
    p = ArgumentParser(description=__doc__)
    p.add_argument("--nets-dir", default="nets")
    p.add_argument("--full", action="store_true",
                   help="print every net of each sweep, not just endpoints")
    args = p.parse_args()

    any_unexplained = False
    print("| experiment | nets | err range (test) | moc range | "
          f"outliers (>{OUTLIER_X:g}x median err) |")
    print("|---|---|---|---|---|")
    probe_dir = args.nets_dir.rstrip("/") + "-probe"
    for expt, curve in sweep_rows(args.nets_dir):
        errs = [e for _, _, e in curve]
        mocs = [m for _, m, _ in curve]
        flags = outliers(expt, curve, probe_dir=probe_dir)
        any_unexplained |= any("UNEXPLAINED" in f for f in flags)
        print(f"| {expt} | {len(curve)} | "
              f"{min(errs):.4f} – {max(errs):.4f} | "
              f"{min(mocs):.3g} – {max(mocs):.3g} | "
              f"{'; '.join(flags) if flags else 'none'} |")
    if args.full:
        for expt, curve in sweep_rows(args.nets_dir):
            labels, _ = member_labels(expt, len(curve))
            print(f"\n### {expt}")
            for (name, moc, err), lab in zip(curve, labels):
                print(f"  {name} ({lab}): err={err:.4f} moc={moc:.4g}")
    if any_unexplained:
        print("\nWARNING: unexplained outliers present (see rows above).")


if __name__ == "__main__":
    main()
