#!/usr/bin/env python3
"""Divergence retry policy for campaign experiments (VERDICT r3 next #2).

A handful of sweep members die at the reference's lr=0.1 with specific
seeds (err pinned at chance from the first eval; probed on-chip
2026-08-19: bitwise-identical divergence under fp32-highest, fine under
seed+100 — docs/results-r3.md). The reference's figures contain no dead
nets, so published panels should not either. Policy implemented here:

  1. Scan each experiment's final per-net stats (`NNNN-stats.npy`) for
     members whose test accuracy is below chance + 5pp (random = 1/n_cls,
     read from the descriptor's own p_cor_by_cls width; an additive
     threshold stays meaningful at low class counts, where a multiple of
     chance would flag legitimately-imperfect members — 1.5x chance on
     cifar2 would condemn anything under 75%). Members whose stats were
     preserved by a previous, interrupted retry (a `NNNN-stats-diverged-*`
     file with no canonical `NNNN-stats.npy`) count as dead too, so an
     aborted retrain never leaves a permanently hidden member hole.
  2. Preserve the diverged evidence: stats -> `NNNN-stats-diverged-seed<s>
     .npy`, log -> `NNNN-log-diverged-seed<s>.txt` (both land in the
     committed results/ archive; figure CLIs glob only `NNNN-stats.npy`,
     so panels pick up the retry while the original stays on record).
  3. Retrain that member alone with the experiment seed bumped +100 per
     attempt (net i then inits from seed 100*attempt + i), same budget.
  4. Re-scan; up to --max-attempts (default 2) bumps.

Usage: python tools/retrain_diverged.py [expt ...] [--dry-run]
With no names, scans every experiment directory under nets/ that is in
the registry. Chip-time: one base-width member ~3-6 min at 80k; fat ~8;
fatter ~25.
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def n_classes(desc):
    """Class count straight from the descriptor (first p_cor_by_cls in
    the sink tree), so the chance level needs no dataset lookup."""
    stack = [desc["root"]] if "root" in desc else []
    while stack:
        node = stack.pop()
        for sk in ("stats_tr", "stats_ts"):
            by_cls = node.get(sk, {}).get("p_cor_by_cls")
            if by_cls is not None:
                return len(by_cls)
        stack.extend(node.get("sinks", []))
    return None


def diverged_members(expt_dir):
    """[(index, acc_ts, n_cls)] of members whose final test accuracy is
    below chance + 5pp, plus members left as holes by an interrupted
    retry (preserved `-diverged-` stats but no canonical stats file —
    reported with acc/n_cls of the preserved trajectory)."""
    import glob as _glob
    import re
    out = []
    indices = set()
    for path in _glob.glob(os.path.join(expt_dir, "[0-9]*-stats.npy")):
        m = re.match(r"(\d{4})-stats\.npy$", os.path.basename(path))
        if m:
            indices.add(int(m.group(1)))
    for path in _glob.glob(os.path.join(expt_dir,
                                        "[0-9]*-stats-diverged-*.npy")):
        m = re.match(r"(\d{4})-stats-diverged-", os.path.basename(path))
        if m:
            indices.add(int(m.group(1)))
    for i in sorted(indices):
        path = os.path.join(expt_dir, "%.4i-stats.npy" % i)
        if not os.path.exists(path):
            # Hole from an interrupted retry: report via the newest
            # preserved trajectory so the retry loop picks it back up.
            preserved = sorted(_glob.glob(os.path.join(
                expt_dir, "%.4i-stats-diverged-*.npy" % i)))
            if not preserved:
                continue
            path = preserved[-1]
        desc = np.load(path, allow_pickle=True).item()
        acc = float(desc["stats_ts"]["acc"])
        n_cls = n_classes(desc)
        if n_cls and (acc < 1.0 / n_cls + 0.05
                      or not os.path.exists(
                          os.path.join(expt_dir, "%.4i-stats.npy" % i))):
            out.append((i, acc, n_cls))
    return out


def preserve_diverged(expt_dir, i, seed):
    """Rename the dead member's stats/log out of the glob the figure
    CLIs read, keeping them on record; drop its checkpoint (a chance-
    level net is not worth 5-90 MB of archive).

    The same moves are applied to the committed results/ mirror of this
    experiment (when expt_dir lives under an out-root with a sibling
    results/nets/ archive): otherwise a VM death between this call and
    the next `archive_results.py --include-checkpoints` pass leaves the
    diverged stats/checkpoint under canonical names in results/, and the
    next VM's --restore silently republishes the chance-level member
    into figure panels and bench's checkpoint pick."""
    moves = [("%.4i-stats.npy" % i, "%.4i-stats-diverged-seed%i.npy" % (i, seed)),
             ("%.4i-log.txt" % i, "%.4i-log-diverged-seed%i.txt" % (i, seed)),
             ("%.4i-stats" % i, "%.4i-stats-diverged-seed%i" % (i, seed))]
    out_root = os.path.dirname(os.path.abspath(expt_dir))
    mirror = os.path.join(os.path.dirname(out_root), "results",
                          os.path.basename(out_root),
                          os.path.basename(expt_dir))
    for base in (expt_dir, mirror):
        if not os.path.isdir(base):
            continue
        for src, dst in moves:
            s, d = os.path.join(base, src), os.path.join(base, dst)
            if os.path.exists(s) and not os.path.exists(d):
                os.rename(s, d)
        ckpt = os.path.join(base, "%.4i.npy" % i)
        if os.path.exists(ckpt):
            os.remove(ckpt)


def retrain(expt_name, indices, seed, out_root, n_iter=None,
            train_args=()):
    """Shell out to the train-nets CLI (fresh process per retry) so the
    retried member gets EXACTLY the campaign's config path — precision,
    analytic-L2, compile cache — not a bespoke in-process variant."""
    import subprocess
    cmd = [sys.executable, os.path.join(REPO, "scripts", "train-nets"),
           expt_name, "--seed", str(seed), "--out-root", out_root]
    for i in indices:
        cmd += ["--net", str(i)]
    if n_iter is not None:
        cmd += ["--n-iter", str(n_iter)]
    cmd += list(train_args)
    subprocess.run(cmd, check=True)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("expts", nargs="*",
                   help="experiment names (default: every registry "
                        "experiment with a directory under nets/)")
    p.add_argument("--out-root", default=os.path.join(REPO, "nets"))
    p.add_argument("--n-iter", type=int, default=None,
                   help="override budget (default: registry 80k)")
    p.add_argument("--max-attempts", type=int, default=2)
    p.add_argument("--dry-run", action="store_true",
                   help="report dead members, change nothing")
    p.add_argument("--train-arg", action="append", dest="train_args",
                   default=None,
                   help="extra train-nets CLI flag per use (default: "
                        "--precision bf16 --analytic-l2, the campaign "
                        "config)")
    args = p.parse_args()
    train_args = (args.train_args if args.train_args is not None
                  else ["--precision", "bf16", "--analytic-l2"])

    from mpnn_tpu import experiments as cfg
    registry = cfg.make_experiments()
    names = args.expts or sorted(
        n for n in registry
        if os.path.isdir(os.path.join(args.out_root, n)))

    any_retrained = False
    for name in names:
        if name not in registry:
            print("skip %s: not a train-nets registry experiment" % name)
            continue
        expt_dir = os.path.join(args.out_root, name)
        for attempt in range(1, args.max_attempts + 1):
            dead = diverged_members(expt_dir)
            if not dead:
                break
            seed = 100 * attempt
            for i, acc, n_cls in dead:
                print("%s net %i: acc_ts %.4f < 1.5/%i chance -> %s "
                      "retry with seed %i"
                      % (name, i, acc, n_cls,
                         "would" if args.dry_run else "will", seed + i))
            if args.dry_run:
                break
            prev_seed = 100 * (attempt - 1)
            for i, _, _ in dead:
                preserve_diverged(expt_dir, i, prev_seed + i)
            retrain(name, [i for i, _, _ in dead], seed, args.out_root,
                    n_iter=args.n_iter, train_args=train_args)
            any_retrained = True
        else:
            if not args.dry_run and diverged_members(expt_dir):
                print("%s: still has dead members after %i attempts"
                      % (name, args.max_attempts))
    if args.dry_run or not any_retrained:
        print("done (no retraining performed)" if not any_retrained
              else "done")
    else:
        print("done; re-run figure CLIs + "
              "`archive_results.py --include-checkpoints` to publish")
    return 0


if __name__ == "__main__":
    sys.exit(main())
