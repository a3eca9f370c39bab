#!/usr/bin/env python3
"""Ensure the TPU is idle before the driver's BENCH window.

A lingering TPU client (a campaign trainer, a forgotten bench) contends
with the driver's end-of-round BENCH_r{N} run (CLAUDE.md). This tool
stops any repo-started background work recorded in pidfiles —
/tmp/*.pid, written by every `... & echo $! > /tmp/x.pid` launch — by
killing each recorded pid AND its descendant tree (a campaign shell's
python child would otherwise survive). Pids are killed exactly, never
by pattern (a pattern can match the calling shell itself and end the
session). Afterwards it pings the chip with a small matmul in a fresh
subprocess and reports readiness.

Usage: python tools/idle_chip.py [--no-ping]
"""

import argparse
import glob
import os
import signal
import subprocess
import sys
import time


def descendants(pid):
    """Transitive children of pid via /proc (pgrep -P equivalent,
    recursive)."""
    kids = []
    try:
        out = subprocess.run(["ps", "-o", "pid=", "--ppid", str(pid)],
                             capture_output=True, text=True).stdout
    except OSError:
        return kids
    for line in out.split():
        child = int(line)
        kids.append(child)
        kids.extend(descendants(child))
    return kids


def kill_tree(pid, grace=10.0):
    """SIGTERM the tree, poll for actual exit up to `grace` seconds,
    SIGKILL only what is still alive. (os.kill succeeding only means the
    process existed at signal time — liveness must be re-checked, or a
    cleanly-exiting trainer gets a pointless SIGKILL aimed at a pid that
    may already have been recycled.)"""
    tree = [pid] + descendants(pid)
    alive = []
    for p in tree:
        try:
            os.kill(p, signal.SIGTERM)
            alive.append(p)
        except ProcessLookupError:
            pass
    deadline = time.monotonic() + grace
    while alive and time.monotonic() < deadline:
        time.sleep(0.2)
        still = []
        for p in alive:
            try:
                os.kill(p, 0)
                still.append(p)
            except ProcessLookupError:
                pass
        alive = still
    for p in alive:
        try:
            os.kill(p, signal.SIGKILL)
        except ProcessLookupError:
            pass
    return tree


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--no-ping", action="store_true")
    ap.add_argument("--pidfiles", nargs="*",
                    default=sorted(glob.glob("/tmp/*.pid")))
    args = ap.parse_args()

    me = os.getpid()
    protected = {me, os.getppid()}
    for f in args.pidfiles:
        try:
            pid = int(open(f).read().strip())
        except (OSError, ValueError):
            continue
        if pid in protected:
            print(f"  [skip {f}: pid {pid} is this session]")
            continue
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            os.remove(f)
            continue
        tree = kill_tree(pid)
        os.remove(f)
        print(f"  [stopped pid tree {tree} from {f}]")

    if args.no_ping:
        return 0
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(os.path.dirname(os.path.dirname(
                       os.path.abspath(__file__))), ".jax_cache"))
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, numpy as np, jax.numpy as jnp;"
             "np.asarray(jnp.ones((64, 64)) @ jnp.ones((64, 64)));"
             "print('chip ok:', jax.devices())"],
            capture_output=True, text=True, timeout=600, env=env)
        print(r.stdout.strip() or r.stderr.strip().splitlines()[-1])
        return r.returncode
    except subprocess.TimeoutExpired:
        print("chip ping timed out (600s) — tunnel outage?")
        return 1


if __name__ == "__main__":
    sys.exit(main())
