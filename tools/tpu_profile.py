#!/usr/bin/env python3
"""Capture a jax.profiler trace of the bench train loop on the real chip
and print the top device ops by self time (dev tool).

Usage: python tools/tpu_profile.py [outdir] [--sweep] [--tree] [--stacked]
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def capture(outdir):
    import jax
    from mpnn_tpu.utils import jaxcache
    jaxcache.enable()
    import jax.numpy as jnp
    from mpnn_tpu.ops import config
    config.set_compute_dtype(jnp.bfloat16)

    from mpnn_tpu.experiments import ac_chain, λ_lrn, τ_ds, batch_size
    from mpnn_tpu.models import Schedules, init_training
    from mpnn_tpu.models.steps import make_train_loop
    from mpnn_tpu.data import Dataset, synth

    config.set_analytic_l2(True)

    ds = Dataset(synth.make_synthetic(n_tr=50000, n_ts=512, h=32, w=32,
                                      n_cls=10, seed=0))
    if "--stacked" in sys.argv:
        # Congruent-tail vmapped-template formulation (chain leaf groups
        # or tree tails; composes with --tree and --sweep).
        config.set_stacked_tails(True)
    if "--tree" in sys.argv:
        # Single-tree step (the train-adaptive-nets shape).
        from mpnn_tpu.experiments import ac_tree
        net = ac_tree(k_cpt=1e-9)(ds.x0_shape, ds.y_shape)
        chunk = 50
    else:
        net = ac_chain(k_cpt=1e-9)(ds.x0_shape, ds.y_shape)
        chunk = 250
    sched = Schedules(lr=λ_lrn, tau=τ_ds)
    x0_tr, y_tr, m_sym = ds.train_arrays
    rng = jax.random.PRNGKey(0)

    if "--sweep" in sys.argv:
        from mpnn_tpu.models.steps import make_sweep_train_loop, stack_trees
        from mpnn_tpu.experiments import k_cpts
        members = [init_training(net, seed=i) for i in range(len(k_cpts))]
        p = stack_trees([m[0] for m in members])
        s = stack_trees([m[1] for m in members])
        v = stack_trees([m[2] for m in members])
        k_arr = jnp.asarray(list(k_cpts), jnp.float32)
        sloop = make_sweep_train_loop(net, batch_size, sched)
        p, s, v, cs = sloop(p, s, v, 0, rng, x0_tr, y_tr, m_sym, chunk,
                            k_arr)
        np.asarray(cs)
        jax.profiler.start_trace(outdir)
        p, s, v, cs = sloop(p, s, v, chunk, rng, x0_tr, y_tr, m_sym,
                            chunk, k_arr)
        np.asarray(cs)
        jax.profiler.stop_trace()
        print("sweep trace written to", outdir, flush=True)
        return

    loop = make_train_loop(net, batch_size, sched)
    params, state, vel = init_training(net, seed=0)

    params, state, vel, cs = loop(params, state, vel, 0, rng,
                                  x0_tr, y_tr, m_sym, chunk)
    np.asarray(cs)  # warmup/compile sync (axon: no block_until_ready)

    jax.profiler.start_trace(outdir)
    params, state, vel, cs = loop(params, state, vel, chunk, rng,
                                  x0_tr, y_tr, m_sym, chunk)
    np.asarray(cs)
    jax.profiler.stop_trace()
    print("trace written to", outdir, flush=True)


def report(outdir, top=40):
    """Aggregate device-lane op self-times from the chrome trace."""
    js = sorted(glob.glob(os.path.join(outdir, "**/*.trace.json.gz"),
                          recursive=True))
    if not js:
        print("no trace.json.gz under", outdir)
        return
    with gzip.open(js[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Device lanes: process names containing 'TPU' (not the python host).
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n.upper() or "/device" in n.lower()}
    agg = {}
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "?")
            dur = float(e.get("dur", 0.0))
            # Skip lane-level containers (steps, modules)
            if name.startswith("jit_") or "module" in name.lower():
                continue
            a = agg.setdefault(name, [0.0, 0])
            a[0] += dur
            a[1] += 1
            total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
    print(f"{'op':<64}{'total_ms':>10}{'count':>8}{'%':>7}")
    for name, (dur, cnt) in rows:
        print(f"{name[:63]:<64}{dur/1e3:>10.2f}{cnt:>8}"
              f"{100*dur/max(total,1e-9):>7.1f}")
    print(f"device op total: {total/1e3:.2f} ms "
          f"(pids: {sorted(pid_names.items())})")


if __name__ == "__main__":
    # outdir is the first non-flag argument (flags like --tree/--stacked/
    # --sweep may come in any position).
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    outdir = pos[0] if pos else "/tmp/mpnn_trace"
    capture(outdir)
    try:
        report(outdir)
    except Exception as e:
        print("report failed:", e)
