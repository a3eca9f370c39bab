#!/usr/bin/env python3
"""TPU step-decomposition ablation (dev tool, not a user CLI).

Times the b128 8-deep actor-chain train loop on the real chip in several
configurations to locate where the step time goes:

  full      -- the bench.py configuration (sampling + flip/shift aug + step)
  no_shift  -- r_shift=0 (kills the one-hot shift einsums; flip remains)

Prints one JSON line per config. Sync via host materialization, never
block_until_ready (axon gotcha, CLAUDE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def time_loop(tag, loop, params, state, vel, args, chunk, n_chunks=4):
    params, state, vel, cs = loop(params, state, vel, 0, *args, chunk)
    np.asarray(cs)  # warmup + compile
    t0 = time.perf_counter()
    t = chunk
    for _ in range(n_chunks):
        params, state, vel, cs = loop(params, state, vel, t, *args, chunk)
        t += chunk
    np.asarray(cs)
    dt = time.perf_counter() - t0
    us = dt / (n_chunks * chunk) * 1e6
    print(json.dumps({"config": tag, "us_per_step": round(us, 1),
                      "img_per_s": round(128 * 1e6 / us)}), flush=True)
    return params, state, vel


def main():
    import jax
    from mpnn_tpu.utils import jaxcache
    jaxcache.enable()
    import jax.numpy as jnp
    from mpnn_tpu.ops import config
    config.set_compute_dtype(jnp.bfloat16)
    config.set_analytic_l2(True)

    from mpnn_tpu.experiments import ac_chain, λ_lrn, τ_ds, batch_size
    from mpnn_tpu.models import Schedules, init_training
    from mpnn_tpu.models.steps import make_train_loop
    from mpnn_tpu.data import Dataset, synth

    ds = Dataset(synth.make_synthetic(n_tr=50000, n_ts=512, h=32, w=32,
                                      n_cls=10, seed=0))
    net = ac_chain(k_cpt=1e-9)(ds.x0_shape, ds.y_shape)
    sched = Schedules(lr=λ_lrn, tau=τ_ds)
    x0_tr, y_tr, m_sym = ds.train_arrays
    rng = jax.random.PRNGKey(0)
    chunk = 250

    for tag, kw in [("full", {}), ("no_shift", {"r_shift": 0})]:
        loop = make_train_loop(net, batch_size, sched, **kw)
        params, state, vel = init_training(net, seed=0)
        time_loop(tag, loop, params, state, vel,
                  (rng, x0_tr, y_tr, m_sym), chunk)

    # Whole 8-net k_cpt sweep vmapped into one program.
    from mpnn_tpu.models.steps import make_sweep_train_loop, stack_trees
    from mpnn_tpu.experiments import k_cpts
    import jax.numpy as jnp
    members = [init_training(net, seed=i) for i in range(len(k_cpts))]
    params_s = stack_trees([m[0] for m in members])
    state_s = stack_trees([m[1] for m in members])
    vel_s = stack_trees([m[2] for m in members])
    k_arr = jnp.asarray(list(k_cpts), jnp.float32)
    sloop = make_sweep_train_loop(net, batch_size, sched)

    def sweep_loop(p, s, v, t0, rng_, x0, y, m, n):
        return sloop(p, s, v, t0, rng_, x0, y, m, n, k_arr)

    p, s, v = params_s, state_s, vel_s
    p, s, v, cs = sweep_loop(p, s, v, 0, rng, x0_tr, y_tr, m_sym, chunk)
    np.asarray(cs)
    t0 = time.perf_counter()
    t = chunk
    for _ in range(4):
        p, s, v, cs = sweep_loop(p, s, v, t, rng, x0_tr, y_tr, m_sym, chunk)
        t += chunk
    np.asarray(cs)
    dt = time.perf_counter() - t0
    us = dt / (4 * chunk) * 1e6
    print(json.dumps({
        "config": "sweep8", "us_per_step": round(us, 1),
        "img_per_s_aggregate": round(len(k_cpts) * 128 * 1e6 / us)}),
        flush=True)


if __name__ == "__main__":
    main()
