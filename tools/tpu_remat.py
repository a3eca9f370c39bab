#!/usr/bin/env python3
"""Remat ablation on the real chip (dev tool).

The vmapped 8-net sweep step is HBM-bandwidth-bound at ~3.2 ms (CLAUDE.md):
46% fusions / 29% BN-moment reduces / convs at 56% MXU peak during their
36%. The backward pass reads stored activations from HBM; jax.checkpoint
trades those reads for recompute FLOPs on a mostly-idle MXU. This times the
bench.py sweep configuration under remat policies:

  none -- store all activations (round-1 bench config)
  dots -- save matmul/conv outputs, recompute elementwise (BN/relu/pool)
  full -- save nothing; backward re-runs the forward

MEASURED 2026-08-17 (v5e single chip): none 3286.2 us/step < dots 3526.1
< full 4109.4. REFUTED: the bf16 activations' backward reads are not the
binding HBM traffic; recompute only adds work. Keep remat OFF for this
workload (ops.config.set_remat(None), the default).

Prints one JSON line per config. Sync via host materialization (axon
gotcha: block_until_ready can return early)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    from mpnn_tpu.utils import jaxcache
    jaxcache.enable()
    import jax.numpy as jnp
    from mpnn_tpu.ops import config
    config.set_compute_dtype(jnp.bfloat16)
    config.set_analytic_l2(True)

    from mpnn_tpu.experiments import ac_chain, λ_lrn, τ_ds, batch_size, \
        k_cpts
    from mpnn_tpu.models import Schedules, init_training
    from mpnn_tpu.models.steps import make_sweep_train_loop, stack_trees
    from mpnn_tpu.data import Dataset, synth

    ds = Dataset(synth.make_synthetic(n_tr=50000, n_ts=512, h=32, w=32,
                                      n_cls=10, seed=0))
    net = ac_chain(k_cpt=0.0)(ds.x0_shape, ds.y_shape)
    sched = Schedules(lr=λ_lrn, tau=τ_ds)
    x0_tr, y_tr, m_sym = ds.train_arrays
    rng = jax.random.PRNGKey(0)
    k_arr = jnp.asarray(list(k_cpts), jnp.float32)
    n_nets = len(k_cpts)
    chunk = 250
    n_chunks = 4

    for tag, policy in [("none", None), ("dots", "dots"), ("full", "full")]:
        config.set_remat(policy)
        loop = make_sweep_train_loop(net, batch_size, sched)
        members = [init_training(net, seed=i) for i in range(n_nets)]
        params_s = stack_trees([m[0] for m in members])
        state_s = stack_trees([m[1] for m in members])
        vel_s = stack_trees([m[2] for m in members])

        params_s, state_s, vel_s, cs = loop(params_s, state_s, vel_s, 0,
                                            rng, x0_tr, y_tr, m_sym, chunk,
                                            k_arr)
        np.asarray(cs)  # compile + warmup
        t0 = time.perf_counter()
        t = chunk
        for _ in range(n_chunks):
            params_s, state_s, vel_s, cs = loop(params_s, state_s, vel_s,
                                                t, rng, x0_tr, y_tr, m_sym,
                                                chunk, k_arr)
            t += chunk
        cs_host = np.asarray(cs)
        dt = time.perf_counter() - t0
        us = dt / (n_chunks * chunk) * 1e6
        assert np.isfinite(cs_host[-1]).all()
        print(json.dumps({
            "config": f"remat={tag}",
            "us_per_step": round(us, 1),
            "img_per_s_aggregate": round(
                batch_size * n_nets * 1e6 / us)}), flush=True)
    config.set_remat(None)


if __name__ == "__main__":
    main()
