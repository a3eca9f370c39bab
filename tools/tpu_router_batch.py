#!/usr/bin/env python3
"""Microbench: per-node router MLPs as separate tiny matmuls vs one
padded batched stack (dev tool; round-2 decision datum).

The profiled chain-sweep step spends ~19.5% (~625 us of 3.21 ms) in tiny
router/exit-head matmuls: per net, 7 switch routers (dense F_i->16 ->
dense 16->16 -> dense 16->2) and 8 exit heads, each its own XLA op. Only
the FIRST dense differs in shape across nodes, so all 7 routers can run
as ONE stacked matmul batch if inputs are zero-padded to max(F_i).

This tool times, vmapped over an 8-net sweep axis, fwd+grad of:
  separate -- 7 independent router stacks (the current formulation)
  batched  -- one (7, 8, B, Fmax) padded stack

If batched wins big, restructuring Net.forward to defer+batch routers is
worth round-2 effort; if not, the dispatch overhead is already hidden.
"""

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

    B = 128
    N = 8                       # sweep width (vmapped nets)
    Fs = [256, 256, 512, 512, 1024, 1024, 2048]   # per-node router in-dims
    Fmax = max(Fs)
    H, OUT = 16, 2
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    def mk(shape):
        nonlocal key
        key, k = jax.random.split(key)
        return jax.random.normal(k, shape, jnp.float32)

    # Separate formulation: per-node param pytrees, vmapped over nets.
    sep_params = [
        dict(w0=mk((N, F, H)), w1=mk((N, H, H)), w2=mk((N, H, OUT)))
        for F in Fs]
    sep_xs = [mk((N, B, F)) for F in Fs]

    def router(p, x):
        h = jnp.maximum(x.astype(dt) @ p["w0"].astype(dt), 0)
        h = jnp.maximum(h @ p["w1"].astype(dt), 0)
        return (h @ p["w2"].astype(dt)).astype(jnp.float32)

    def sep_loss(params, xs):
        tot = 0.0
        for p, x in zip(params, xs):
            out = jax.vmap(router)(p, x)
            tot = tot + jnp.sum(jnp.square(out))
        return tot

    # Batched formulation: zero-pad every router input to Fmax and stack.
    bat_params = dict(
        w0=jnp.stack([jnp.pad(p["w0"], ((0, 0), (0, Fmax - F), (0, 0)))
                      for p, F in zip(sep_params, Fs)]),
        w1=jnp.stack([p["w1"] for p in sep_params]),
        w2=jnp.stack([p["w2"] for p in sep_params]))
    bat_x = jnp.stack([jnp.pad(x, ((0, 0), (0, 0), (0, Fmax - F)))
                       for x, F in zip(sep_xs, Fs)])   # (7, N, B, Fmax)

    def bat_loss(params, x):
        out = jax.vmap(jax.vmap(router))(params, x)    # over (node, net)
        return jnp.sum(jnp.square(out))

    # Shape-grouped formulation (VERDICT r3 next #4 -- the variant the
    # padded refutation left open): stack ONLY same-F routers, no padding.
    # Work is identical to `separate`; the only possible win is the
    # dispatch/launch slice (7 -> 4 op groups). sum(F_i) stays 6656.
    grp_params, grp_xs = [], []
    for F in sorted(set(Fs)):
        idx = [i for i, Fi in enumerate(Fs) if Fi == F]
        grp_params.append(dict(
            w0=jnp.stack([sep_params[i]["w0"] for i in idx]),
            w1=jnp.stack([sep_params[i]["w1"] for i in idx]),
            w2=jnp.stack([sep_params[i]["w2"] for i in idx])))
        grp_xs.append(jnp.stack([sep_xs[i] for i in idx]))  # (g, N, B, F)

    def grp_loss(params, xs):
        tot = 0.0
        for p, x in zip(params, xs):
            out = jax.vmap(jax.vmap(router))(p, x)     # over (group, net)
            tot = tot + jnp.sum(jnp.square(out))
        return tot

    sep_g = jax.jit(jax.grad(sep_loss))
    bat_g = jax.jit(jax.grad(bat_loss))
    grp_g = jax.jit(jax.grad(grp_loss))

    def bench(tag, f, *args):
        g = f(*args)
        np.asarray(jax.tree.leaves(g)[0])      # compile + sync
        n = 200
        t0 = time.perf_counter()
        for _ in range(n):
            g = f(*args)
        np.asarray(jax.tree.leaves(g)[0])
        us = (time.perf_counter() - t0) / n * 1e6
        print(json.dumps({"config": tag, "us_per_call": round(us, 1)}),
              flush=True)
        return us

    us_sep = bench("separate 7 routers (fwd+bwd, vmap8)", sep_g,
                   sep_params, sep_xs)
    us_bat = bench("batched padded stack (fwd+bwd, vmap8)", bat_g,
                   bat_params, bat_x)
    us_grp = bench("shape-grouped pad-free stacks (fwd+bwd, vmap8)", grp_g,
                   grp_params, grp_xs)
    print(json.dumps({"padded_speedup_vs_separate":
                      round(us_sep / us_bat, 2),
                      "grouped_speedup_vs_separate":
                      round(us_sep / us_grp, 2)}))


if __name__ == "__main__":
    main()
