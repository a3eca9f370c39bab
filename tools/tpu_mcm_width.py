#!/usr/bin/env python3
"""Pallas fused-MCM economics vs channel width (dev tool).

The round-1 verdict (ops/kernels.py docstring): at the base arch's 3-16
channels the fused kernel is 4x SLOWER than XLA convs (lane padding).
docs/perf.md closes the Pallas item 'unless the net family changes —
revisit at n_chan >= 128'. The width-scaled registry variants (fat: 32-256
chan, fatter: 48-384) ARE that change; this measures both paths across
the width ladder.

Per config: a 2-scale MCM stage (H=16/8, C_in = C_out = C, supp 3, b128
bf16), forward only (the production kernel is forward-only; backward
routes through XLA either way), K=50 iterations inside one jitted scan
so dispatch is amortized. Sync via host materialization (axon gotcha).

Prints one JSON line per (C, path)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = 128
H = 16
K = 50
SUPP = 3


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from mpnn_tpu.utils import jaxcache
    jaxcache.enable()
    from mpnn_tpu.ops import config
    from mpnn_tpu.ops.kernels import mcm_xla, fused_mcm_forward

    config.set_compute_dtype(jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    for C in (16, 64, 128, 256, 384):
        ks = jax.random.split(key, 8)
        xs = [jax.random.normal(ks[0], (B, H, H, C), jnp.bfloat16),
              jax.random.normal(ks[1], (B, H // 2, H // 2, C),
                                jnp.bfloat16)]
        whs = [jax.random.normal(ks[2], (SUPP, SUPP, C, C), jnp.float32)
               * 0.02,
               jax.random.normal(ks[3], (SUPP, SUPP, C, C), jnp.float32)
               * 0.02]
        wvs = [jax.random.normal(ks[4], (SUPP, SUPP, C, C), jnp.float32)
               * 0.02]
        bs = [jnp.zeros((C,), jnp.float32), jnp.zeros((C,), jnp.float32)]

        # Wide channels blow VMEM at batch_tile=4; scale the tile down so
        # one tile's pyramid + fp32 accumulators stay within budget.
        tile = max(1, min(4, (64 * 16 * 16) // (H * H * max(C // 16, 1))))

        # The scan body must DEPEND on the carry (the first version didn't:
        # XLA hoisted the loop-invariant stage out of the scan and all
        # configs measured a flat ~560 us of dispatch+sync, C-independent).
        # Feed the previous output back into the finest input scale.
        def run_xla(xs):
            def body(c, _):
                o = mcm_xla([xs[0] + c, xs[1]], whs, wvs, bs)
                return o[0].astype(xs[0].dtype), None
            s, _ = lax.scan(body, jnp.zeros_like(xs[0]), None, length=K)
            return s.astype(jnp.float32).sum()

        def run_pallas(xs):
            def body(c, _):
                o = fused_mcm_forward([xs[0] + c, xs[1]], whs, wvs, bs,
                                      SUPP, batch_tile=tile)
                return o[0].astype(xs[0].dtype), None
            s, _ = lax.scan(body, jnp.zeros_like(xs[0]), None, length=K)
            return s.astype(jnp.float32).sum()

        for tag, fn in (("xla", run_xla), ("pallas", run_pallas)):
            try:
                f = jax.jit(fn)
                out = f(xs)
                np.asarray(out)  # compile + sync
                t0 = time.perf_counter()
                np.asarray(f(xs))
                dt = (time.perf_counter() - t0) / K * 1e6
                print(json.dumps({"C": C, "path": tag,
                                  "batch_tile": tile if tag == "pallas"
                                  else None,
                                  "us_per_stage_fwd": round(dt, 1)}),
                      flush=True)
            except Exception as e:  # OOM/VMEM at the widest configs
                print(json.dumps({"C": C, "path": tag,
                                  "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
