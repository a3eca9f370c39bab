#!/usr/bin/env python3
"""Measure the REFERENCE pipeline's throughput on this host + chip.

Round-1's bench divided by an *estimated* reference throughput (1250
img/s). This tool replaces the estimate with a measurement of a faithful
proxy of the reference's hot loop (the thing BASELINE.md's 20x north star
is relative to), run on the same host and the same TPU chip as bench.py:

  - per-image host Python augmentation, exactly the reference's structure
    (/root/reference/scripts/lib/data.py:24-34): one randint draw per
    image, class-mask-gated 50% horizontal flip, +-r pixel shift with
    per-image channel-mean fill, accumulated into a float64 np.empty batch;
  - one device call per training step with the batch fed from host each
    iteration (/root/reference/scripts/train-nets:137-143 feed_dict), fp32
    end-to-end with highest matmul precision (TF1 fp32 parity);
  - a single net (the reference trains its 8-net sweeps serially, so its
    instantaneous rate IS the single-net rate), no scan chaining, no vmap,
    no on-device augmentation;
  - blocking on the step result every iteration (Session.run semantics).

The model math inside the step is our JAX implementation (the TF1 graph
cannot run on TPU at all); if anything this flatters the reference, since
XLA fuses better than TF1 graph mode -- making the resulting vs_baseline
multiplier conservative.

Writes REF_MEASURED.json at the repo root:
  {"images_per_sec": ..., "aug_ms_per_batch": ..., "step_ms": ...,
   "method": ...}
bench.py uses images_per_sec as the vs_baseline denominator when present.

Usage: python tools/ref_proxy_bench.py [--n-steps 100] [--out REF_MEASURED.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def host_rand_shift(img, r, rng):
    """Reference rand_shift semantics (data.py:13-22): shift by (du, dv) ~
    U{-r..r}, vacated pixels take the per-image channel mean."""
    du, dv = rng.randint(-r, r + 1, 2)
    h, w = img.shape[:2]
    out = np.empty_like(img)
    out[:] = img.mean((0, 1))
    src_u = slice(max(du, 0), min(h + du, h))
    src_v = slice(max(dv, 0), min(w + dv, w))
    dst_u = slice(max(-du, 0), min(h - du, h))
    dst_v = slice(max(-dv, 0), min(w - dv, w))
    out[dst_u, dst_v] = img[src_u, src_v]
    return out


def host_augmented_batch(x0, y, m_sym, n, r, rng):
    """Reference augmented_batch semantics (data.py:24-34): per-image
    Python loop, float64 accumulation (np.empty default dtype, as the
    reference does), flip gated on the label's m_sym entry."""
    xb = np.empty((n,) + x0.shape[1:])
    yb = np.empty((n,) + y.shape[1:])
    for i in range(n):
        j = rng.randint(0, len(x0))
        img = x0[j]
        if m_sym[int(np.argmax(y[j]))] and rng.rand() < 0.5:
            img = img[:, ::-1]
        xb[i] = host_rand_shift(img, r, rng)
        yb[i] = y[j]
    return xb, yb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-steps", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "REF_MEASURED.json"))
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu) for debugging")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from mpnn_tpu.utils import jaxcache
    jaxcache.enable(platform=args.platform)
    # TF1 trains in fp32; highest matmul precision = fp32 parity on TPU.
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from mpnn_tpu.experiments import ac_chain, λ_lrn, τ_ds
    from mpnn_tpu.models import (init_training, talr_scale_grads,
                                 momentum_update, Ctx)
    from mpnn_tpu.data import synth

    raw = synth.make_synthetic(n_tr=50000, n_ts=512, h=32, w=32, n_cls=10,
                               seed=0)
    x0_tr = np.asarray(raw["x0_tr"], np.float32)
    y_tr = np.asarray(raw["y_tr"], np.float32)
    m_sym = np.asarray(raw["m_sym"])

    batch = args.batch_size
    net = ac_chain(k_cpt=1e-9)((32, 32, 3), (10,))
    params, state, vel = init_training(net, seed=0)
    from mpnn_tpu.models.steps import _hyper  # NFKC-normalized lookup
    eps_rte = float(_hyper(net, "ϵ", 1e-6))
    mu = float(_hyper(net, "μ_lrn", 0.9))
    alpha_rtr = float(_hyper(net, "α_rtr", 1.0))
    talr = bool(_hyper(net, "talr", True))

    @jax.jit
    def step(params, state, vel, rng, lr, tau, xb, yb):
        ctx = Ctx(train=True, rng=rng, tau=tau, eps=eps_rte,
                  k_cpt=net.hypers.k_cpt)

        def loss_fn(p):
            recs, new_state = net.forward(p, state, xb, yb, ctx)
            c_tot = net.loss(recs, batch, ctx)
            p_tr = {str(l._uid): recs[l].p_tr for l in net.layers
                    if recs[l].p_tr is not None}
            return c_tot, (new_state, p_tr)

        (c_tot, (new_state, p_tr)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        grads = talr_scale_grads(net, grads, p_tr,
                                 alpha_rtr=alpha_rtr, talr=talr)
        params, vel = momentum_update(params, vel, grads, lr, mu)
        return params, new_state, vel, c_tot

    rng_np = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    def one_iter(t):
        # Host aug (float64 accumulation, cast on feed -- feed_dict parity).
        xb, yb = host_augmented_batch(x0_tr, y_tr, m_sym, batch, 4, rng_np)
        xb = xb.astype(np.float32)
        yb = yb.astype(np.float32)
        nonlocal params, state, vel
        params, state, vel, c = step(
            params, state, vel, jax.random.fold_in(key, t),
            np.float32(λ_lrn(t)), np.float32(τ_ds(t)), xb, yb)
        return c

    # Warmup: compile + settle.
    for t in range(3):
        c = one_iter(t)
    c_host = float(np.asarray(c))
    assert np.isfinite(c_host), f"non-finite warmup loss {c_host}"

    # Timed run: block every step (Session.run semantics).
    t0 = time.perf_counter()
    for t in range(3, 3 + args.n_steps):
        c = one_iter(t)
        np.asarray(c)
    dt = time.perf_counter() - t0
    img_per_sec = args.n_steps * batch / dt

    # Decomposition (documentation only): host-aug alone, device step alone.
    ta = time.perf_counter()
    for _ in range(20):
        xb, yb = host_augmented_batch(x0_tr, y_tr, m_sym, batch, 4, rng_np)
    aug_ms = (time.perf_counter() - ta) / 20 * 1e3
    xb32, yb32 = xb.astype(np.float32), yb.astype(np.float32)
    ts = time.perf_counter()
    for t in range(20):
        params, state, vel, c = step(
            params, state, vel, jax.random.fold_in(key, 1000 + t),
            np.float32(1e-3), np.float32(1.0), xb32, yb32)
        np.asarray(c)
    step_ms = (time.perf_counter() - ts) / 20 * 1e3

    result = {
        "images_per_sec": round(img_per_sec, 1),
        "aug_ms_per_batch": round(aug_ms, 2),
        "step_ms": round(step_ms, 2),
        "batch_size": batch,
        "n_steps": args.n_steps,
        "platform": jax.devices()[0].platform,
        "method": (
            "Faithful reference-pipeline proxy measured on this host+chip: "
            "per-image host Python augmentation "
            "(/root/reference/scripts/lib/data.py:24-34) + per-step "
            "host->device feed of a single-net fp32 (highest-precision) "
            "actor-chain train step, blocking each iteration "
            "(scripts/train-nets:137-143). No scan/vmap/device-aug."),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
