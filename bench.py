#!/usr/bin/env python3
"""Benchmark: actor-net sweep training throughput on the real chip.

Measures the BASELINE.json headline workload -- the reference's train-nets
AC experiment, which trains EIGHT 8-deep dynamically-routed chains sweeping
k_cpt (reference scripts/train-nets:31-35, scripts/arch_and_hypers.py:15) --
as the framework actually runs it: the whole sweep vmapped into one
compiled program (mpnn_tpu.models.steps.make_sweep_train_loop), batch 128
per net, full augmentation, routing, TALR and momentum per step.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md).
The driver's north star is >=20x the TF1 reference's images/sec/chip. The
denominator is MEASURED on this same host+chip by tools/ref_proxy_bench.py
-- a faithful proxy of the reference's hot loop (per-image host Python
augmentation, per-step host->device feed, single-net fp32
highest-precision step, blocking every iteration; reference
scripts/train-nets:137-143 + scripts/lib/data.py:24-34) -- and read from
REF_MEASURED.json (672.4 img/s measured 2026-08-17; the sweep trains
serially in the reference, so its instantaneous rate IS the single-net
rate). We report value / (20 * ref), so vs_baseline >= 1.0 means the 20x
north-star target is met. Falls back to the round-1 estimate of 1250
img/s only if REF_MEASURED.json is missing.

Measured v5e single-chip reference points: single-net loop 182k img/s
(0.70 ms/step); vmapped 8-net sweep 319k img/s aggregate (3.2 ms/step,
HBM-bandwidth-bound; docs/results-r1.md).
"""

import json
import os
import time

import numpy as np

NORTH_STAR_MULT = 20.0


def ref_images_per_sec():
    """Measured reference-pipeline throughput (tools/ref_proxy_bench.py);
    falls back to the round-1 estimate if the measurement file is absent."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "REF_MEASURED.json")
    try:
        with open(path) as f:
            return float(json.load(f)["images_per_sec"])
    except (OSError, KeyError, ValueError):
        return 1250.0


def measure_routed_inference(n_batches=10, batch_size=1024,
                             checkpoint=None, data=None):
    """Second half of BASELINE.json's metric: routed sparse inference
    throughput + realized mean op count vs dense masked eval
    (mpnn_tpu.models.infer; scripts/infer-bench is the standalone CLI).

    Uses the newest trained flagship chain checkpoint under nets/ when one
    exists (routing then reflects a trained distribution); falls back to a
    fresh init so the bench works on a blank VM. `checkpoint`/`data`
    override both (tools/dense_crossover.py measures the width ladder
    with them). Returns a dict for the `routed_inference` field of the
    ONE output JSON line, or None if anything fails (the train metric
    must never be lost to this)."""
    import glob
    import time

    import jax
    import jax.numpy as jnp
    from mpnn_tpu.models import init_training
    from mpnn_tpu.models.infer import make_routed_infer_fn, \
        calibrate_capacities
    from mpnn_tpu.utils.serdes import read_net

    here = os.path.dirname(os.path.abspath(__file__))
    ckpt = checkpoint
    # Mid-sweep member (0004 = fifth k_cpt price) of the flagship AC
    # experiments: a net whose trained router actually exits early.
    if ckpt is None:
        for pat in ("nets/hybrid-ac/0004.npy", "nets/synth-ac/0004.npy",
                    "nets/hybrid-ac/000?.npy", "nets/*/000?.npy"):
            hits = sorted(glob.glob(os.path.join(here, pat)))
            if hits:
                # Wildcard fallbacks: take the MIDDLE of the sorted hits,
                # not hits[0] — member 0000 is the k_cpt=0 net whose
                # router has no incentive to exit early (its "savings"
                # would be ~0).
                ckpt = hits[len(hits) // 2]
                break
    if ckpt is not None:
        try:
            net, params, state, _ = read_net(ckpt)
        except Exception:
            if checkpoint is not None:
                # An EXPLICITLY requested checkpoint must not silently
                # fall back to a fresh base-width init — the caller
                # (e.g. tools/dense_crossover.py) would publish rows
                # labeled with a net that was never measured.
                raise
            ckpt = None
    if ckpt is None:
        from mpnn_tpu.experiments import ac_chain
        net = ac_chain(k_cpt=1e-9)((32, 32, 3), (10,))
        params, state, _ = init_training(net, seed=0)

    data = data or os.path.join(here, "data", "hybrid.npz")
    y_cls = None  # (B,) int class labels when real test data is available
    x0_cal = None  # held-out (train-split) batch for capacity calibration
    if os.path.exists(data):
        from mpnn_tpu.data import Dataset
        ds = Dataset(data, device_put=False)
        reps = -(-batch_size // len(ds.x0_ts))
        x0 = jnp.asarray(np.tile(ds.x0_ts, (reps, 1, 1, 1))[:batch_size])
        y_cls = np.argmax(np.tile(np.asarray(ds.y_ts), (reps, 1))
                          [:batch_size], axis=1)
        if len(ds.x0_tr) >= batch_size:
            x0_cal = jnp.asarray(ds.x0_tr[:batch_size])
    else:
        rng = np.random.RandomState(0)
        x0 = jnp.asarray(
            rng.rand(batch_size, *net.hypers.x0_shape).astype(np.float32))

    out = {"checkpoint": os.path.relpath(ckpt, here) if ckpt else None,
           "batch_size": batch_size}

    # Dense baseline: what the reference pays at eval -- EVERY branch for
    # every example (scripts/lib/net_types.py:127-129; routing only masks
    # the statistics). One jitted all-branches forward; the checksum over
    # every leaf's error head + router logits keeps all paths alive.
    from mpnn_tpu.models.net import Ctx
    y_dummy = jnp.zeros((batch_size,) + tuple(net.hypers.y_shape),
                        jnp.float32)

    @jax.jit
    def dense_fwd(params, state, x0):
        ctx = Ctx(train=False, rng=None, tau=1.0, eps=1e-6,
                  k_cpt=getattr(net.hypers, "k_cpt", 0.0))
        recs, _ = net.forward(params, state, x0, y_dummy, ctx)
        acc = 0.0
        for r in recs.values():
            for v in jax.tree.leaves((r.x, r.c_err, r.router_x)):
                if hasattr(v, "astype"):
                    acc = acc + jnp.sum(v.astype(jnp.float32))
        return acc

    np.asarray(dense_fwd(params, state, x0))  # compile + settle
    acc = 0.0
    for _ in range(max(2, n_batches // 2)):  # throwaway warm window
        acc = acc + dense_fwd(params, state, x0)
    np.asarray(acc)
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(n_batches):
        acc = acc + dense_fwd(params, state, x0)
    np.asarray(acc)  # sync bounds all device work (see timing note above)
    dt = time.perf_counter() - t0
    dense_ops = float(sum(
        node.n_ops + (node.router.n_ops if node.router is not None else 0.0)
        for node in net.layers))
    out["dense"] = {"images_per_sec": round(n_batches * batch_size / dt, 1),
                    "mean_ops_per_example": dense_ops}

    # Routed sparse inference across a capacity sweep: realize the savings
    # the router promises AND measure the MoE trade-off the engine implies
    # (VERDICT r3 next #3) -- as capacity shrinks, overflow examples are
    # force-exited through early heads, trading accuracy for throughput.
    # Cap 1.0 reproduces dense hard routing exactly (same exits), so its
    # accuracy IS the dense eval accuracy.
    # Calibrated per-switch capacities (models/infer.calibrate_capacities):
    # fit the static buffer schedule to the trained routing distribution on
    # a HELD-OUT train-split batch, then serve the test batch with it. At
    # cap 1.0 the buffers stay batch-wide and routed inference executes
    # near-dense compute; calibration converts the realized-ops savings
    # into wall-clock savings at (margin-protected) near-zero forced exits.
    caps = [1.0, 0.75, 0.5, 0.25]
    if x0_cal is not None:
        try:
            caps.append(calibrate_capacities(net, params, state, x0_cal))
        except Exception as e:
            out["calibration_error"] = f"{type(e).__name__}: {e}"
    out["capacity_sweep"] = []
    # Compile + WARM every program before timing any: the first program
    # executed right after its (remote) compile is depressed by the
    # tunnel's cold transfer/dispatch path — r4's driver window recorded
    # the calibrated entry at 130.5k vs its 182k warm ledger value
    # (VERDICT r4 weak #4). A throwaway half-window per program brings
    # pass-1 timing to steady state.
    progs = []
    for cap in caps:
        infer = make_routed_infer_fn(net, batch_size, capacities=cap)
        r = infer(params, state, x0, None)
        np.asarray(r["ops"])  # sync after compile
        progs.append((cap, infer))
    for cap, infer in progs:
        acc = 0.0
        for _ in range(max(2, n_batches // 2)):
            acc = acc + jnp.sum(infer(params, state, x0, None)["ops"])
        np.asarray(acc)
    for cap, infer in progs:
        r = infer(params, state, x0, None)
        np.asarray(r["ops"])
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(n_batches):
            r = infer(params, state, x0, None)
            # Chain a value through every batch: the final sync must
            # depend on ALL the work (axon block_until_ready returns
            # early; same pattern as the dense loop above).
            acc = acc + jnp.sum(r["ops"])
        np.asarray(acc)  # sync bounds all device work
        dt = time.perf_counter() - t0
        ops = np.asarray(r["ops"])
        forced = np.asarray(r["forced"])
        entry = {"capacity": (cap if np.isscalar(cap)
                              else [round(f, 4) for f in cap]),
                 "images_per_sec": round(n_batches * batch_size / dt, 1),
                 "mean_ops_per_example": float(ops.mean()),
                 "forced_exits": int(forced.sum()),
                 "forced_per_switch": forced.tolist()}
        if y_cls is not None:
            pred = np.argmax(np.asarray(r["probs"]), axis=1)
            entry["accuracy"] = round(float(np.mean(pred == y_cls)), 4)
        out["capacity_sweep"].append(entry)
        if np.isscalar(cap) and cap == 1.0:  # keep r2/r3 summary keys
            out["routed"] = {"images_per_sec": entry["images_per_sec"],
                             "mean_ops_per_example":
                                 entry["mean_ops_per_example"]}
    if dense_ops:
        out["flops_savings_vs_dense"] = round(
            1.0 - out["routed"]["mean_ops_per_example"] / dense_ops, 4)
    return out


def main():
    from mpnn_tpu.utils import jaxcache
    jaxcache.wait_for_backend()  # ride out transient TPU-tunnel outages
    import jax
    jaxcache.enable()
    import jax.numpy as jnp

    # bf16 activations end-to-end (fp32 master params, fp32 loss/stats
    # islands) + analytic weight-L2 (gradient-exact; tests/test_analytic_l2).
    from mpnn_tpu.ops import config
    config.set_compute_dtype(jnp.bfloat16)
    config.set_analytic_l2(True)
    # Measurement knob: stack the chain's congruent early-exit LogReg
    # leaves (4 pairs) into vmapped templates. Measured NEUTRAL on-chip
    # (317.1k vs 319.3k img/s plain -- the tiny head matmuls are already
    # amortized by the sweep vmap; docs/perf.md), so the production path
    # keeps it off.
    if os.environ.get("MPNN_BENCH_STACKED") == "1":
        config.set_stacked_tails(True)

    from mpnn_tpu.experiments import ac_chain, λ_lrn, τ_ds, batch_size, \
        k_cpts
    from mpnn_tpu.models import Schedules, init_training
    from mpnn_tpu.models.steps import make_sweep_train_loop, stack_trees
    from mpnn_tpu.data import Dataset, synth

    # CIFAR-10-shaped synthetic data (50k train images, 32x32x3, 10 classes).
    ds = Dataset(synth.make_synthetic(n_tr=50000, n_ts=512, h=32, w=32,
                                      n_cls=10, seed=0))
    net = ac_chain(k_cpt=0.0)(ds.x0_shape, ds.y_shape)
    n_nets = len(k_cpts)
    members = [init_training(net, seed=i) for i in range(n_nets)]
    params_s = stack_trees([m[0] for m in members])
    state_s = stack_trees([m[1] for m in members])
    vel_s = stack_trees([m[2] for m in members])
    k_arr = jnp.asarray(list(k_cpts), jnp.float32)

    sched = Schedules(lr=λ_lrn, tau=τ_ds)
    loop = make_sweep_train_loop(net, batch_size, sched)
    x0_tr, y_tr, m_sym = ds.train_arrays
    rng = jax.random.PRNGKey(0)

    chunk = 250
    # Warmup: compile + settle. NOTE: sync via host materialization --
    # block_until_ready has been observed returning early on tunneled
    # (axon) backends, which silently corrupts timings.
    params_s, state_s, vel_s, cs = loop(params_s, state_s, vel_s, 0, rng,
                                        x0_tr, y_tr, m_sym, chunk, k_arr)
    np.asarray(cs)

    n_chunks = 4
    t0 = time.perf_counter()
    t = chunk
    for _ in range(n_chunks):
        params_s, state_s, vel_s, cs = loop(params_s, state_s, vel_s, t,
                                            rng, x0_tr, y_tr, m_sym, chunk,
                                            k_arr)
        t += chunk
    # Chunk N+1 depends on chunk N's params, so materializing the last
    # chunk's losses bounds all device work.
    cs_host = np.asarray(cs)
    dt = time.perf_counter() - t0

    assert np.isfinite(cs_host[-1]).all(), f"non-finite loss {cs_host[-1]}"
    value = n_chunks * chunk * batch_size * n_nets / dt

    # Second half of BASELINE.json's metric string (VERDICT r2 Missing #5):
    # routed-inference images/sec + realized mean FLOPs, same JSON line.
    try:
        routed = measure_routed_inference()
    except Exception as e:  # the train metric must never be lost to this
        routed = {"error": f"{type(e).__name__}: {e}"}

    print(json.dumps({
        "metric": "cifar10-ac k_cpt-sweep train throughput "
                  "(8 nets x 8-deep actor chain, b128/net, vmapped)",
        "value": round(value, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / (NORTH_STAR_MULT * ref_images_per_sec()),
                             3),
        "routed_inference": routed,
    }))


if __name__ == "__main__":
    main()
