#!/usr/bin/env python3
"""Benchmark: actor-net training throughput on the real chip.

Measures the BASELINE.json headline metric -- CIFAR-10-shaped actor-net
training images/sec/chip -- on the flagship 8-deep dynamically-routed chain
(reference scripts/arch_and_hypers.py:88-97) with the reference's batch size
128, full augmentation, routing, TALR and momentum in one jitted step.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md).
The driver's north star is >=20x the TF1 reference's images/sec/chip. We
take 1250 img/s as the reference estimate (batch 128 at ~10 steps/s for a
TF1 feed_dict + per-image-Python-augmentation pipeline on a contemporary
GPU -- the pipeline, not the GPU, was the bottleneck; SURVEY.md section 3.1)
and report value / (20 * 1250), so vs_baseline >= 1.0 means the 20x
north-star target is met.
"""

import json
import time

import numpy as np

REF_IMAGES_PER_SEC = 1250.0   # estimated TF1 reference throughput (see above)
NORTH_STAR_MULT = 20.0


def main():
    import jax
    from mpnn_tpu.utils import jaxcache
    jaxcache.enable()
    import jax.numpy as jnp

    # bf16 activations end-to-end (fp32 master params, fp32 loss/stats
    # islands) + analytic weight-L2 (gradient-exact; tests/test_analytic_l2).
    from mpnn_tpu.ops import config
    config.set_compute_dtype(jnp.bfloat16)
    config.set_analytic_l2(True)

    from mpnn_tpu.experiments import ac_chain, λ_lrn, τ_ds, batch_size
    from mpnn_tpu.models import Schedules, init_training
    from mpnn_tpu.models.steps import make_train_loop
    from mpnn_tpu.data import Dataset, synth

    # CIFAR-10-shaped synthetic data (50k train images, 32x32x3, 10 classes).
    ds = Dataset(synth.make_synthetic(n_tr=50000, n_ts=512, h=32, w=32,
                                      n_cls=10, seed=0))
    net = ac_chain(k_cpt=1e-9)(ds.x0_shape, ds.y_shape)
    params, state, vel = init_training(net, seed=0)
    sched = Schedules(lr=λ_lrn, tau=τ_ds)
    # The real training path: t_log-style scanned chunks, one device call
    # per chunk (mpnn_tpu.models.steps.make_train_loop).
    loop = make_train_loop(net, batch_size, sched)
    x0_tr, y_tr, m_sym = ds.train_arrays
    rng = jax.random.PRNGKey(0)

    chunk = 250
    # Warmup: compile + settle. NOTE: sync via host materialization --
    # block_until_ready has been observed returning early on tunneled
    # (axon) backends, which silently corrupts timings.
    params, state, vel, cs = loop(params, state, vel, 0, rng,
                                  x0_tr, y_tr, m_sym, chunk)
    np.asarray(cs)

    n_chunks = 4
    t0 = time.perf_counter()
    t = chunk
    for _ in range(n_chunks):
        params, state, vel, cs = loop(params, state, vel, t, rng,
                                      x0_tr, y_tr, m_sym, chunk)
        t += chunk
    # Chunk N+1 depends on chunk N's params, so materializing the last
    # chunk's losses bounds all device work.
    cs_host = np.asarray(cs)
    dt = time.perf_counter() - t0

    c = float(cs_host[-1])
    assert np.isfinite(c), f"non-finite loss {c}"
    value = n_chunks * chunk * batch_size / dt
    print(json.dumps({
        "metric": "cifar10-ac train throughput (8-deep actor chain, b128)",
        "value": round(value, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / (NORTH_STAR_MULT * REF_IMAGES_PER_SEC),
                             3),
    }))


if __name__ == "__main__":
    main()
