"""Pallas fused MultiscaleConvMax kernel vs the XLA reference path
(interpret mode on CPU; the TPU-compiled kernel computes the same program).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpnn_tpu.ops import config
from mpnn_tpu.ops.kernels import fused_mcm_forward, mcm_xla, fused_mcm
from mpnn_tpu.ops.layers import MultiscaleConvMax
from mpnn_tpu.models.net import Ctx


@pytest.fixture
def stage():
    rng = np.random.RandomState(0)
    xs = [jnp.asarray(rng.rand(8, 16, 16, 3).astype(np.float32)),
          jnp.asarray(rng.rand(8, 8, 8, 3).astype(np.float32)),
          jnp.asarray(rng.rand(8, 4, 4, 3).astype(np.float32))]
    whs = [jnp.asarray(rng.randn(3, 3, 3, 8).astype(np.float32)) * 0.2,
           jnp.asarray(rng.randn(3, 3, 3, 8).astype(np.float32)) * 0.2]
    wvs = [jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32)) * 0.2]
    bs = [jnp.asarray(rng.randn(8).astype(np.float32)),
          jnp.asarray(rng.randn(8).astype(np.float32))]
    return xs, whs, wvs, bs


def test_forward_matches_xla(stage):
    xs, whs, wvs, bs = stage
    ref = mcm_xla(xs, whs, wvs, bs)
    out = fused_mcm_forward(xs, whs, wvs, bs, 3, interpret=True)
    assert len(out) == 2
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-5)


def test_grads_match_xla(stage):
    xs, whs, wvs, bs = stage

    def loss_pallas(whs, wvs, bs, xs):
        return sum(jnp.sum(o ** 2)
                   for o in fused_mcm(xs, whs, wvs, bs, 3, True))

    def loss_xla(whs, wvs, bs, xs):
        return sum(jnp.sum(o ** 2) for o in mcm_xla(xs, whs, wvs, bs))

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(whs, wvs, bs, xs)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(whs, wvs, bs, xs)
    for t1, t2 in zip(g1, g2):
        for a, b in zip(t1, t2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3, rtol=1e-3)


def test_layer_integration(stage):
    """MultiscaleConvMax.apply with use_pallas produces the same outputs and
    op counts as the default path."""
    xs, _, _, _ = stage
    x_shapes = [tuple(x.shape[1:]) for x in xs]
    mcm = MultiscaleConvMax(n_chan=[8, 8], supp=3, k_l2=1e-4)
    mcm.build(x_shapes)
    assert mcm._pallas_eligible()
    params = mcm.init(jax.random.PRNGKey(0), x_shapes)
    ctx = Ctx(train=False)

    out_ref, _, aux_ref = mcm.apply(params, {}, xs, None, ctx)
    config.set_use_pallas(True, interpret=True)
    try:
        out_pl, _, aux_pl = mcm.apply(params, {}, xs, None, ctx)
    finally:
        config.set_use_pallas(False)
    for r, o in zip(out_ref, out_pl):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-5)
    np.testing.assert_allclose(float(aux_pl.c_mod), float(aux_ref.c_mod),
                               rtol=1e-6)


def test_ineligible_shapes_fall_back():
    """Stages with clipped (min'd) horizontal kernels use the XLA path."""
    mcm = MultiscaleConvMax(n_chan=[4], supp=3)
    mcm.build([(2, 2, 3)])  # 2x2 scale clips the kernel to 2x2
    assert not mcm._pallas_eligible()


def test_fused_mcm_bf16_vjp_dtypes(stage):
    """Under the bf16 policy the fused kernel's output dtype must match
    mcm_xla's, or the custom_vjp cotangent dtypes disagree (regression:
    previously crashed with a fp32-vs-bf16 ValueError)."""
    import jax.numpy as jnp
    xs, whs, wvs, bs = stage
    config.set_compute_dtype(jnp.bfloat16)
    try:
        def loss(whs):
            outs = fused_mcm([x.astype(jnp.bfloat16) for x in xs],
                                     whs, wvs, bs, 3, True)
            return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

        g = jax.grad(loss)(whs)
        assert all(np.isfinite(np.asarray(gi)).all() for gi in g)
    finally:
        config.set_compute_dtype(None)


@pytest.mark.parametrize("c", [64, 128])
def test_forward_matches_xla_wide_channels(c):
    """The width-suite channel range (fat 32-256, fatter 48-384): the
    fused kernel must stay exact where its economics become competitive
    (tools/tpu_mcm_width.py measures the crossover on-chip)."""
    rng = np.random.RandomState(1)
    xs = [jnp.asarray(rng.rand(4, 8, 8, c).astype(np.float32)),
          jnp.asarray(rng.rand(4, 4, 4, c).astype(np.float32))]
    whs = [jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32)) * 0.05,
           jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32)) * 0.05]
    wvs = [jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32)) * 0.05]
    bs = [jnp.zeros((c,), jnp.float32), jnp.zeros((c,), jnp.float32)]
    ref = mcm_xla(xs, whs, wvs, bs)
    out = fused_mcm_forward(xs, whs, wvs, bs, 3, batch_tile=2,
                            interpret=True)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   atol=2e-4, rtol=2e-4)
