"""Quantify the ToPyramid resize deviation (VERDICT r1 #10).

The repo's ToPyramid uses jax.image half-pixel-center bilinear; the
reference uses TF1's legacy `tf.image.resize_images` grid
(align_corners=False pre-TF2 semantics: src = dst * scale, no half-pixel
shift -- reference scripts/lib/layer_types.py:118-125). This is a
documented behavioral deviation; these tests BOUND it:

  1. per-pixel deviation of the resized pyramid itself, and
  2. its downstream effect on a briefly-trained SR net's error cost and
     accuracy when the pyramid is swapped wholesale.

Measured values are recorded in PARITY.md."""

import numpy as np
import jax
import jax.numpy as jnp

from mpnn_tpu.ops.layers import ToPyramid
from mpnn_tpu.models import Ctx


def tf1_legacy_resize_bilinear(x, out_h, out_w):
    """NumPy reimplementation of TF1 tf.image.resize_images bilinear with
    align_corners=False (the reference's default): source coordinate
    src = dst * (in/out) with NO half-pixel shift, clamped; this is the
    'legacy' kernel TF2 renamed ResizeMethod v1."""
    n, h, w, c = x.shape
    scale_h, scale_w = h / out_h, w / out_w
    ys = np.arange(out_h) * scale_h
    xs = np.arange(out_w) * scale_w
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


def _pyramids(x, n_scales=4):
    """(repo pyramid, TF1-legacy pyramid) for the given input."""
    pyr = ToPyramid(n_scales=n_scales)
    pyr.build(x.shape[1:])
    ctx = Ctx(train=False, rng=None)
    repo_out, _, _ = pyr.apply({}, {}, jnp.asarray(x), None, ctx)
    legacy_out = [tf1_legacy_resize_bilinear(x, h, w)
                  for (h, w, c) in pyr.out_shape]
    return [np.asarray(o) for o in repo_out], legacy_out


def test_tf1_legacy_x2_is_pure_decimation():
    """The crisp characterization of the deviation: at exact x2 ratios the
    TF1-legacy grid (src = dst * 2, integer) interpolates with weight 0 --
    it DECIMATES, picking every 2nd pixel with no filtering. The repo's
    half-pixel kernel instead averages 2x2 blocks (a proper antialiasing
    prefilter). On white noise the two therefore decorrelate almost fully
    (measured mean |dev| ~0.23 on U[0,1] noise); on natural images, which
    are spatially smooth, the deviation is the sub-pixel effect below."""
    rng = np.random.RandomState(0)
    x = rng.rand(4, 32, 32, 3).astype(np.float32)
    legacy = tf1_legacy_resize_bilinear(x, 16, 16)
    np.testing.assert_array_equal(legacy, x[:, ::2, ::2])

    repo_out, legacy_out = _pyramids(x)
    # The repo kernel is a genuine low-pass (antialiased triangle filter):
    # on iid noise its output variance collapses, while decimation keeps
    # the full input variance.
    assert np.std(repo_out[1]) < 0.6 * np.std(legacy_out[1])
    # Decimation vs filtering on iid noise: large pointwise deviation.
    d = np.abs(repo_out[1] - legacy_out[1])
    assert 0.15 < d.mean() < 0.30, d.mean()


def test_resize_deviation_grows_with_scale_depth():
    """On smooth (band-limited, 0.5-1.5 cycle) inputs the grids nearly
    agree at fine scales, but the deviation GROWS down the pyramid: by
    scale 3 (4x4) even low-frequency content sits near Nyquist, where
    decimation (full amplitude + aliasing) and the antialiasing filter
    (attenuation) genuinely differ. Measured means 0.030 / 0.086 / 0.172
    at scales 1/2/3; bounds below are those values with ~50% margin and
    are recorded in PARITY.md."""
    u = np.linspace(0, 1, 32)
    uu, vv = np.meshgrid(u, u, indexing="ij")
    imgs = []
    rng = np.random.RandomState(1)
    for _ in range(8):
        a, b, ph = rng.uniform(0.5, 1.5, 3)
        img = 0.5 + 0.25 * np.cos(2 * np.pi * (a * uu + b * vv) + ph)
        imgs.append(np.repeat(img[..., None], 3, axis=-1))
    x = np.stack(imgs).astype(np.float32)
    repo_out, legacy_out = _pyramids(x)
    np.testing.assert_array_equal(repo_out[0], x)
    np.testing.assert_array_equal(legacy_out[0], x)
    bounds = {1: 0.05, 2: 0.13, 3: 0.25}
    means = []
    for i in (1, 2, 3):
        diff = np.abs(repo_out[i] - legacy_out[i])
        assert diff.max() > 1e-4, f"scale {i}: kernels unexpectedly equal"
        assert diff.mean() < bounds[i], f"scale {i}: mean {diff.mean()}"
        means.append(diff.mean())
    assert means[0] < means[1] < means[2]  # monotone growth with depth


def _legacy_decimation_apply(self, params, state, x, y, ctx):
    """TF1-legacy ToPyramid at the experiments' exact x2 ratios = pure
    decimation (proven above), expressed in jittable jax ops."""
    from mpnn_tpu.ops.layers import Aux
    out = []
    for i, (h, w, c) in enumerate(self.out_shape):
        s = 2 ** i
        out.append(x if s == 1 else x[:, ::s, ::s])
    return out, state, Aux()


def _train_and_eval(net_cls_root, ds, patch_legacy):
    from mpnn_tpu.models import SRNet, Schedules, init_training
    from mpnn_tpu.models.steps import make_train_step
    from mpnn_tpu.models.stats import state_stats

    orig_apply = ToPyramid.apply
    try:
        if patch_legacy:
            ToPyramid.apply = _legacy_decimation_apply
        net = SRNet(x0_shape=ds.x0_shape, y_shape=ds.y_shape,
                    root=net_cls_root())
        params, state, vel = init_training(net, seed=0)
        step = make_train_step(net, 32, Schedules(lr=lambda t: 0.05))
        x0_tr, y_tr, m_sym = ds.train_arrays
        rng = jax.random.PRNGKey(0)
        for t in range(80):
            params, state, vel, _ = step(params, state, vel, t, rng,
                                         x0_tr, y_tr, m_sym)
        n_ev = (len(ds.x0_ts) // 32) * 32
        x0 = jnp.asarray(ds.x0_ts[:n_ev])
        y = jnp.asarray(ds.y_ts[:n_ev])
        ctx = Ctx(train=False, rng=None)
        recs, _ = net.forward(params, state, x0, y, ctx)
        net.route_for_stats(recs, n_ev, ctx)
        stats = state_stats(net, recs, y)
        acc = float(jnp.mean(stats["net/acc"]))

        # Cross-transfer: evaluate these params under the OTHER pyramid.
        ToPyramid.apply = (orig_apply if patch_legacy
                           else _legacy_decimation_apply)
        recs2, _ = net.forward(params, state, x0, y, ctx)
        net.route_for_stats(recs2, n_ev, ctx)
        acc_x = float(jnp.mean(state_stats(net, recs2, y)["net/acc"]))
        return acc, acc_x
    finally:
        ToPyramid.apply = orig_apply


def test_downstream_training_parity_but_no_param_transfer(synth_dataset):
    """The behavioral-parity claim, measured (PARITY.md):

    - TRAINING under either pyramid operator reaches comparable accuracy
      (the acc-eff curves -- the reference's measured object -- do not
      depend on the resize grid), but
    - trained PARAMETERS do not transfer between grids (measured: 39% ->
      14% when a trained net's pyramid is swapped wholesale), i.e. TF1
      reference checkpoints are not numerically portable into this
      framework's pyramid and vice versa."""
    from .test_train_e2e import pyr, rcm, reg

    def root():
        return pyr(rcm([8, 8], reg(10)))

    acc_half, acc_half_on_legacy = _train_and_eval(root, synth_dataset,
                                                   patch_legacy=False)
    acc_leg, acc_leg_on_half = _train_and_eval(root, synth_dataset,
                                               patch_legacy=True)
    # Both operators train to comparable, above-chance accuracy.
    assert acc_half > 0.2 and acc_leg > 0.2, (acc_half, acc_leg)
    assert abs(acc_half - acc_leg) < 0.25, (acc_half, acc_leg)
    # Cross-grid transfer degrades materially for at least one direction
    # (the deviation is real, not cosmetic).
    drop_half = acc_half - acc_half_on_legacy
    drop_leg = acc_leg - acc_leg_on_half
    assert max(drop_half, drop_leg) > 0.05, (drop_half, drop_leg)


def test_config_tf1_mode_matches_legacy_grid():
    """ops.config.set_pyramid_tf1(True) switches ToPyramid to the exact
    TF1 legacy grid: bitwise decimation at integer ratios (the fast strided
    -slice path), and the legacy bilinear weights at non-integer ratios
    (VERDICT r2 Next #2)."""
    from mpnn_tpu.ops import config

    rng = np.random.RandomState(3)
    for h0, n_scales in ((32, 4), (12, 3), (9, 2)):
        x = rng.rand(2, h0, h0, 3).astype(np.float32)
        pyrl = ToPyramid(n_scales=n_scales)
        pyrl.build(x.shape[1:])
        ctx = Ctx(train=False, rng=None)
        config.set_pyramid_tf1(True)
        try:
            out, _, _ = pyrl.apply({}, {}, jnp.asarray(x), None, ctx)
        finally:
            config.set_pyramid_tf1(False)
        legacy = [tf1_legacy_resize_bilinear(x, hh, ww)
                  for (hh, ww, c) in pyrl.out_shape]
        for i, (o, l) in enumerate(zip(out, legacy)):
            np.testing.assert_allclose(np.asarray(o), l, rtol=1e-6,
                                       atol=1e-6,
                                       err_msg=f"h0={h0} scale {i}")


def test_tf1_mode_removes_transfer_cliff(synth_dataset):
    """The acceptance criterion: a net trained under the TF1 grid
    (emulating a reference-trained checkpoint) evaluates IDENTICALLY when
    this framework runs with --pyramid-tf1 -- the measured 39%->14%
    accuracy cliff of a grid swap disappears, because there is no swap."""
    from mpnn_tpu.ops import config
    from mpnn_tpu.models import SRNet, Schedules, init_training
    from mpnn_tpu.models.steps import make_train_step
    from mpnn_tpu.models.stats import state_stats
    from .test_train_e2e import pyr, rcm, reg

    ds = synth_dataset
    net = SRNet(x0_shape=ds.x0_shape, y_shape=ds.y_shape,
                root=pyr(rcm([8, 8], reg(10))))
    # Train with the monkeypatched legacy operator (the stand-in for a TF1
    # reference training run).
    orig_apply = ToPyramid.apply
    try:
        ToPyramid.apply = _legacy_decimation_apply
        params, state, vel = init_training(net, seed=0)
        step = make_train_step(net, 32, Schedules(lr=lambda t: 0.05))
        x0_tr, y_tr, m_sym = ds.train_arrays
        rng = jax.random.PRNGKey(0)
        for t in range(80):
            params, state, vel, _ = step(params, state, vel, t, rng,
                                         x0_tr, y_tr, m_sym)

        n_ev = (len(ds.x0_ts) // 32) * 32
        x0 = jnp.asarray(ds.x0_ts[:n_ev])
        y = jnp.asarray(ds.y_ts[:n_ev])
        ctx = Ctx(train=False, rng=None)
        recs, _ = net.forward(params, state, x0, y, ctx)
        net.route_for_stats(recs, n_ev, ctx)
        acc_native = float(jnp.mean(state_stats(net, recs, y)["net/acc"]))
    finally:
        ToPyramid.apply = orig_apply

    # Evaluate the same params through the REAL code path with the config
    # knob on: identical operator, identical accuracy.
    config.set_pyramid_tf1(True)
    try:
        recs, _ = net.forward(params, state, x0, y, ctx)
        net.route_for_stats(recs, n_ev, ctx)
        acc_tf1 = float(jnp.mean(state_stats(net, recs, y)["net/acc"]))
    finally:
        config.set_pyramid_tf1(False)
    assert acc_tf1 == acc_native, (acc_tf1, acc_native)

    # Control: the default (half-pixel) grid on the same params shows the
    # cliff this mode exists to remove.
    recs, _ = net.forward(params, state, x0, y, ctx)
    net.route_for_stats(recs, n_ev, ctx)
    acc_default = float(jnp.mean(state_stats(net, recs, y)["net/acc"]))
    assert acc_default < acc_native - 0.02, (acc_default, acc_native)
