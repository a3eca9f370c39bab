"""Layer-zoo semantics: op-count formulas, inits, BatchNorm modes, error
layers, compound chains (reference scripts/lib/layer_types.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpnn_tpu.ops import (
    LinTrans, Conv, Rect, Softmax, GlobalMaxPool, ToPyramid,
    MultiscaleConvMax, MultiscaleRect, MultiscaleLLN, Select, BatchNorm,
    MultiscaleBatchNorm, SquaredError, CrossEntropyError,
    SuperclassCrossEntropyError, ActivityError, Chain, Dropout)
from mpnn_tpu.models.net import Ctx


EV = Ctx(train=False)
TR = Ctx(train=True)


def _init_apply(layer, x, key=0, ctx=EV, y=None):
    x_shape = ([tuple(xi.shape[1:]) for xi in x] if isinstance(x, list)
               else tuple(x.shape[1:]))
    layer.build(x_shape)
    p = layer.init(jax.random.PRNGKey(key), x_shape)
    s = layer.init_state(x_shape)
    return layer.apply(p, s, x, y, ctx), p


def test_lintrans_op_count_and_shapes():
    """n_ops = n_in * n_chan (reference scripts/lib/layer_types.py:53)."""
    x = jnp.ones((4, 5, 5, 3))
    l = LinTrans(n_chan=7)
    (out, _, aux), p = _init_apply(l, x)
    assert out.shape == (4, 7)
    assert l.n_ops == 75 * 7
    assert p["w"].shape == (75, 7)


def test_lintrans_residual_init_is_identity():
    """res=True with sigma_w=0 gives exactly the identity map
    (reference scripts/lib/layer_types.py:46-50)."""
    x = jnp.asarray(np.random.RandomState(0).rand(3, 6).astype(np.float32))
    l = LinTrans(n_chan=6, res=True, σ_w=0)
    (out, _, aux), p = _init_apply(l, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)
    # L2 penalty is measured relative to identity -> zero at init.
    assert float(aux.c_mod) == 0.0


def test_conv_op_count_and_residual():
    """n_ops = n_pix * supp^2 * n_in * n_chan (reference :74); residual
    identity-kernel init (reference :65-69)."""
    x = jnp.asarray(np.random.RandomState(1).rand(2, 8, 8, 4)
                    .astype(np.float32))
    l = Conv(n_chan=4, supp=3, res=True, σ_w=0)
    (out, _, aux), p = _init_apply(l, x)
    assert l.n_ops == 64 * 9 * 4 * 4
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_batchnorm_train_vs_eval():
    """Train mode normalizes with batch moments and moves the EMA toward
    them; eval mode uses the EMA (reference scripts/lib/layer_types.py:219-239)."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(3.0 + 2.0 * rng.rand(64, 5).astype(np.float32))
    l = BatchNorm()
    l.build((5,))
    p = l.init(jax.random.PRNGKey(0), (5,))
    s = l.init_state((5,))
    out_tr, s2, _ = l.apply(p, s, x, None, TR)
    # Batch-normalized output ~ zero mean unit var.
    np.testing.assert_allclose(np.asarray(out_tr).mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_tr).std(0), 1.0, atol=1e-2)
    # EMA moved: m_avg = 0.9*0 + 0.1*batch_mean.
    np.testing.assert_allclose(np.asarray(s2["m_avg"]),
                               0.1 * np.asarray(x).mean(0), atol=1e-5)
    # Eval uses EMA (initial state: m=0, v=1 -> identity transform).
    out_ev, s3, _ = l.apply(p, s, x, None, EV)
    np.testing.assert_allclose(np.asarray(out_ev), np.asarray(x), atol=1e-4)
    assert s3 is s


def test_pyramid_shapes_and_mcm_op_count():
    """ToPyramid makes (h/2^i) scales (reference :118-125); the MCM op-count
    formula sums per-scale horizontal + vertical kernel volumes times output
    pixels (reference :189-194)."""
    x = jnp.ones((2, 16, 16, 3))
    pyr = ToPyramid(n_scales=3)
    (xs, _, _), _ = _init_apply(pyr, x)
    assert [tuple(t.shape) for t in xs] == [
        (2, 16, 16, 3), (2, 8, 8, 3), (2, 4, 4, 3)]

    mcm = MultiscaleConvMax(n_chan=[8, 8], supp=3)
    (outs, _, aux), p = _init_apply(mcm, xs)
    # Output covers the LAST 2 input scales: 8x8 and 4x4.
    assert [tuple(t.shape) for t in outs] == [(2, 8, 8, 8), (2, 4, 4, 8)]
    expect = (8 * 8) * (3 * 3 * 3 * 8) + (4 * 4) * (3 * 3 * 3 * 8
                                                    + 3 * 3 * 8 * 8)
    assert mcm.n_ops == expect
    assert set(p) == {"w_horz_0", "w_horz_1", "w_vert_0", "b_0", "b_1"}


def test_mcm_dataflow_matches_naive():
    """out[j] = b + conv(x[kept j]) + conv(pool2(out[j-1])) -- check against
    a hand-rolled computation (reference scripts/lib/layer_types.py:180-185)."""
    rng = np.random.RandomState(3)
    xs = [jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32)),
          jnp.asarray(rng.rand(2, 4, 4, 3).astype(np.float32))]
    mcm = MultiscaleConvMax(n_chan=[4, 4], supp=3)
    (outs, _, _), p = _init_apply(mcm, xs)

    from mpnn_tpu.ops.layers import conv_same, _pool2
    o0 = p["b_0"] + conv_same(xs[0], p["w_horz_0"])
    o1 = (p["b_1"] + conv_same(xs[1], p["w_horz_1"])
          + conv_same(_pool2(o0), p["w_vert_0"]))
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(o0),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(outs[1]), np.asarray(o1),
                               atol=1e-5)


def test_lln_normalizes_luminance():
    """Scaling the input by a constant leaves LLN output ~invariant away from
    the eps floor (reference scripts/lib/layer_types.py:127-147)."""
    rng = np.random.RandomState(4)
    x = [jnp.asarray(0.5 + rng.rand(1, 12, 12, 3).astype(np.float32))]
    lln = MultiscaleLLN(σ=2)
    (out1, _, _), _ = _init_apply(lln, x)
    lln2 = MultiscaleLLN(σ=2)
    (out2, _, _), _ = _init_apply(lln2, [10.0 * x[0]])
    np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out2[0]),
                               rtol=0.05)


def test_error_layers():
    y = jnp.asarray(np.eye(4, dtype=np.float32)[[0, 1, 2]])
    x = jnp.asarray([[0.7, 0.1, 0.1, 0.1],
                     [0.1, 0.7, 0.1, 0.1],
                     [0.7, 0.1, 0.1, 0.1]], jnp.float32)
    ce = CrossEntropyError()
    (out, _, aux), _ = _init_apply(ce, x, y=y)
    np.testing.assert_array_equal(np.asarray(aux.delta_cor), [1, 1, 0])
    # eps-floored cross-entropy (reference :267-269)
    eps = 1e-6
    p = eps / 4 + (1 - eps) * np.asarray(x)
    expect = -(np.eye(4)[[0, 1, 2]] * np.log(p)).sum(1)
    np.testing.assert_allclose(np.asarray(aux.c_err), expect, rtol=1e-5)

    se = SquaredError()
    (_, _, aux2), _ = _init_apply(se, x, y=y)
    np.testing.assert_allclose(
        np.asarray(aux2.c_err),
        ((np.asarray(x) - np.eye(4)[[0, 1, 2]]) ** 2).sum(1), rtol=1e-5)

    w_cls = np.float32(np.eye(4)[:, :2])  # 4 classes -> 2 superclasses
    sce = SuperclassCrossEntropyError(w_cls=w_cls)
    (_, _, aux3), _ = _init_apply(sce, x[:, :2], y=y)
    assert np.asarray(aux3.c_err).shape == (3,)

    ae = ActivityError(α=0.5)
    (_, _, aux4), _ = _init_apply(ae, x, y=y)
    np.testing.assert_allclose(np.asarray(aux4.c_mod),
                               0.5 * (np.asarray(x) ** 2).sum(1), rtol=1e-5)


def test_chain_sums_and_forwards_delta_cor():
    """Chain sums c_err/c_mod/n_ops over comps and forwards the LAST comp's
    delta_cor (reference scripts/lib/layer_types.py:299-310)."""
    y = jnp.asarray(np.eye(3, dtype=np.float32)[[0, 1]])
    x = jnp.asarray(np.random.RandomState(5).rand(2, 4, 4, 2)
                    .astype(np.float32))
    chain = Chain(comps=[LinTrans(n_chan=3, k_l2=0.1), Softmax(),
                         CrossEntropyError()])
    (out, _, aux), p = _init_apply(chain, x, y=y)
    assert chain.n_ops == 32 * 3
    assert aux.delta_cor is not None
    assert np.asarray(aux.c_err).shape == (2,)
    assert float(aux.c_mod) > 0.0


def test_select_and_multiscale_rect_and_msbn():
    xs = [jnp.asarray(-np.ones((2, 4, 4, 3), np.float32)),
          jnp.asarray(np.ones((2, 2, 2, 3), np.float32))]
    sel = Select(i=-1)
    (out, _, _), _ = _init_apply(sel, xs)
    assert out.shape == (2, 2, 2, 3)

    mr = MultiscaleRect()
    (outs, _, _), _ = _init_apply(mr, xs)
    assert float(np.asarray(outs[0]).max()) == 0.0

    msbn = MultiscaleBatchNorm()
    msbn.build([tuple(t.shape[1:]) for t in xs])
    assert len(msbn.comps) == 2
    p = msbn.init(jax.random.PRNGKey(0), [t.shape[1:] for t in xs])
    s = msbn.init_state([t.shape[1:] for t in xs])
    outs, s2, _ = msbn.apply(p, s, xs, None, TR)
    assert len(outs) == 2 and len(s2["comps"]) == 2


def test_dropout_keep1_identity_and_scaling():
    x = jnp.ones((8, 16))
    d = Dropout()  # keep=1 default
    (out, _, _), _ = _init_apply(d, x, ctx=Ctx(train=True,
                                               rng=jax.random.PRNGKey(0)))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    d2 = Dropout(λ=0.5)
    d2._uid = 7
    (out2, _, _), _ = _init_apply(d2, x, ctx=Ctx(train=True,
                                                 rng=jax.random.PRNGKey(0)))
    vals = np.unique(np.asarray(out2))
    assert set(vals).issubset({0.0, 2.0})
    # NOT mode-gated (reference layer_types.py:212-217): applies at eval
    # too whenever the evaluator supplies an rng.
    (out3, _, _), _ = _init_apply(d2, x, ctx=Ctx(train=False,
                                                 rng=jax.random.PRNGKey(1)))
    assert set(np.unique(np.asarray(out3))).issubset({0.0, 2.0})
    assert 0.0 in np.asarray(out3)


def test_eval_split_threads_rng_only_for_dropout_nets():
    """The evaluators pass per-batch keys iff the net has active Dropout
    (keeps the eval HLO — and compile cache — unchanged otherwise)."""
    from mpnn_tpu.models.steps import _has_active_dropout
    from mpnn_tpu.models.sr import SRNet
    from mpnn_tpu.ops.layers import LinTrans, Softmax, CrossEntropyError

    def make(drop_lam):
        root = Chain(comps=[Dropout(λ=drop_lam), LinTrans(n_chan=4),
                            Softmax(), CrossEntropyError()])
        return SRNet(root=root, x0_shape=(6,), y_shape=(4,))

    assert not _has_active_dropout(make(1))
    assert _has_active_dropout(make(0.5))


def _np_max_pool_same(x, window, stride):
    """Float64 NumPy SAME max-pool — the tf.nn.max_pool semantics the
    reference invokes (pad_total = max((out-1)*stride + window - in, 0),
    split low/high with the extra on the high side)."""
    b, h, w, c = x.shape
    oh, ow = -(-h // stride), -(-w // stride)
    ph = max((oh - 1) * stride + window - h, 0)
    pw = max((ow - 1) * stride + window - w, 0)
    xp = np.full((b, h + ph, w + pw, c), -np.inf)
    xp[:, ph // 2:ph // 2 + h, pw // 2:pw // 2 + w] = x
    out = np.empty((b, oh, ow, c))
    for i in range(oh):
        for j in range(ow):
            out[:, i, j] = xp[
                :, i * stride:i * stride + window,
                j * stride:j * stride + window].max(axis=(1, 2))
    return out


def test_maxpool_tf1_bug_compat():
    """MaxPool's two modes, pinned against a NumPy tf.nn.max_pool oracle
    with asymmetric supp != stride (VERDICT r3 next #7): default mode is
    the documented intent (window=supp, stride=stride); maxpool_tf1
    reproduces the reference's transposed call, where what runs is
    window=stride, stride=supp (layer_types.py:86-94 passes its strides
    tuple as ksize and k_shape as strides)."""
    from mpnn_tpu.ops import MaxPool, config
    x = np.random.RandomState(3).rand(2, 9, 9, 3).astype(np.float32)
    xj = jnp.asarray(x)

    (out, _, _), _ = _init_apply(MaxPool(supp=3, stride=2), xj)
    np.testing.assert_allclose(np.asarray(out),
                               _np_max_pool_same(x, 3, 2), atol=1e-6)

    config.set_maxpool_tf1(True)
    try:
        l = MaxPool(supp=3, stride=2)
        (out_tf1, _, _), _ = _init_apply(l, xj)
        assert l.out_shape == (3, 3, 3)  # ceil(9/3): strides by supp
        np.testing.assert_allclose(np.asarray(out_tf1),
                                   _np_max_pool_same(x, 2, 3), atol=1e-6)
    finally:
        config.set_maxpool_tf1(False)
