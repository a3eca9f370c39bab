"""The layer zoo: every layer family of the reference, rebuilt functionally.

Design (TPU-first, not a translation):

- A layer object is *static configuration only* (hypers + tree links via
  `router` / `sinks` / `comps`). Parameters and mutable state (BatchNorm EMA)
  live in separate pytrees threaded through pure functions, so the whole
  network is jit/grad/pjit-compatible.
- `build(x_shape)` is a one-time host-side shape-inference pass that fixes
  `out_shape` and the *analytic op count* `n_ops` (the reference computes the
  same quantities at TF graph-build time: scripts/lib/layer_types.py:53,74,
  189-194). `n_ops` feeds both the `moc` statistic and the cost-of-compute
  loss term, so the formulas are reproduced exactly.
- `init(key, x_shape) -> params`, `init_state(x_shape) -> state`,
  `apply(params, state, x, y, ctx) -> (x_out, new_state, Aux)`.
- `ctx.train` is a static Python bool: train and eval compile to two XLA
  programs (replacing the reference's string `mode` placeholder and
  `tf.cond`, scripts/lib/layer_types.py:231-239).
- Multiscale ("pyramid") activations are plain Python lists of arrays -- a
  static pytree, so XLA sees fixed shapes per scale.

Hyperparameter names (including unicode sigma_w etc.) and parameter names
('w', 'b', 'gamma'...) follow the reference so checkpoints keep the same
self-describing schema (scripts/lib/serdes.py:13-19). Class-for-class parity
with reference scripts/lib/layer_types.py is cited per class below.
"""

import math
import unicodedata
from types import SimpleNamespace as Ns

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from . import config

__all__ = [
    "Layer", "NoOp", "LinTrans", "Conv", "Rect", "Softmax", "MaxPool",
    "GlobalMaxPool", "ToPyramid", "MultiscaleLLN", "MultiscaleConvMax",
    "MultiscaleRect", "Select", "Dropout", "BatchNorm",
    "MultiscaleBatchNorm", "SquaredError", "CrossEntropyError",
    "SuperclassCrossEntropyError", "ActivityError", "Chain", "Aux",
    "nfkc_hypers",
]


def nfkc_hypers(hypers):
    """NFKC-normalize hyper-dict keys (shared by Layer and Net).

    Python normalizes identifiers at parse (source kwarg `ϵ` U+03F5
    becomes attr `ε` U+03B5), but keys arriving via **dict -- e.g. decoded
    from a checkpoint record -- do not. Without this, a record key 'ϵ'
    would shadow nothing and the layer would silently use the default (the
    NFKC bug class caught by tests/test_step_oracle.py). Two raw keys
    normalizing to the same name (a corrupt record) raise rather than
    letting one silently win."""
    out = {}
    for k, v in hypers.items():
        nk = unicodedata.normalize("NFKC", k)
        if nk in out:
            raise ValueError(
                "hyper keys %r and earlier one both normalize to %r" % (k, nk))
        out[nk] = v
    return out


class Aux:
    """Per-layer loss contributions, the analogue of the reference's
    `c_err` / `c_mod` / `delta_cor` link-time attributes
    (scripts/lib/layer_types.py:22-26)."""

    def __init__(self, c_err=0.0, c_mod=0.0, delta_cor=None):
        self.c_err = c_err      # per-example (B,) or scalar 0
        self.c_mod = c_mod      # scalar, or per-example for ActivityError
        self.delta_cor = delta_cor  # (B,) 0/1 correctness, or None


def _prod(shape):
    return int(np.prod(shape)) if len(shape) else 1


def conv_same(x, w):
    """Stride-1 SAME 2-D conv, NHWC/HWIO.

    Under a bf16 compute policy, inputs and weights are cast to bf16 and the
    OUTPUT STAYS bf16 (the MXU still accumulates products in fp32
    internally). Activations flowing bf16 end-to-end matters more than the
    matmul dtype here: the b128 train step is HBM-bandwidth-bound on
    activation traffic (conv FLOPs are ~26us of MXU time vs ~800us of fp32
    tensor traffic measured on v5e), so halving activation bytes is the
    first-order win. Loss/statistics paths cast back to fp32 at their
    (tiny) consumers."""
    if config.compute_dtype is not None:
        x = x.astype(config.compute_dtype)
        w = w.astype(config.compute_dtype)
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def max_pool_same(x, supp, stride):
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, supp, supp, 1),
        window_strides=(1, stride, stride, 1),
        padding="SAME")


def _pool2(x):
    """2x2 stride-2 SAME max-pool (reference helper
    scripts/lib/layer_types.py:109-110).

    For even spatial dims (every reference arch) this is a reshape + max:
    identical values to reduce_window, but its BACKWARD lowers to cheap
    compare/select fusions instead of select-and-scatter -- measured ~76
    us/step of select-and-scatter in the b128 train step, ~10% of the whole
    step, all from pool2 gradients."""
    b, h, w, c = x.shape
    if h % 2 == 0 and w % 2 == 0:
        return jnp.max(x.reshape(b, h // 2, 2, w // 2, 2, c), axis=(2, 4))
    return max_pool_same(x, 2, 2)


def _matmul(x, w):
    """Dense product under the compute policy; output stays in compute
    dtype (see conv_same)."""
    if config.compute_dtype is not None:
        x = x.astype(config.compute_dtype)
        w = w.astype(config.compute_dtype)
    return jnp.dot(x, w)


def _bias_add(out, b):
    """out + b without silently promoting bf16 activations to fp32
    (fp32 master bias + bf16 matmul output would otherwise upcast)."""
    return out + b.astype(out.dtype)


################################################################################
# Core layer class (reference scripts/lib/layer_types.py:11-26)
################################################################################

class Layer:
    default_hypers = {}
    _uid = 0  # overwritten per-instance by Net.build for RNG stream folding

    def __init__(self, name=None, router=None, sinks=None, comps=None,
                 **hypers):
        self.name = name if name is not None else type(self).__name__
        self.router = router
        self.sinks = list(sinks) if sinks else []
        self.comps = list(comps) if comps else []
        self.hypers = Ns(**{**dict(type(self).default_hypers),
                            **nfkc_hypers(hypers)})
        # Fixed by build():
        self.out_shape = None   # per-example shape tuple, or list for pyramids
        self.n_ops = 0.0

    def l2_specs(self):
        """param name -> (k_l2, w_eq) for weights whose c_mod is the static
        L2-vs-identity penalty; consumed by the analytic-L2 update path
        (ops.config.analytic_l2). w_eq None means zero."""
        return {}

    # -- static shape/op-count inference (one host pass, before any compile) --
    def build(self, x_shape):
        self.out_shape = x_shape
        self.n_ops = 0.0

    # -- parameters & state --
    def init(self, key, x_shape):
        return {}

    def init_state(self, x_shape):
        return {}

    # -- pure forward --
    def apply(self, params, state, x, y, ctx):
        return x, state, Aux()


class NoOp(Layer):
    """Identity; the default root of a Net
    (reference scripts/lib/layer_types.py:32-33)."""


################################################################################
# Transformation layers
################################################################################

class LinTrans(Layer):
    """Flatten -> dense, with optional identity-residual init and L2 penalty
    measured relative to identity (reference scripts/lib/layer_types.py:39-53).

    n_ops = n_in * n_chan (reference :53)."""

    default_hypers = dict(n_chan=1, k_l2=0, σ_w=1, res=False)

    def build(self, x_shape):
        h = self.hypers
        self._n_in = _prod(x_shape)
        self._w_eq = (np.eye(self._n_in, h.n_chan, dtype=np.float32)
                      if h.res else np.float32(0.0))
        self.out_shape = (h.n_chan,)
        self.n_ops = float(self._n_in * h.n_chan)

    def init(self, key, x_shape):
        h = self.hypers
        w_scale = h.σ_w / math.sqrt(self._n_in)
        w = self._w_eq + w_scale * jax.random.normal(
            key, (self._n_in, h.n_chan), jnp.float32)
        return {"w": w, "b": jnp.zeros((h.n_chan,), jnp.float32)}

    def apply(self, params, state, x, y, ctx):
        h = self.hypers
        x2 = x.reshape((x.shape[0], -1))
        out = _bias_add(_matmul(x2, params["w"]), params["b"])
        if config.analytic_l2:
            return out, state, Aux()
        c_mod = h.k_l2 * jnp.sum(jnp.square(params["w"] - self._w_eq))
        return out, state, Aux(c_mod=c_mod)

    def l2_specs(self):
        return {"w": (float(self.hypers.k_l2), self._w_eq)}


class Conv(Layer):
    """SAME stride-1 conv + bias, optional identity-kernel residual init,
    L2-vs-identity (reference scripts/lib/layer_types.py:55-74).

    n_ops = n_pix * supp^2 * n_in * n_chan (reference :74)."""

    default_hypers = dict(n_chan=1, supp=1, k_l2=0, σ_w=1, res=False)

    def build(self, x_shape):
        h = self.hypers
        n_in = x_shape[-1]
        n_pix = _prod(x_shape[:2])
        if h.res:
            ident = ((np.arange(h.supp) == h.supp // 2)[:, None, None, None]
                     * (np.arange(h.supp) == h.supp // 2)[:, None, None]
                     * np.eye(n_in, h.n_chan))
            self._w_eq = np.float32(ident)
        else:
            self._w_eq = np.float32(0.0)
        self._n_in = n_in
        self.out_shape = x_shape[:2] + (h.n_chan,)
        self.n_ops = float(n_pix * h.supp ** 2 * n_in * h.n_chan)

    def init(self, key, x_shape):
        h = self.hypers
        w_scale = h.σ_w / h.supp / math.sqrt(self._n_in)
        w = self._w_eq + w_scale * jax.random.normal(
            key, (h.supp, h.supp, self._n_in, h.n_chan), jnp.float32)
        return {"w": w, "b": jnp.zeros((h.n_chan,), jnp.float32)}

    def apply(self, params, state, x, y, ctx):
        h = self.hypers
        out = _bias_add(conv_same(x, params["w"]), params["b"])
        if config.analytic_l2:
            return out, state, Aux()
        c_mod = h.k_l2 * jnp.sum(jnp.square(params["w"] - self._w_eq))
        return out, state, Aux(c_mod=c_mod)

    def l2_specs(self):
        return {"w": (float(self.hypers.k_l2), self._w_eq)}


class Rect(Layer):
    """ReLU (reference scripts/lib/layer_types.py:76-79)."""

    def apply(self, params, state, x, y, ctx):
        return jax.nn.relu(x), state, Aux()


class Softmax(Layer):
    """Softmax over the class axis (reference scripts/lib/layer_types.py:81-84).

    Always computed (and returned) in fp32: class probabilities feed the
    loss and every accuracy/routing statistic, and the (B, n_cls) tensor is
    tiny, so precision is free here even under a bf16 activation policy."""

    def apply(self, params, state, x, y, ctx):
        return jax.nn.softmax(x.astype(jnp.float32), axis=-1), state, Aux()


class MaxPool(Layer):
    """Strided SAME max-pool (reference scripts/lib/layer_types.py:86-94).

    Note: the reference passes its `stride` hyper as the TF kernel size and
    `supp` as the stride (transposed arguments to tf.nn.max_pool), so what
    it actually computes is window=stride, stride=supp. By default this
    class implements the documented intent -- window `supp`, stride
    `stride`; config.set_maxpool_tf1(True) reproduces the reference's
    transposed behavior for reference-checkpoint imports (the layer is
    unused by every reference experiment, so nothing registry-level
    depends on the choice; tests/test_layers.py pins both modes)."""

    default_hypers = dict(stride=1, supp=1)

    def _window_stride(self):
        if config.maxpool_tf1:
            return self.hypers.stride, self.hypers.supp
        return self.hypers.supp, self.hypers.stride

    def build(self, x_shape):
        h, w = x_shape[:2]
        _, s = self._window_stride()
        self.out_shape = (-(-h // s), -(-w // s)) + (x_shape[2],)
        self.n_ops = 0.0

    def apply(self, params, state, x, y, ctx):
        supp, stride = self._window_stride()
        return max_pool_same(x, supp, stride), state, Aux()


class GlobalMaxPool(Layer):
    """Max over all non-batch, non-channel dims
    (reference scripts/lib/layer_types.py:96-100)."""

    def build(self, x_shape):
        self.out_shape = (x_shape[-1],)
        self.n_ops = 0.0

    def apply(self, params, state, x, y, ctx):
        dims = tuple(range(1, x.ndim - 1))
        return jnp.max(x, axis=dims), state, Aux()


################################################################################
# Multiscale transformation layers
################################################################################

def _tf1_legacy_resize(x, out_h, out_w):
    """TF1 `tf.image.resize_images` bilinear, align_corners=False (the
    pre-TF2 legacy grid): src = dst * (in/out) with NO half-pixel shift,
    clamped (reference scripts/lib/layer_types.py:122-124). At integer
    ratios the interpolation weights are exactly zero, so the fast path is
    a strided slice (gather-free; matters on TPU). Index/weight tables are
    computed at trace time from static shapes."""
    n, h, w, c = x.shape
    if h % out_h == 0 and w % out_w == 0:
        return x[:, ::h // out_h, ::w // out_w]
    ys = np.arange(out_h) * (h / out_h)
    xs = np.arange(out_w) * (w / out_w)
    y0 = np.floor(ys).astype(np.int32)
    x0 = np.floor(xs).astype(np.int32)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = jnp.asarray((ys - y0)[None, :, None, None], x.dtype)
    wx = jnp.asarray((xs - x0)[None, None, :, None], x.dtype)
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


class ToPyramid(Layer):
    """Image pyramid: n_scales bilinear-resized copies at (h/2^i, w/2^i);
    downstream activations become lists of arrays
    (reference scripts/lib/layer_types.py:118-125).

    Resizing uses jax.image half-pixel-center bilinear (the modern, better
    behaved kernel) rather than TF1's legacy grid; parity for training curves
    is behavioral, not bitwise. `ops.config.set_pyramid_tf1(True)` switches
    to the exact TF1 legacy grid for reference-checkpoint import/validation
    (PARITY.md: trained params do not transfer across grids)."""

    default_hypers = dict(n_scales=1)

    def build(self, x_shape):
        h, w, c = x_shape
        self.out_shape = [(h // 2 ** i, w // 2 ** i, c)
                          for i in range(self.hypers.n_scales)]
        self.n_ops = 0.0

    def apply(self, params, state, x, y, ctx):
        out = []
        for (h, w, c) in self.out_shape:
            if (h, w) == x.shape[1:3]:
                out.append(x)
            elif config.pyramid_tf1:
                out.append(_tf1_legacy_resize(x, h, w))
            else:
                out.append(jax.image.resize(
                    x, (x.shape[0], h, w, c), method="bilinear"))
        return out, state, Aux()


class MultiscaleLLN(Layer):
    """Local luminance normalization per pyramid scale: divide by a
    Gaussian-weighted Rec.709 luma with border-density correction
    (reference scripts/lib/layer_types.py:127-147).

    The density map depends only on shape, so it is precomputed at build time
    as a constant instead of convolving a ones-image every step."""

    default_hypers = dict(shape0=(1, 1), σ=3, ϵ=1e-3)

    def build(self, x_shape):
        h = self.hypers
        s = int(np.ceil(2 * h.σ))
        u = np.linspace(-s, s, 2 * s + 1)[:, None, None, None]
        v = np.linspace(-s, s, 2 * s + 1)[:, None, None]
        k = (np.exp(-(u ** 2 + v ** 2) / (2 * h.σ ** 2))
             / (2 * np.pi * h.σ ** 2)
             * [[0.2126], [0.7152], [0.0722]])
        self._k = jnp.asarray(k, jnp.float32)  # (2s+1, 2s+1, 3, 1)
        self._density = []
        for shp in x_shape:
            ones = jnp.ones((1,) + tuple(shp), jnp.float32)
            self._density.append(np.asarray(
                lax.conv_general_dilated(
                    ones, self._k, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))))
        self.out_shape = list(x_shape)
        self.n_ops = 0.0

    def apply(self, params, state, x, y, ctx):
        h = self.hypers
        out = []
        for x_i, dens in zip(x, self._density):
            lum = lax.conv_general_dilated(
                x_i, self._k.astype(x_i.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            out.append(x_i / (lum / jnp.asarray(dens, x_i.dtype)
                              + jnp.asarray(h.ϵ, x_i.dtype)))
        return out, state, Aux()


class MultiscaleConvMax(Layer):
    """The core CNN block (reference scripts/lib/layer_types.py:149-194).

    Takes a pyramid, outputs a pyramid covering the *last* len(n_chan) input
    scales. Scale 0 of the output (the finest kept scale) is a plain
    "horizontal" conv of its input scale; every subsequent (coarser) scale
    adds a "vertical" conv of the max-pooled previous output scale:

        out[0] = b[0] + conv(x[S-L],   w_horz[0])
        out[j] = b[j] + conv(x[S-L+j], w_horz[j]) + conv(pool2(out[j-1]), w_vert[j-1])

    Weight L2 covers w_horz and w_vert (not biases); the analytic op count is
    sum_j n_pix(out[j]) * (n_el(w_horz[j]) + n_el(w_vert[j-1]) if j>0)
    (reference :186-194). Parameter names w_horz_i / w_vert_i / b_i match the
    reference checkpoint schema."""

    default_hypers = dict(n_chan=(), supp=1, k_l2=0, σ_w=1)

    def build(self, x_shape):
        h = self.hypers
        L = len(h.n_chan)
        S = len(x_shape)
        self._L = L
        kept = x_shape[S - L:]
        self._w_horz_shapes = [
            (min(h.supp, kept[j][0]), min(h.supp, kept[j][1]),
             kept[j][2], h.n_chan[j])
            for j in range(L)]
        self._w_vert_shapes = [
            (h.supp, h.supp, h.n_chan[j], h.n_chan[j + 1])
            for j in range(L - 1)]
        self.out_shape = [kept[j][:2] + (h.n_chan[j],) for j in range(L)]
        self.n_ops = float(sum(
            _prod(self.out_shape[j][:2]) * (
                _prod(self._w_horz_shapes[j])
                + (_prod(self._w_vert_shapes[j - 1]) if j > 0 else 0))
            for j in range(L)))

    def init(self, key, x_shape):
        h = self.hypers
        L = self._L
        keys = jax.random.split(key, 2 * L)
        params = {}
        for j, shp in enumerate(self._w_horz_shapes):
            scale = h.σ_w / h.supp / math.sqrt(shp[2])
            params[f"w_horz_{j}"] = scale * jax.random.normal(
                keys[j], shp, jnp.float32)
        for j, shp in enumerate(self._w_vert_shapes):
            scale = h.σ_w / h.supp / math.sqrt(h.n_chan[j])
            params[f"w_vert_{j}"] = scale * jax.random.normal(
                keys[L + j], shp, jnp.float32)
        for j in range(L):
            params[f"b_{j}"] = jnp.zeros((h.n_chan[j],), jnp.float32)
        return params

    def _pallas_eligible(self):
        """The fused kernel assumes full supp x supp horizontal kernels
        (true for every reference arch: smallest scale is 4x4 >= supp=3)
        and even spatial dims for the in-kernel pool2."""
        h = self.hypers
        return (h.supp % 2 == 1 and h.supp > 1
                and all(s[0] == h.supp and s[1] == h.supp
                        for s in self._w_horz_shapes)
                and all(s[0] % 2 == 0 and s[1] % 2 == 0
                        for s in self.out_shape[:-1]))

    def apply(self, params, state, x, y, ctx):
        h = self.hypers
        L = self._L
        if config.use_pallas and self._pallas_eligible():
            from .kernels import fused_mcm
            whs = [params[f"w_horz_{j}"] for j in range(L)]
            wvs = [params[f"w_vert_{j}"] for j in range(L - 1)]
            bs = [params[f"b_{j}"] for j in range(L)]
            out = fused_mcm(x, whs, wvs, bs, h.supp,
                            config.pallas_interpret)
            if config.analytic_l2:
                return out, state, Aux()
            c_mod = h.k_l2 * (
                sum(jnp.sum(jnp.square(w)) for w in whs)
                + sum(jnp.sum(jnp.square(w)) for w in wvs))
            return out, state, Aux(c_mod=c_mod)
        kept = x[len(x) - L:]
        out = [None] * L
        out[0] = _bias_add(conv_same(kept[0], params["w_horz_0"]),
                           params["b_0"])
        for j in range(1, L):
            out[j] = _bias_add(
                conv_same(kept[j], params[f"w_horz_{j}"])
                + conv_same(_pool2(out[j - 1]), params[f"w_vert_{j-1}"]),
                params[f"b_{j}"])
        if config.analytic_l2:
            return out, state, Aux()
        c_mod = h.k_l2 * (
            sum(jnp.sum(jnp.square(params[f"w_horz_{j}"])) for j in range(L))
            + sum(jnp.sum(jnp.square(params[f"w_vert_{j}"]))
                  for j in range(L - 1)))
        return out, state, Aux(c_mod=c_mod)

    def l2_specs(self):
        h = self.hypers
        L = self._L
        specs = {f"w_horz_{j}": (float(h.k_l2), None) for j in range(L)}
        specs.update({f"w_vert_{j}": (float(h.k_l2), None)
                      for j in range(L - 1)})
        return specs


class MultiscaleRect(Layer):
    """ReLU mapped over the pyramid (reference scripts/lib/layer_types.py:196-199)."""

    def build(self, x_shape):
        self.out_shape = list(x_shape)
        self.n_ops = 0.0

    def apply(self, params, state, x, y, ctx):
        return [jax.nn.relu(x_i) for x_i in x], state, Aux()


class Select(Layer):
    """Pick one scale from the pyramid (reference scripts/lib/layer_types.py:201-206)."""

    default_hypers = dict(i=0)

    def build(self, x_shape):
        self.out_shape = x_shape[self.hypers.i]
        self.n_ops = 0.0

    def apply(self, params, state, x, y, ctx):
        return x[self.hypers.i], state, Aux()


################################################################################
# Regularization layers
################################################################################

class Dropout(Layer):
    """Keep-prob dropout with 1/keep rescale. Like the reference, it is NOT
    mode-gated -- it applies in train and eval alike
    (reference scripts/lib/layer_types.py:212-217); keep=1 (the default)
    compiles to identity."""

    default_hypers = dict(λ=1)

    def apply(self, params, state, x, y, ctx):
        lam = self.hypers.λ
        if lam >= 1 or ctx.rng is None:
            return x, state, Aux()
        key = jax.random.fold_in(ctx.rng, self._uid)
        keep = jax.random.bernoulli(key, lam, x.shape)
        return jnp.where(keep, x / lam, 0.0), state, Aux()


class BatchNorm(Layer):
    """Batch normalization with EMA running stats (decay d), train/eval
    switched by the static ctx.train flag instead of the reference's
    tf.cond-on-mode (reference scripts/lib/layer_types.py:219-239).

    gamma/beta are trainable params; m_avg/v_avg are non-trainable state
    updated only in train mode. Train mode normalizes with batch moments."""

    default_hypers = dict(d=0.9, ϵ=1e-6)

    def build(self, x_shape):
        self.out_shape = x_shape
        self._n_chan = x_shape[-1]
        self.n_ops = 0.0

    def init(self, key, x_shape):
        n = self._n_chan
        return {"γ": jnp.ones((n,), jnp.float32),
                "β": jnp.zeros((n,), jnp.float32)}

    def init_state(self, x_shape):
        n = self._n_chan
        return {"m_avg": jnp.zeros((n,), jnp.float32),
                "v_avg": jnp.ones((n,), jnp.float32)}

    def apply(self, params, state, x, y, ctx):
        h = self.hypers
        if ctx.train:
            axes = tuple(range(x.ndim - 1))
            # Batch moments accumulate in fp32 regardless of the activation
            # dtype (bf16 mean over B*H*W values loses too many bits).
            xf = x if x.dtype == jnp.float32 else x.astype(jnp.float32)
            m = jnp.mean(xf, axes)
            v = jnp.mean(jnp.square(xf), axes) - jnp.square(m)
            new_state = {
                "m_avg": h.d * state["m_avg"] + (1 - h.d) * lax.stop_gradient(m),
                "v_avg": h.d * state["v_avg"] + (1 - h.d) * lax.stop_gradient(v),
            }
        else:
            m, v = state["m_avg"], state["v_avg"]
            new_state = state
        if x.dtype == jnp.float32:
            out = params["γ"] * (x - m) / jnp.sqrt(v + h.ϵ) + params["β"]
        else:
            # bf16 activations: fold the normalization into one per-channel
            # affine computed in fp32, applied in the activation dtype (a
            # single fused multiply-add pass; avoids promoting x to fp32).
            scale = params["γ"] / jnp.sqrt(v + h.ϵ)
            shift = params["β"] - scale * m
            out = x * scale.astype(x.dtype) + shift.astype(x.dtype)
        return out, new_state, Aux()


class MultiscaleBatchNorm(Layer):
    """One BatchNorm per pyramid scale, exposed as comps
    (reference scripts/lib/layer_types.py:241-249)."""

    default_hypers = dict(d=0.9, ϵ=1e-6)

    def build(self, x_shape):
        h = self.hypers
        self.comps = [BatchNorm(d=h.d, ϵ=h.ϵ) for _ in x_shape]
        for comp, shp in zip(self.comps, x_shape):
            comp.build(shp)
        self.out_shape = list(x_shape)
        self.n_ops = 0.0

    def init(self, key, x_shape):
        keys = jax.random.split(key, max(len(self.comps), 1))
        return {"comps": [c.init(k, s) for c, k, s in
                          zip(self.comps, keys, x_shape)]}

    def init_state(self, x_shape):
        return {"comps": [c.init_state(s)
                          for c, s in zip(self.comps, x_shape)]}

    def apply(self, params, state, x, y, ctx):
        outs, new_states = [], []
        for comp, p, s, x_i in zip(self.comps, params["comps"],
                                   state["comps"], x):
            o, ns, _ = comp.apply(p, s, x_i, y, ctx)
            outs.append(o)
            new_states.append(ns)
        return outs, {"comps": new_states}, Aux()


################################################################################
# Error layers
################################################################################

def _delta_cor(x, y):
    return (jnp.argmax(x, axis=1) == jnp.argmax(y, axis=1)).astype(jnp.float32)


class SquaredError(Layer):
    """Per-example sum-of-squares error + correctness indicator
    (reference scripts/lib/layer_types.py:255-260)."""

    def apply(self, params, state, x, y, ctx):
        xf = x.astype(jnp.float32)
        c_err = jnp.sum(jnp.square(xf - y), axis=1)
        return x, state, Aux(c_err=c_err, delta_cor=_delta_cor(x, y))


class CrossEntropyError(Layer):
    """Cross-entropy on already-softmaxed probs with an eps-floor
    p_cls = eps/n_cls + (1-eps)*x (reference scripts/lib/layer_types.py:262-272)."""

    default_hypers = dict(ϵ=1e-6)

    def apply(self, params, state, x, y, ctx):
        eps = self.hypers.ϵ
        n_cls = y.shape[1]
        p_cls = eps / n_cls + (1 - eps) * x.astype(jnp.float32)
        c_err = -jnp.sum(y * jnp.log(p_cls), axis=1)
        return x, state, Aux(c_err=c_err, delta_cor=_delta_cor(x, y))


class SuperclassCrossEntropyError(Layer):
    """Cross-entropy against labels projected through w_cls
    (reference scripts/lib/layer_types.py:274-285)."""

    default_hypers = dict(w_cls=None, ϵ=1e-6)

    def apply(self, params, state, x, y, ctx):
        eps = self.hypers.ϵ
        w_cls = jnp.asarray(self.hypers.w_cls, jnp.float32)
        y_sup = jnp.dot(y, w_cls)
        n_cls = y_sup.shape[1]
        p_cls = eps / n_cls + (1 - eps) * x.astype(jnp.float32)
        c_err = -jnp.sum(y_sup * jnp.log(p_cls), axis=1)
        return x, state, Aux(c_err=c_err, delta_cor=_delta_cor(x, y_sup))


class ActivityError(Layer):
    """Per-example activity (L2 of activations) regularizer as c_mod
    (reference scripts/lib/layer_types.py:287-293)."""

    default_hypers = dict(α=0.0)

    def apply(self, params, state, x, y, ctx):
        dims = tuple(range(1, x.ndim))
        xf = x.astype(jnp.float32)
        return x, state, Aux(c_mod=self.hypers.α *
                             jnp.sum(jnp.square(xf), axis=dims))


################################################################################
# Compound layers
################################################################################

class Chain(Layer):
    """Sequential composition; sums c_err/c_mod/n_ops over comps and forwards
    the last comp's delta_cor (reference scripts/lib/layer_types.py:299-310).
    Chains are the unit nodes of the routing tree."""

    def build(self, x_shape):
        shape = x_shape
        for comp in self.comps:
            comp.build(shape)
            shape = comp.out_shape
        self.out_shape = shape
        self.n_ops = float(sum(c.n_ops for c in self.comps))

    def init(self, key, x_shape):
        keys = jax.random.split(key, max(len(self.comps), 1))
        params, shape = [], x_shape
        for comp, k in zip(self.comps, keys):
            params.append(comp.init(k, shape))
            shape = comp.out_shape
        return {"comps": params}

    def init_state(self, x_shape):
        states, shape = [], x_shape
        for comp in self.comps:
            states.append(comp.init_state(shape))
            shape = comp.out_shape
        return {"comps": states}

    def apply(self, params, state, x, y, ctx):
        new_states = []
        c_err, c_mod, last_aux = 0.0, 0.0, None
        for comp, p, s in zip(self.comps, params["comps"], state["comps"]):
            x, ns, aux = comp.apply(p, s, x, y, ctx)
            new_states.append(ns)
            c_err = c_err + aux.c_err
            c_mod = c_mod + aux.c_mod
            last_aux = aux
        # Forward only the LAST comp's correctness indicator, as the
        # reference does (scripts/lib/layer_types.py:309-310).
        delta_cor = last_aux.delta_cor if last_aux is not None else None
        return x, {"comps": new_states}, Aux(
            c_err=c_err, c_mod=c_mod, delta_cor=delta_cor)
