"""Pallas TPU kernels for the hot ops.

`fused_mcm`: the MultiscaleConvMax block (SURVEY.md section 2 #9 -- the
framework's dominant compute) as ONE Pallas kernel per stage instead of
~10 XLA ops (4 horizontal convs + 3 pools + 3 vertical convs + bias adds).
Inside the kernel each 3x3 SAME conv is an im2col + a single MXU matmul
(K = 9*C_in), scales are processed coarse-ward with the pool2+vertical-conv
chain kept entirely in VMEM, and products accumulate in fp32.

The backward pass runs through the mathematically-identical XLA
implementation (`mcm_xla`) via custom_vjp: conv is linear, so the XLA
cotangent is the exact derivative; this keeps training correctness pinned
to the well-tested lax.conv path while inference and the forward half of
training use the fused kernel. Use `mpnn_tpu.ops.config.use_pallas` to
enable (off by default; MultiscaleConvMax.apply picks the path).

Kernel layout notes (see /opt/skills/guides/pallas_guide.md):
- grid over batch tiles; each program holds one tile's full pyramid in VMEM
- weights are pre-packed (kh*kw*C_in, C_out) and live in VMEM unblocked
- min-tile alignment is left to Mosaic; all shapes here are static

MEASURED VERDICT (v5e, b128 stage-0 shapes, bf16): this kernel compiles and
matches the XLA path numerically (<=0.5% rel, bf16 accumulation-order), but
runs ~4x SLOWER (505us vs 126us per stage forward): with 3-16 channels in
the lane dimension, register tiles are ~97% padding and the per-tap K=C_in
matmuls underutilize the MXU, while XLA's conv uses space-to-depth internal
layouts. It therefore stays OFF by default; the XLA conv path is the
production path on TPU. Kept as a correct, tested scaffold for a future
channel-packed layout."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import config


def _pack_w(w):
    """(kh, kw, Cin, Cout) -> (kh*kw*Cin, Cout), tap-major like im2col."""
    kh, kw, ci, co = w.shape
    return w.reshape(kh * kw * ci, co)


def _pool2_dense(x):
    b, h, w, c = x.shape
    return jnp.max(x.reshape(b, h // 2, 2, w // 2, 2, c), axis=(2, 4))


def mcm_xla(xs, whs, wvs, bs):
    """Reference XLA implementation of the MCM dataflow (identical math to
    MultiscaleConvMax.apply; reference scripts/lib/layer_types.py:180-185).
    Used as the custom_vjp backward and as the non-Pallas fallback."""
    L = len(whs)
    kept = xs[len(xs) - L:]

    def conv(x, w):
        if config.compute_dtype is not None:
            x = x.astype(config.compute_dtype)
            w = w.astype(config.compute_dtype)
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    outs = [None] * L
    out0 = conv(kept[0], whs[0])
    outs[0] = out0 + bs[0].astype(out0.dtype)
    for j in range(1, L):
        o = outs[j - 1]
        if o.shape[1] % 2 == 0 and o.shape[2] % 2 == 0:
            pooled = _pool2_dense(o)  # reshape-max: cheap backward
        else:
            pooled = lax.reduce_window(o, -jnp.inf, lax.max,
                                       (1, 2, 2, 1), (1, 2, 2, 1), "SAME")
        oj = conv(kept[j], whs[j]) + conv(pooled, wvs[j - 1])
        outs[j] = oj + bs[j].astype(oj.dtype)
    return outs


def _mcm_kernel(L, shapes, out_shapes, supp, *refs):
    """Pallas kernel body. refs = [x_0..x_{L-1}, whp_0.., wvp_0.., b_0..,
    out_0..]. Processes one batch tile: each scale's conv is supp^2
    tap-shifted matmuls accumulated in fp32 on the MXU (an unrolled im2col;
    Mosaic's tpu.concatenate can't fuse shifted-layout taps into a single
    K=supp^2*C matrix, so taps stay separate); the vertical path pools the
    previous scale's fp32 output in registers."""
    xs = refs[:L]
    whp = refs[L:2 * L]
    wvp = refs[2 * L:3 * L - 1]
    bs = refs[3 * L - 1:4 * L - 1]
    outs = refs[4 * L - 1:]
    pad = supp // 2

    def conv_taps(x, wp, c_in, acc):
        # x: (TB, H, W, C); wp: (supp*supp*C, Cout) tap-major rows.
        tb, h, w, c = x.shape
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        for dy in range(supp):
            for dx in range(supp):
                tap = xp[:, dy:dy + h, dx:dx + w, :].reshape(tb * h * w, c)
                k = (dy * supp + dx) * c_in
                wk = wp[k:k + c_in, :]
                acc = acc + jnp.dot(tap, wk,
                                    preferred_element_type=jnp.float32)
        return acc

    prev = None
    for j in range(L):
        tb, h, w, c = xs[j].shape
        co = whp[j].shape[-1]
        acc = jnp.zeros((tb * h * w, co), jnp.float32) + bs[j][:]
        acc = conv_taps(xs[j][:], whp[j], c, acc)
        if j > 0:
            pooled = _pool2_dense(prev).astype(xs[j].dtype)
            acc = conv_taps(pooled, wvp[j - 1], pooled.shape[-1], acc)
        acc = acc.reshape(tb, h, w, co)
        outs[j][:] = acc
        prev = acc


def fused_mcm_forward(xs, whs, wvs, bs, supp, batch_tile=4,
                      interpret=False):
    """Run the fused MCM stage via Pallas. xs: pyramid tail (list of NHWC),
    whs/wvs/bs: weight lists as in MultiscaleConvMax params."""
    L = len(whs)
    kept = xs[len(xs) - L:]
    B = kept[0].shape[0]
    tb = min(batch_tile, B)
    while B % tb:
        tb -= 1
    grid = (B // tb,)

    cdt = config.compute_dtype or jnp.float32
    kept = [x.astype(cdt) for x in kept]
    whp = [_pack_w(w).astype(cdt) for w in whs]
    wvp = [_pack_w(w).astype(cdt) for w in wvs]
    bsf = [b.astype(jnp.float32).reshape(1, -1) for b in bs]

    out_shapes = [
        jax.ShapeDtypeStruct((B,) + kept[j].shape[1:3] + (whs[j].shape[-1],),
                             jnp.float32)
        for j in range(L)]

    def tile_spec(shape):
        return pl.BlockSpec((tb,) + shape[1:],
                            lambda i: (i, 0, 0, 0),
                            memory_space=pl.ANY if interpret
                            else pltpu.VMEM)

    def full_spec(arr):
        return pl.BlockSpec(arr.shape,
                            lambda i: tuple(0 for _ in arr.shape),
                            memory_space=pl.ANY if interpret
                            else pltpu.VMEM)

    in_specs = ([tile_spec(x.shape) for x in kept]
                + [full_spec(w) for w in whp]
                + [full_spec(w) for w in wvp]
                + [full_spec(b) for b in bsf])
    out_specs = [tile_spec(s.shape) for s in out_shapes]

    shapes = [x.shape for x in kept]
    kernel = functools.partial(_mcm_kernel, L, shapes,
                               [s.shape for s in out_shapes], supp)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*kept, *whp, *wvp, *bsf)
    # The kernel accumulates and writes fp32; under a compute policy the
    # stage's output dtype must match mcm_xla's (bf16), or the custom_vjp
    # cotangent dtypes disagree with the XLA-backward primal.
    if config.compute_dtype is not None:
        outs = [o.astype(config.compute_dtype) for o in outs]
    return list(outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_mcm(xs, whs, wvs, bs, supp, interpret=False):
    """MCM stage: Pallas forward, exact XLA backward (conv is linear, so the
    XLA-path cotangent is the true derivative of the same function)."""
    return fused_mcm_forward(xs, whs, wvs, bs, supp, interpret=interpret)


def _fused_mcm_fwd(xs, whs, wvs, bs, supp, interpret):
    outs = fused_mcm_forward(xs, whs, wvs, bs, supp, interpret=interpret)
    return outs, (xs, whs, wvs, bs)


def _fused_mcm_bwd(supp, interpret, res, g):
    xs, whs, wvs, bs = res
    _, vjp = jax.vjp(mcm_xla, xs, whs, wvs, bs)
    return vjp(list(g))


fused_mcm.defvjp(_fused_mcm_fwd, _fused_mcm_bwd)
