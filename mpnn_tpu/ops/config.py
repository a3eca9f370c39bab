"""Global compute-precision policy for the layer zoo.

Parameters are always stored float32 (master weights). When
`compute_dtype` is set to `jnp.bfloat16`, matmuls/convs cast their inputs and
weights to bf16 and emit bf16 outputs; the TPU MXU accumulates bf16 products
in float32 in hardware regardless (no `preferred_element_type` is passed --
that would change the *output* dtype, forcing the elementwise tail back to
fp32 and doubling its HBM traffic). Loss reductions and BN moments run in
fp32 islands (see ops/layers.py). Default is None (pure float32), which
matches the TF1 reference numerically (the reference trains fp32 throughout).
"""

import jax.numpy as jnp

compute_dtype = None  # None => float32 everywhere

# Analytic L2: when True, LinTrans/Conv/MultiscaleConvMax SKIP building the
# c_mod = k_l2*sum((w-w_eq)^2) reduction into the forward graph; the train
# step instead adds the mathematically-identical gradient 2*k_l2*(w-w_eq)
# (weighted by the node's mean p_tr exactly as the sg(p_tr)-weighted loss
# term would) and reconstructs the loss VALUE with one fused (P,) reduction.
# The ~64 per-tensor weight-L2 reductions were a top op-count cost of the
# profiled b128 train step. Gradients and loss value are exactly equal
# either way (tests/test_analytic_l2.py); default off to keep single-layer
# unit semantics (Layer.apply returning its own c_mod).
analytic_l2 = False


def set_analytic_l2(flag):
    global analytic_l2
    analytic_l2 = flag


# Use the Pallas fused MultiscaleConvMax kernel (mpnn_tpu.ops.kernels)
# instead of the unfused XLA conv graph. Off by default; flip with
# set_use_pallas(True) (the bench does) or per-run CLI flags.
use_pallas = False
# Run Pallas kernels in interpreter mode (CPU testing).
pallas_interpret = False


def set_use_pallas(flag, interpret=False):
    global use_pallas, pallas_interpret
    use_pallas = flag
    pallas_interpret = interpret


# Activation rematerialization for the train step's backward pass.
# MEASURED AND REFUTED for the flagship sweep workload (tools/tpu_remat.py:
# none 3286 us/step < dots 3526 < full 4109 on v5e): the bf16 activations'
# backward reads are not the binding HBM traffic, so recompute only adds
# work. Keep None here; the knob remains for future (wider/deeper) nets
# where activation footprints actually dominate.
#   None   -- store all activations (XLA default)
#   'full' -- jax.checkpoint with nothing saveable: backward re-runs the
#             forward; minimal activation residuals
#   'dots' -- dots_saveable: matmul/conv outputs saved, elementwise
#             (BN/relu/pool masks) recomputed
remat_policy = None


def set_remat(policy):
    global remat_policy
    assert policy in (None, "full", "dots"), policy
    remat_policy = policy


# Batch congruent sibling subtrees into one vmapped template evaluation
# inside Net.forward (e.g. dr_tree's 8 shared-shape 5-deep tails: the
# unrolled trace is 47 nodes; stacked it is ~12 node templates). Shrinks
# tree HLO (remote compiles observed at 10-20+ min) and batches the many
# small per-tail convs/matmuls into wider MXU ops. Numerics: same math,
# vmapped -- parity covered by tests/test_stacked.py. Off by default so
# the flagship chain-sweep programs keep their compile-cache identity.
stacked_tails = False


def set_stacked_tails(flag):
    global stacked_tails
    stacked_tails = flag


# TF1-parity pyramid mode (VERDICT r2 Missing #3): when True, ToPyramid
# reproduces TF1's legacy `tf.image.resize_images` bilinear grid
# (align_corners=False, src = dst * scale, NO half-pixel shift -- reference
# scripts/lib/layer_types.py:118-125). At the experiments' exact x2 ratios
# this is pure decimation x[:, ::2, ::2] (proven in
# tests/test_pyramid_parity.py). Default False: the half-pixel-center
# kernel is a proper antialiasing filter and the better operator
# (PARITY.md); flip this ONLY to import/validate reference-trained
# checkpoints, whose parameters are not portable across resize grids
# (measured 39% -> 14% acc on a wholesale swap).
pyramid_tf1 = False


def set_pyramid_tf1(flag):
    global pyramid_tf1
    pyramid_tf1 = flag


# Bug-compat mode for MaxPool (reference scripts/lib/layer_types.py:86-94):
# the reference passes its `stride` hyper tuple as tf.nn.max_pool's ksize
# argument and its `supp` k_shape as the strides argument (transposed), so
# what it actually computes is window=stride, stride=supp. Default False
# computes the documented intent (window=supp, stride=stride). Flip this
# ONLY when importing a reference-trained checkpoint that contains a
# MaxPool (none of the registry experiments do), the same way pyramid_tf1
# covers the resize-grid deviation (PARITY.md).
maxpool_tf1 = False


def set_maxpool_tf1(flag):
    global maxpool_tf1
    maxpool_tf1 = flag


def set_compute_dtype(dtype):
    """Set the global compute dtype (None, jnp.float32, or jnp.bfloat16)."""
    global compute_dtype
    compute_dtype = dtype


def cast_compute(*arrays):
    """Cast arrays to the compute dtype (no-op if unset)."""
    if compute_dtype is None:
        return arrays if len(arrays) > 1 else arrays[0]
    out = tuple(a.astype(compute_dtype) for a in arrays)
    return out if len(out) > 1 else out[0]
