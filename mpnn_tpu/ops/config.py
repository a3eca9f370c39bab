"""Global compute-precision policy for the layer zoo.

Parameters are always stored float32 (master weights). When
`compute_dtype` is set to `jnp.bfloat16`, matmuls/convs cast their inputs and
weights to bf16 and accumulate in float32 (`preferred_element_type`), which is
the MXU-optimal configuration on TPU. Default is None (pure float32), which
matches the TF1 reference numerically (the reference trains fp32 throughout).
"""

import jax.numpy as jnp

compute_dtype = None  # None => float32 everywhere

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
