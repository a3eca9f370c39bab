"""Checkpoint → self-contained serving artifact (jax.export / StableHLO).

The reference has no deployment story at all: serving a trained net means
re-importing TF1, rebuilding the graph from the checkpoint's class names and
feeding a Session (reference scripts/lib/serdes.py:40-60). The TPU-native
counterpart exports the routed sparse inference function
(`models/infer.py`) as a *serialized StableHLO artifact*:

- trained params and BN statistics are baked into the module as constants —
  the artifact is closed: loading it needs jax, not this package, not the
  checkpoint, not the model zoo;
- routing runs the capacity-factor sparse engine, so the deployed program
  realizes the compute savings `moc` only accounts for in the reference;
- for dyn_k_cpt (adaptive) checkpoints the cost-of-compute price stays a
  runtime scalar operand: ONE artifact serves every accuracy/compute
  operating point;
- `platforms` may name several lowering targets (e.g. ("tpu", "cpu")) so
  the same bytes run on a v5e serving pod and a CPU canary;
- jax.export guarantees compatibility windows for serialized modules
  (forward ≥6 months), which a pickled python checkpoint never had.

CLI: `scripts/export-net`. Round-trip + parity tests: tests/test_export.py.
"""

import jax
import jax.numpy as jnp
from jax import export as _jax_export

from .models.infer import make_routed_infer_fn

__all__ = ["export_infer", "save_artifact", "load_artifact", "serve_fn"]


def export_infer(net, params, state, *, batch_size, capacities=1.0,
                 dyn_k_cpt=False, platforms=None):
    """Lower the routed-inference function for `net` with `params`/`state`
    baked in as constants; returns a jax.export.Exported.

    The exported callable takes (x0,) — or (x0, k_cpt) when dyn_k_cpt —
    with x0: (batch_size, *x0_shape) float32, and returns the infer dict
    {probs, exit_idx, ops} (models/infer.py:68-72).

    platforms: lowering targets, e.g. ("tpu", "cpu"); None = the default
    platform of the exporting process.
    """
    infer = make_routed_infer_fn(net, batch_size, capacities)
    x_spec = jax.ShapeDtypeStruct(
        (batch_size, *net.hypers.x0_shape), jnp.float32)

    if dyn_k_cpt:
        def serve(x0, k_cpt):
            return infer(params, state, x0, k_cpt)
        specs = (x_spec, jax.ShapeDtypeStruct((), jnp.float32))
    else:
        def serve(x0):
            return infer(params, state, x0)
        specs = (x_spec,)

    kwargs = {} if platforms is None else {"platforms": list(platforms)}
    return _jax_export.export(jax.jit(serve), **kwargs)(*specs)


def save_artifact(exported, path):
    """Serialize an Exported to `path` (raw StableHLO artifact bytes)."""
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(bytes(data))


def load_artifact(path):
    """Deserialize an artifact; returns the jax.export.Exported."""
    with open(path, "rb") as f:
        return _jax_export.deserialize(bytearray(f.read()))


def serve_fn(path):
    """Load an artifact and return a jittable callable.

    `fn(x0)` (or `fn(x0, k_cpt)` for adaptive artifacts) → the infer dict.
    The call is staged through jax.jit so repeated invocations reuse the
    compiled executable.
    """
    exported = load_artifact(path)
    return jax.jit(exported.call)
