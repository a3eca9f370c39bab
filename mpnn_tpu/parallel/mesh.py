"""Device-mesh parallelism: named `data` / `model` axes over ICI.

The reference is strictly single-process single-device (one tf.Session per
net, reference scripts/train-nets:159-164; SURVEY.md section 2.2). Here
parallelism is first-class and declarative, the JAX/GSPMD way:

- a 2-D `Mesh` with axes ('data', 'model') spans the slice (e.g. v5e-8 as
  8x1 for pure DP or 4x2 for DP x TP);
- the train batch is sharded over 'data' via a sharding constraint inside
  the jitted step, so forward/backward are data-parallel and XLA inserts the
  gradient all-reduce over ICI automatically;
- optionally, wide conv/dense output-channel dimensions are sharded over
  'model' (tensor parallelism); GSPMD propagates the activation shardings
  and inserts the collectives. Reference-scale nets don't need TP, but the
  mesh admits it as a config change, not a code change (SURVEY.md 2.2).

Pipeline / sequence / expert parallelism are N/A for this model family (no
attention, no sequence dimension; the routing tree itself is the "expert"
analogue and runs as masked dense execution) -- SURVEY.md section 2.2.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "replicated", "batch_sharding", "shard_params",
           "replicate_tree", "make_sweep_mesh", "shard_sweep_tree"]


def make_mesh(n_data=None, n_model=1, devices=None):
    """Build a ('data', 'model') mesh. Default: all devices on 'data'."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    dev_grid = np.asarray(devices[:n_data * n_model]).reshape(
        n_data, n_model)
    return Mesh(dev_grid, ("data", "model"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def batch_sharding(mesh):
    """Batch-axis sharding over 'data' (leading array dim)."""
    return NamedSharding(mesh, P("data"))


def _model_spec(arr, n_model, min_chan):
    """Shard the trailing (output-channel) dim over 'model' when it tiles;
    replicate otherwise. Biases and small heads stay replicated."""
    if (arr.ndim >= 2 and arr.shape[-1] % n_model == 0
            and arr.shape[-1] >= min_chan):
        return P(*([None] * (arr.ndim - 1)), "model")
    return P()


def shard_params(params, mesh, model_parallel=False, min_chan=64):
    """Place a params/state/velocity pytree on the mesh.

    model_parallel=False -> fully replicated (pure DP; the right call at
    reference scale). True -> output channels of large kernels sharded over
    'model' (TP); GSPMD inserts the needed collectives."""
    n_model = mesh.shape["model"]

    def put(arr):
        if model_parallel and n_model > 1:
            spec = _model_spec(arr, n_model, min_chan)
        else:
            spec = P()
        return jax.device_put(arr, NamedSharding(mesh, spec))

    return jax.tree.map(put, params)


def replicate_tree(tree, mesh):
    return jax.tree.map(
        lambda a: jax.device_put(a, replicated(mesh)), tree)


def make_sweep_mesh(n_sweep=None, n_data=1, devices=None):
    """Build a ('sweep', 'data') mesh for vmapped k_cpt-sweep training.

    The flagship v5e-8 deployment shape: the 8-net sweep axis sharded over
    chips (one net per chip, ZERO collectives -- each net's forward/backward
    and its whole optimizer state live on one device), optionally composed
    with a data axis that splits each net's batch (gradient psum over
    'data' only). 8 nets on 8 chips => n_sweep=8, n_data=1."""
    devices = list(devices if devices is not None else jax.devices())
    if n_sweep is None:
        n_sweep = len(devices) // n_data
    grid = np.asarray(devices[:n_sweep * n_data]).reshape(n_sweep, n_data)
    return Mesh(grid, ("sweep", "data"))


def shard_sweep_tree(tree, mesh):
    """Place a stacked sweep pytree (leading axis = sweep member) with the
    sweep axis sharded over the mesh's 'sweep' axis. GSPMD propagates the
    per-net placement through the whole vmapped step."""
    sh = NamedSharding(mesh, P("sweep"))
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)
