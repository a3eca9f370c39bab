from .mesh import (make_mesh, replicated, batch_sharding, shard_params,
                   replicate_tree, make_sweep_mesh, shard_sweep_tree)
from . import multihost

__all__ = ["make_mesh", "replicated", "batch_sharding", "shard_params",
           "replicate_tree", "make_sweep_mesh", "shard_sweep_tree",
           "multihost"]
