from .mesh import (make_mesh, replicated, batch_sharding, shard_params,
                   replicate_tree)
from . import multihost

__all__ = ["make_mesh", "replicated", "batch_sharding", "shard_params",
           "replicate_tree", "multihost"]
