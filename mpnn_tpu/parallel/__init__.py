from .mesh import (make_mesh, replicated, batch_sharding, shard_params,
                   replicate_tree)

__all__ = ["make_mesh", "replicated", "batch_sharding", "shard_params",
           "replicate_tree"]
