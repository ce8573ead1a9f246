from .mesh import (MeshSpec, create_mesh, batch_sharding, param_shardings,
                   replicated, shard_batch)

__all__ = ["MeshSpec", "create_mesh", "batch_sharding", "param_shardings",
           "replicated", "shard_batch"]
