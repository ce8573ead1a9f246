from .mesh import (MeshSpec, create_mesh, batch_sharding, param_shardings,
                   replicated, shard_batch)
from .pipeline import (microbatch, pipeline_apply, stack_layer_params,
                       unmicrobatch)

__all__ = ["MeshSpec", "create_mesh", "batch_sharding", "param_shardings",
           "replicated", "shard_batch",
           "microbatch", "pipeline_apply", "stack_layer_params",
           "unmicrobatch"]
