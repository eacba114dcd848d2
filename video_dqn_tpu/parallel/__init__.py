from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)
from .sharding import param_specs, param_shardings, shard_params

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "param_specs",
    "param_shardings",
    "shard_params",
]
