from .mesh import (
    make_mesh,
    batch_sharding,
    replicate,
    shard_batch,
    data_axis_size,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicate",
    "shard_batch",
    "data_axis_size",
]
