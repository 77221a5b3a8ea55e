from .mesh import (
    make_mesh,
    batch_sharding,
    replicate,
    shard_batch,
    data_axis_size,
)
from .tp import make_tp_train_step, shard_tp_params, tp_param_specs

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicate",
    "shard_batch",
    "data_axis_size",
    "tp_param_specs",
    "shard_tp_params",
    "make_tp_train_step",
]
