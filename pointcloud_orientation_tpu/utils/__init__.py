from .torch_import import (
    import_point_transformer_state_dict,
    import_pointnet_pp_state_dict,
    import_pointnet_state_dict,
    load_torch_checkpoint,
)
from .profiling import StepTimer, trace_annotation

__all__ = [
    "import_point_transformer_state_dict",
    "import_pointnet_pp_state_dict",
    "import_pointnet_state_dict",
    "load_torch_checkpoint",
    "StepTimer",
    "trace_annotation",
]
