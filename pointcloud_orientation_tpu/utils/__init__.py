from .torch_import import (
    import_point_transformer_state_dict,
    import_pointnet_pp_state_dict,
    import_pointnet_state_dict,
    load_torch_checkpoint,
)
from .torch_export import (
    export_point_transformer_state_dict,
    export_pointnet_pp_state_dict,
    export_pointnet_state_dict,
    save_torch_checkpoint,
    to_torch_state_dict,
)
from .profiling import StepTimer, trace_annotation

__all__ = [
    "import_point_transformer_state_dict",
    "import_pointnet_pp_state_dict",
    "import_pointnet_state_dict",
    "load_torch_checkpoint",
    "export_point_transformer_state_dict",
    "export_pointnet_pp_state_dict",
    "export_pointnet_state_dict",
    "save_torch_checkpoint",
    "to_torch_state_dict",
    "StepTimer",
    "trace_annotation",
]
