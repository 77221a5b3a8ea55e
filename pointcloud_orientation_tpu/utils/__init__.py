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
from .stablehlo_export import (
    export_orientation_model,
    load_artifact,
    save_artifact,
)
from .quantize import (
    dequantize_params,
    load_quantized_checkpoint,
    param_bytes,
    quantize_params_int8,
    save_quantized_checkpoint,
)

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
    "export_orientation_model",
    "save_artifact",
    "load_artifact",
    "quantize_params_int8",
    "dequantize_params",
    "param_bytes",
    "save_quantized_checkpoint",
    "load_quantized_checkpoint",
]
