from .accum import accumulated_value_and_grad, make_accum_train_step
from .config import TrainConfig, PRESETS, preset
from .tasks import TASKS, TaskAdapter
from .trainer import Trainer, TrainState
from .metrics import MetricsAccumulator, write_summary_txt
from .reliability import PreemptionGuard

__all__ = [
    "TrainConfig",
    "PRESETS",
    "preset",
    "TASKS",
    "TaskAdapter",
    "Trainer",
    "TrainState",
    "MetricsAccumulator",
    "write_summary_txt",
    "accumulated_value_and_grad",
    "make_accum_train_step",
    "PreemptionGuard",
]
