from .config import TrainConfig, PRESETS, preset
from .tasks import TASKS, TaskAdapter
from .trainer import Trainer, TrainState
from .metrics import MetricsAccumulator, write_summary_txt

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
]
