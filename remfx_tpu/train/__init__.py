from remfx_tpu.train.tasks import ClassifierTask, RemovalTask, TrainState
from remfx_tpu.train.loop import build_datamodule, build_task, evaluate, fit, test

__all__ = [
    "ClassifierTask",
    "RemovalTask",
    "TrainState",
    "build_datamodule",
    "build_task",
    "evaluate",
    "fit",
    "test",
]
