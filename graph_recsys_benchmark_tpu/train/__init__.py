from .optim import make_optimizer
from .sampling import DeviceTables, build_device_tables
from .pea_trainer import PEATrainer, TrainConfig

__all__ = [
    "make_optimizer",
    "DeviceTables",
    "build_device_tables",
    "PEATrainer",
    "TrainConfig",
]
