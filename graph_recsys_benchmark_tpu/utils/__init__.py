from .checkpoint import save_checkpoint, load_checkpoint
from .logging import RunLogger

__all__ = ["save_checkpoint", "load_checkpoint", "RunLogger"]
