from .init import glorot, torch_linear_params, zeros_init
from . import conv

__all__ = ["glorot", "torch_linear_params", "zeros_init", "conv"]
