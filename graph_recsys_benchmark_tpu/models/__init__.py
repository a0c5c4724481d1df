from .pea import PEAConfig, pea_init, pea_forward, pea_predict, pea_loss

__all__ = [
    "PEAConfig",
    "pea_init",
    "pea_forward",
    "pea_predict",
    "pea_loss",
]
