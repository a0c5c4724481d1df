from .hin import HINData, CandidateTables, EntityFeatureTables
from .synthetic import synthetic_mlsmall_raw
from .movielens import build_mlsmall_hin

__all__ = [
    "HINData",
    "CandidateTables",
    "EntityFeatureTables",
    "synthetic_mlsmall_raw",
    "build_mlsmall_hin",
]
