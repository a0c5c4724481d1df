from .hin import HINData, CandidateTables, RejectionCandidates, EntityFeatureTables
from .synthetic import synthetic_mlsmall_raw, synthetic_ml25m_raw, synthetic_yelp_raw
from .movielens import (
    build_mlsmall_hin,
    build_ml25m_hin,
    mlsmall_metapath_edges,
    ml25m_metapath_edges,
)
from .yelp import build_yelp_hin, yelp_metapath_edges

__all__ = [
    "HINData",
    "CandidateTables",
    "RejectionCandidates",
    "EntityFeatureTables",
    "synthetic_mlsmall_raw",
    "synthetic_ml25m_raw",
    "synthetic_yelp_raw",
    "build_mlsmall_hin",
    "build_ml25m_hin",
    "mlsmall_metapath_edges",
    "ml25m_metapath_edges",
    "build_yelp_hin",
    "yelp_metapath_edges",
]
