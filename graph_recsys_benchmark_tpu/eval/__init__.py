from .metrics import ranks_to_metrics, hit_vec_metrics
from .ranking import rank_candidates, evaluate_ranking

__all__ = [
    "ranks_to_metrics",
    "hit_vec_metrics",
    "rank_candidates",
    "evaluate_ranking",
]
