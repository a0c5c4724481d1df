from .segment import (
    segment_sum,
    segment_max,
    segment_mean,
    segment_softmax,
)
from .pallas_segment import sorted_segment_sum_pallas, segment_sum_auto

__all__ = [
    "segment_sum",
    "segment_max",
    "segment_mean",
    "segment_softmax",
    "sorted_segment_sum_pallas",
    "segment_sum_auto",
]
