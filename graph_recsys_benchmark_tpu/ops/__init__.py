from .segment import (
    segment_sum,
    segment_max,
    segment_mean,
    segment_softmax,
)
from .pallas_segment import (
    sorted_segment_sum_pallas,
    segment_sum_auto,
    segment_softmax_pallas,
    segment_softmax_auto,
)
from .gather import gather_rows, gather_src, gather_dst

__all__ = [
    "segment_sum",
    "segment_max",
    "segment_mean",
    "segment_softmax",
    "sorted_segment_sum_pallas",
    "segment_sum_auto",
    "segment_softmax_pallas",
    "segment_softmax_auto",
    "gather_rows",
    "gather_src",
    "gather_dst",
]
