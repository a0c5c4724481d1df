"""Segment reductions over sorted edge lists — the XLA reference path.

These are the TPU-native replacement for the `torch-scatter` CUDA kernels the
reference implicitly relies on inside every PyG ``MessagePassing.propagate``
call (reference: graph_recsys_benchmark/nn/*.py and the PyG convs imported by
models/pea*.py).  Graph tensors in this framework follow (dst//128, src)
block order (graph.py) — dst is block-monotone but NOT fully sorted, so the
defaults never claim ``indices_are_sorted``; pass True only for ids you know
are strictly non-decreasing (e.g. StepGraph.src_sorted).

``segment_softmax`` reproduces PyG's scatter-softmax
(torch_geometric.utils.softmax, used by GATConv and by the KGAT/KGCN
attention-map recompute, reference: experiments/kgat_solver_bpr.py:320):

    out_e = exp(a_e - max_{e': dst(e')=dst(e)} a_{e'})
    out_e = out_e / (sum_{e': dst(e')=dst(e)} out_e + 1e-16)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments, indices_are_sorted=False):
    """Sum `data` rows into `num_segments` buckets keyed by `segment_ids`."""
    return jax.ops.segment_sum(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_max(data, segment_ids, num_segments, indices_are_sorted=False):
    """Max-reduce; empty segments produce -inf (float) / iinfo.min (int)."""
    return jax.ops.segment_max(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_mean(data, segment_ids, num_segments, indices_are_sorted=False):
    """Mean-reduce; empty segments produce 0 (PyG `aggr='mean'` semantics)."""
    total = segment_sum(data, segment_ids, num_segments, indices_are_sorted)
    ones = jnp.ones(data.shape[:1], dtype=data.dtype)
    count = segment_sum(ones, segment_ids, num_segments, indices_are_sorted)
    count = jnp.maximum(count, 1.0)
    return total / count.reshape((-1,) + (1,) * (data.ndim - 1))


def segment_softmax(logits, segment_ids, num_segments, indices_are_sorted=False):
    """Per-segment softmax over edge logits (PyG `softmax` parity, incl. the
    +1e-16 denominator guard).

    Args:
      logits: float[E] or float[E, H] per-edge (optionally per-head) scores.
      segment_ids: int[E] destination node of each edge, sorted ascending.
    Returns:
      float array of the same shape as `logits`.
    """
    seg_max = segment_max(logits, segment_ids, num_segments, indices_are_sorted)
    # Empty segments hold -inf.  Real edges always gather from their own
    # (non-empty) segment, but padding edges carry segment_ids == num_segments
    # whose clipped gather may land on an empty segment; neutralize so the
    # whole computation stays finite (padding contributions are dropped by the
    # final out-of-bounds scatter regardless).
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = logits - seg_max[jnp.minimum(segment_ids, num_segments - 1)]
    expd = jnp.exp(shifted)
    seg_sum = segment_sum(expd, segment_ids, num_segments, indices_are_sorted)
    return expd / (seg_sum[segment_ids] + 1e-16)
