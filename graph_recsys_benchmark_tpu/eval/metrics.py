"""Ranking metrics with the reference's exact vector layout.

The reference computes, per test user, a descending sort of
[1 positive, 99 negatives] and derives (utils/rec_utils.py:7-30):

  HR@k   = 1 if the positive lands in the top k            (k = 5..20)
  NDCG@k = sum(hits@k) / log2(argmax(hits@k) + 2)
         = 1/log2(rank+2) if rank < k else 0   (single positive)
  AUC    = fraction of the 99 negatives scored strictly below the positive

Vectors are 16 wide, index 0 ↔ k=5 … index 15 ↔ k=20; reported HR@10 is
column 5 (solvers.py:100-101).  With a single positive everything is a
closed form of `rank` = number of negatives scored strictly above the
positive (ties favor the positive: it precedes the negatives in the sorted
concat, solvers.py:88-89), so the whole per-user python loop
(solvers.py:56-103) collapses into one vectorized pass.
"""

from __future__ import annotations

import jax.numpy as jnp

KS = tuple(range(5, 21))  # k = 5..20 inclusive -> 16 columns


def ranks_to_metrics(ranks):
    """ranks: int[U] -> (HR[U,16], NDCG[U,16])."""
    ranks = ranks.astype(jnp.int32)
    ks = jnp.asarray(KS, dtype=jnp.int32)[None, :]
    in_topk = (ranks[:, None] < ks).astype(jnp.float32)
    gain = 1.0 / jnp.log2(ranks.astype(jnp.float32) + 2.0)
    return in_topk, in_topk * gain[:, None]


def hit_vec_metrics(pos_scores, neg_scores, neg_mask=None):
    """pos_scores: float[U]; neg_scores: float[U, M] -> (HR, NDCG, AUC, rank).

    neg_mask zeroes out padding negatives (they never outrank and don't count
    in AUC's denominator)."""
    if neg_mask is None:
        neg_mask = jnp.ones_like(neg_scores)
    above = (neg_scores > pos_scores[:, None]).astype(jnp.float32) * neg_mask
    below = (neg_scores < pos_scores[:, None]).astype(jnp.float32) * neg_mask
    ranks = jnp.sum(above, axis=1).astype(jnp.int32)
    hr, ndcg = ranks_to_metrics(ranks)
    denom = jnp.maximum(jnp.sum(neg_mask, axis=1), 1.0)
    auc = jnp.sum(below, axis=1) / denom
    return hr, ndcg, auc, ranks
