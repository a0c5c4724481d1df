"""Vectorized leave-one-out ranking evaluation (1 pos + 99 sampled negatives).

Replaces the reference's per-user python loop (solvers.py:33-104 +
generate_candidates:21-31) with one jitted pass: negatives are sampled for
every test user at once (train/sampling.py — dense gather or exact
complement sampling), all candidate scores come from one batched predict,
and HR/NDCG/AUC come from the closed-form rank (eval/metrics.py).

Sampling parity: the reference draws 99 negatives per user per evaluation
with replacement from that user's unseen-item list (np.random.choice,
solvers.py:29) — both table modes draw from exactly that distribution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rank_candidates(score_fn, test_users, test_pos, neg_items):
    """score_fn(u[B], i[B]) -> float[B]; returns (pos_scores[U], neg_scores[U, C])."""
    u, c = neg_items.shape
    pos_scores = score_fn(test_users, test_pos)
    neg_scores = score_fn(
        jnp.repeat(test_users, c), neg_items.reshape(-1)
    ).reshape(u, c)
    return pos_scores, neg_scores


def evaluate_ranking(key, score_fn, tables, num_candidates=99, user_mask=None):
    """Full eval pass -> dict of mean metrics in the reference layout.

    tables: train.sampling.DeviceTables.
    eval_loss matches solvers.py:63-72: per user the BPR sum over the
    (pos, neg_j) pairs, then the mean over users.
    """
    from ..train.sampling import sample_eval_negatives
    from .metrics import hit_vec_metrics

    neg_items = sample_eval_negatives(key, tables, num_candidates)
    pos_scores, neg_scores = rank_candidates(
        score_fn, tables.test_users, tables.test_items, neg_items
    )
    hr, ndcg, auc, ranks = hit_vec_metrics(pos_scores, neg_scores)

    if user_mask is None:
        user_mask = jnp.ones_like(pos_scores)
    denom = jnp.maximum(jnp.sum(user_mask), 1.0)

    # eval loss: -Σ_j log σ(pos - neg_j) per user, meaned over users
    z = pos_scores[:, None] - neg_scores
    per_user_loss = jnp.sum(jax.nn.softplus(-z), axis=1)

    wm = user_mask[:, None]
    return {
        "HR": jnp.sum(hr * wm, axis=0) / denom,
        "NDCG": jnp.sum(ndcg * wm, axis=0) / denom,
        "AUC": jnp.sum(auc * user_mask) / denom,
        "eval_loss": jnp.sum(per_user_loss * user_mask) / denom,
        "ranks": ranks,
    }
