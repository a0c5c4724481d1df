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


def eval_loss_per_user(pos_scores, neg_scores, loss_form="bpr"):
    """Per-user eval loss, matching each reference model family's
    `model.loss` eval branch on the merged 1-pos x C-neg frame:

    'bpr'  — GraphRecsysModel.loss (base.py:43-48): -Σ_j log σ(pos - neg_j)
    'bce'  — MFRecsysModel.loss (base.py:111-123): BCEWithLogits over
             [pos, neg_1..C] with labels [1, 0..], mean over the C+1 preds
    'mse'  — NFMRecsysModel.loss (nfm.py:21-33): MSE over the same stack
    'zero' — CFKGSolver (cfkg_solver_bpr.py:260-261 hard-codes eval loss 0)
    """
    c = neg_scores.shape[1]
    if loss_form == "bpr":
        z = pos_scores[:, None] - neg_scores
        return jnp.sum(jax.nn.softplus(-z), axis=1)
    if loss_form == "bce":
        # BCEWithLogits: label 1 -> softplus(-x); label 0 -> softplus(x)
        return (
            jax.nn.softplus(-pos_scores) + jnp.sum(jax.nn.softplus(neg_scores), axis=1)
        ) / (c + 1)
    if loss_form == "mse":
        return ((pos_scores - 1.0) ** 2 + jnp.sum(neg_scores**2, axis=1)) / (c + 1)
    if loss_form == "zero":
        return jnp.zeros_like(pos_scores)
    raise ValueError(loss_form)


def evaluate_ranking(
    key, score_fn, tables, num_candidates=99, user_mask=None, loss_form="bpr"
):
    """Full eval pass -> dict of mean metrics in the reference layout.

    tables: train.sampling.DeviceTables.
    eval_loss matches solvers.py:63-72: per user `model.loss` over the
    (pos, neg_j) merged pairs (form per model family — eval_loss_per_user),
    then the mean over users.
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

    per_user_loss = eval_loss_per_user(pos_scores, neg_scores, loss_form)

    wm = user_mask[:, None]
    return {
        "HR": jnp.sum(hr * wm, axis=0) / denom,
        "NDCG": jnp.sum(ndcg * wm, axis=0) / denom,
        "AUC": jnp.sum(auc * user_mask) / denom,
        "eval_loss": jnp.sum(per_user_loss * user_mask) / denom,
        "ranks": ranks,
    }
