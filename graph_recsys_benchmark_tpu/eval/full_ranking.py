"""Full-catalog ranking evaluation (north-star extension, BASELINE.json).

The reference protocol ranks 1 positive against 99 *sampled* negatives
(solvers.py:21-31); production ranking quality is usually reported against
the full catalog.  This evaluator scores EVERY unseen item per test user in
user chunks (bounded memory, MXU-sized score batches) and derives the same
closed-form HR/NDCG@k from the full-catalog rank.

Dense candidate tables already enumerate each user's unseen items, so the
rank is computed over exactly that list; rejection-mode tables score the
whole item range and mask the (short) seen list.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .metrics import ranks_to_metrics


def evaluate_full_ranking(score_fn, tables, chunk_users=128):
    """score_fn(u[B], i[B]) -> float[B].  Returns mean HR/NDCG vectors over
    all test users plus per-user ranks.  Jit-compatible."""
    u_total = tables.test_users.shape[0]
    pad = (-u_total) % chunk_users
    users = jnp.pad(tables.test_users, (0, pad))
    pos_items = jnp.pad(tables.test_items, (0, pad))
    n_chunks = users.shape[0] // chunk_users

    if tables.mode == "dense":
        cand = jnp.pad(tables.cand, ((0, pad), (0, 0)))
        counts = jnp.pad(tables.neg_counts, (0, pad))

        def one_chunk(c):
            u = jax.lax.dynamic_slice_in_dim(users, c * chunk_users, chunk_users)
            p = jax.lax.dynamic_slice_in_dim(pos_items, c * chunk_users, chunk_users)
            cd = jax.lax.dynamic_slice_in_dim(cand, c * chunk_users, chunk_users)[:, 1:]
            ct = jax.lax.dynamic_slice_in_dim(counts, c * chunk_users, chunk_users)
            m = cd.shape[1]
            pos_s = score_fn(u, p)
            neg_s = score_fn(jnp.repeat(u, m), cd.reshape(-1)).reshape(chunk_users, m)
            valid = jnp.arange(m)[None, :] < ct[:, None]
            above = jnp.sum(
                ((neg_s > pos_s[:, None]) & valid).astype(jnp.int32), axis=1
            )
            return above

        ranks = jax.lax.map(one_chunk, jnp.arange(n_chunks)).reshape(-1)
    else:
        item_ids = tables.item_lo + jnp.arange(tables.num_items, dtype=jnp.int32)
        seen = jnp.pad(
            tables.seen_all, ((0, pad), (0, 0)), constant_values=tables.num_items
        )

        def one_chunk(c):
            u = jax.lax.dynamic_slice_in_dim(users, c * chunk_users, chunk_users)
            p = jax.lax.dynamic_slice_in_dim(pos_items, c * chunk_users, chunk_users)
            sn = jax.lax.dynamic_slice_in_dim(seen, c * chunk_users, chunk_users)
            i_all = jnp.broadcast_to(item_ids[None], (chunk_users, tables.num_items))
            scores = score_fn(
                jnp.repeat(u, tables.num_items), i_all.reshape(-1)
            ).reshape(chunk_users, tables.num_items)
            # mask each user's seen items out of the catalog
            mask = jnp.zeros((chunk_users, tables.num_items + 1), dtype=bool)
            rows = jnp.broadcast_to(
                jnp.arange(chunk_users)[:, None], sn.shape
            )
            mask = mask.at[rows, jnp.minimum(sn, tables.num_items)].set(True)
            unseen = ~mask[:, : tables.num_items]
            pos_s = score_fn(u, p)
            above = jnp.sum(
                ((scores > pos_s[:, None]) & unseen).astype(jnp.int32), axis=1
            )
            return above

        ranks = jax.lax.map(one_chunk, jnp.arange(n_chunks)).reshape(-1)

    ranks = ranks[:u_total]
    hr, ndcg = ranks_to_metrics(ranks)
    return {
        "HR": jnp.mean(hr, axis=0),
        "NDCG": jnp.mean(ndcg, axis=0),
        "ranks": ranks,
    }
