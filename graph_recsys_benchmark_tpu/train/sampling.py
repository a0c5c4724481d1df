"""Device-side negative/entity sampling from static padded tables.

The reference resamples negatives on the host every epoch with python loops
(movielens.py:879-997: 'unseen' = rd.choices over per-user candidate lists;
'random' = np.random.randint over the item range) and samples entity
features per row inside Dataset.__getitem__ across 12 DataLoader workers
(movielens.py:1135-1182, solvers.py:195-200).  Here both become jitted
`jax.random` gathers from tables built once at dataset-build time, so the
whole epoch — sampling included — runs on device.

Two candidate-table modes (data/movielens.py:build_candidates):

  dense     — padded per-user UNSEEN table; sampling is a direct gather.
  rejection — padded per-user sorted SEEN lists; an unseen draw maps a
              uniform int in [0, num_items - seen_count) through the
              order-statistics of the complement (result += 1 for every
              seen id <= result, ascending) — exact uniform over the
              unseen set with O(K) work, K bounded by the ML-25M
              user-count band (movielens.py:690-695).

Distribution parity with the reference (not RNG-stream parity):
  'random'  : uniform over the full item id range            (incl. seen)
  'unseen'  : uniform over {test item} ∪ {never-interacted}  per user
  entities  : uniform over the node's feature list; the corrupted entity is
              uniform over the *type range* of the sampled feature
              (movielens.py:1158-1162); empty feature lists yield
              (0, 0, mask=0) exactly as the reference.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..data.hin import CandidateTables, HINData, RejectionCandidates


@dataclasses.dataclass(frozen=True)
class DeviceTables:
    """Static device-resident sampling tables derived from HINData."""

    train_pos: jnp.ndarray  # int32[Ei, 2] (u_nid, i_nid)
    ratings: jnp.ndarray  # float32[Ei]
    test_users: jnp.ndarray  # int32[U]
    test_items: jnp.ndarray  # int32[U]
    mode: str  # 'dense' | 'rejection'
    # dense mode
    cand: jnp.ndarray  # int32[U, 1+M]; col 0 = test item
    neg_counts: jnp.ndarray  # int32[U]
    # rejection mode (LOCAL item ids, ascending, padded with num_items)
    seen_all: jnp.ndarray  # int32[U, Ka] — train + test
    seen_train: jnp.ndarray  # int32[U, Kt] — train only
    cnt_all: jnp.ndarray  # int32[U]
    cnt_train: jnp.ndarray  # int32[U]
    item_lo: int
    num_items: int
    user_lo: int
    # entity-aware tables (may be zero-width)
    item_feat: jnp.ndarray
    item_feat_counts: jnp.ndarray
    user_feat: jnp.ndarray
    user_feat_counts: jnp.ndarray
    ent_lo: jnp.ndarray
    ent_hi: jnp.ndarray


_DT_FIELDS = [f.name for f in dataclasses.fields(DeviceTables)]
_DT_AUX = {"mode", "item_lo", "num_items", "user_lo"}
_DT_CHILDREN = [n for n in _DT_FIELDS if n not in _DT_AUX]

jax.tree_util.register_pytree_node(
    DeviceTables,
    lambda t: (
        tuple(getattr(t, n) for n in _DT_CHILDREN),
        tuple(getattr(t, n) for n in sorted(_DT_AUX)),
    ),
    lambda aux, c: DeviceTables(
        **dict(zip(_DT_CHILDREN, c)), **dict(zip(sorted(_DT_AUX), aux))
    ),
)


def build_device_tables(hin: HINData) -> DeviceTables:
    ef = hin.entity_feats
    cands = hin.candidates
    item_lo = int(hin.item_acc)
    num_items = int(hin.num_items)
    z2 = jnp.zeros((1, 1), dtype=jnp.int32)
    z1 = jnp.zeros((1,), dtype=jnp.int32)

    if isinstance(cands, CandidateTables):
        mode = "dense"
        dense = dict(
            cand=jnp.asarray(cands.cand, dtype=jnp.int32),
            neg_counts=jnp.asarray(cands.neg_counts, dtype=jnp.int32),
            seen_all=z2, seen_train=z2, cnt_all=z1, cnt_train=z1,
        )
        test_items = jnp.asarray(cands.cand[:, 0], dtype=jnp.int32)
    else:
        assert isinstance(cands, RejectionCandidates)
        mode = "rejection"
        seen = np.asarray(cands.seen)
        counts = np.asarray(cands.seen_counts)
        u = seen.shape[0]
        local = seen - item_lo
        col = np.arange(seen.shape[1])[None, :]
        valid = col < counts[:, None]
        all_sorted = np.where(valid, local, num_items)
        all_sorted.sort(axis=1)
        # train-only: drop column 0 (the test item) before sorting
        tr = np.where(valid[:, 1:], local[:, 1:], num_items)
        tr.sort(axis=1)
        dense = dict(
            cand=z2, neg_counts=z1,
            seen_all=jnp.asarray(all_sorted, dtype=jnp.int32),
            seen_train=jnp.asarray(tr, dtype=jnp.int32),
            cnt_all=jnp.asarray(counts, dtype=jnp.int32),
            cnt_train=jnp.asarray(counts - 1, dtype=jnp.int32),
        )
        test_items = jnp.asarray(cands.seen[:, 0], dtype=jnp.int32)

    return DeviceTables(
        train_pos=jnp.asarray(hin.train_pos, dtype=jnp.int32),
        ratings=jnp.asarray(hin.ratings, dtype=jnp.float32),
        test_users=jnp.asarray(cands.test_users, dtype=jnp.int32),
        test_items=test_items,
        mode=mode,
        **dense,
        item_lo=item_lo,
        num_items=num_items,
        user_lo=int(hin.type_accs[hin.types[0]]),
        item_feat=jnp.asarray(ef.item_feat, dtype=jnp.int32),
        item_feat_counts=jnp.asarray(ef.item_feat_counts, dtype=jnp.int32),
        user_feat=jnp.asarray(ef.user_feat, dtype=jnp.int32),
        user_feat_counts=jnp.asarray(ef.user_feat_counts, dtype=jnp.int32),
        ent_lo=jnp.asarray(ef.ent_lo, dtype=jnp.int32),
        ent_hi=jnp.asarray(ef.ent_hi, dtype=jnp.int32),
    )


def _uniform_below(key, counts, shape):
    """Uniform int in [0, counts) elementwise (counts broadcastable)."""
    r = jax.random.uniform(key, shape)
    idx = jnp.floor(r * counts.astype(jnp.float32)).astype(jnp.int32)
    return jnp.minimum(idx, jnp.maximum(counts - 1, 0))


def sample_complement(key, u_local, seen_sorted, seen_counts, num_items, shape):
    """Exact uniform draw over each user's UNSEEN local item ids.

    seen_sorted[u]: ascending local seen ids padded with num_items.  Maps
    idx ~ U[0, num_items - count) through the complement's order statistics:
    every seen id <= current result shifts it up by one.
    """
    free = num_items - seen_counts[u_local]  # [U']
    extra = len(shape) - free.ndim  # e.g. (U, C) draws per user -> 1
    free = free.reshape(free.shape + (1,) * extra)
    idx = _uniform_below(key, free, shape)

    k_cols = seen_sorted.shape[1]
    rows = seen_sorted[u_local]  # [U', K]

    def body(k, res):
        s = jax.lax.dynamic_index_in_dim(rows, k, axis=rows.ndim - 1, keepdims=False)
        s = s.reshape(s.shape + (1,) * extra)
        return res + (s <= res).astype(jnp.int32)

    return jax.lax.fori_loop(0, k_cols, body, idx)


def sample_cf_negatives(key, u_nids, tables: DeviceTables, strategy: str):
    """Negative item nids for a batch of users (movielens.py:920-940)."""
    b = u_nids.shape[0]
    if strategy == "random":
        return tables.item_lo + jax.random.randint(key, (b,), 0, tables.num_items)
    if strategy == "unseen":
        u_local = u_nids - tables.user_lo
        if tables.mode == "dense":
            counts = tables.neg_counts[u_local] + 1  # +1: test item at col 0
            idx = _uniform_below(key, counts, (b,))
            return tables.cand[u_local, idx]
        # rejection mode: uniform over complement of the TRAIN-seen set
        # (the reference's candidate list is test_pos + never-interacted,
        # movielens.py:933 — i.e. everything not in the train history)
        local = sample_complement(
            key, u_local, tables.seen_train, tables.cnt_train, tables.num_items, (b,)
        )
        return tables.item_lo + local
    raise NotImplementedError(strategy)


def sample_eval_negatives(key, tables: DeviceTables, num_candidates=99):
    """Per-test-user negatives: uniform over never-interacted items
    (solvers.py:28-29 samples WITH replacement from the unseen list)."""
    u = tables.test_users.shape[0]
    u_local = jnp.arange(u, dtype=jnp.int32)
    if tables.mode == "dense":
        r = jax.random.uniform(key, (u, num_candidates))
        counts = tables.neg_counts
        idx = jnp.floor(r * counts[:, None].astype(jnp.float32)).astype(jnp.int32)
        idx = jnp.minimum(idx, jnp.maximum(counts[:, None] - 1, 0))
        return jnp.take_along_axis(tables.cand[:, 1:], idx, axis=1)
    local = sample_complement(
        key, u_local, tables.seen_all, tables.cnt_all, tables.num_items,
        (u, num_candidates),
    )
    return tables.item_lo + local


def sample_entities(key, u_nids, pos_i_nids, tables: DeviceTables):
    """Per-row entity-aware columns [pos_item_ent, neg_item_ent, item_mask,
    pos_user_ent, neg_user_ent, user_mask] (movielens.py:1149-1179)."""
    b = u_nids.shape[0]
    k1, k2, k3, k4 = jax.random.split(key, 4)

    def one_side(k_pick, k_neg, feat, counts, local_ids):
        cnt = counts[local_ids]
        idx = _uniform_below(k_pick, cnt, (b,))
        pos_ent = feat[local_ids, idx]
        mask = (cnt > 0).astype(jnp.int32)
        lo = tables.ent_lo[pos_ent]
        hi = tables.ent_hi[pos_ent]
        neg_ent = lo + _uniform_below(k_neg, hi - lo, (b,))
        # reference yields exactly (0, 0, 0) for empty feature lists
        pos_ent = pos_ent * mask
        neg_ent = neg_ent * mask
        return pos_ent, neg_ent, mask

    pi, ni, mi = one_side(k1, k2, tables.item_feat, tables.item_feat_counts,
                          pos_i_nids - tables.item_lo)
    pu, nu, mu = one_side(k3, k4, tables.user_feat, tables.user_feat_counts,
                          u_nids - tables.user_lo)
    return jnp.stack([pi, ni, mi, pu, nu, mu], axis=1)
