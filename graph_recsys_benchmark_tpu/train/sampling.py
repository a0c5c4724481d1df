"""Device-side negative/entity sampling from static padded tables.

The reference resamples negatives on the host every epoch with python loops
(movielens.py:879-997: 'unseen' = rd.choices over per-user candidate lists;
'random' = np.random.randint over the item range) and samples entity
features per row inside Dataset.__getitem__ across 12 DataLoader workers
(movielens.py:1135-1182, solvers.py:195-200).  Here both become jitted
`jax.random` gathers from tables built once at dataset-build time, so the
whole epoch — sampling included — runs on device.

Distribution parity (not RNG-stream parity):
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

from ..data.hin import HINData


@dataclasses.dataclass(frozen=True)
class DeviceTables:
    """Static device-resident sampling tables derived from HINData."""

    train_pos: jnp.ndarray  # int32[Ei, 2] (u_nid, i_nid)
    ratings: jnp.ndarray  # float32[Ei]
    cand: jnp.ndarray  # int32[U, 1+M] col0 = test item
    neg_counts: jnp.ndarray  # int32[U]
    test_users: jnp.ndarray  # int32[U]
    item_lo: int  # first item nid
    num_items: int
    user_lo: int
    # entity-aware tables (may be zero-width)
    item_feat: jnp.ndarray  # int32[num_items, Kf]
    item_feat_counts: jnp.ndarray
    user_feat: jnp.ndarray
    user_feat_counts: jnp.ndarray
    ent_lo: jnp.ndarray  # int32[num_nodes+1]
    ent_hi: jnp.ndarray


jax.tree_util.register_pytree_node(
    DeviceTables,
    lambda t: (
        (
            t.train_pos, t.ratings, t.cand, t.neg_counts, t.test_users,
            t.item_feat, t.item_feat_counts, t.user_feat, t.user_feat_counts,
            t.ent_lo, t.ent_hi,
        ),
        (t.item_lo, t.num_items, t.user_lo),
    ),
    lambda aux, c: DeviceTables(
        train_pos=c[0], ratings=c[1], cand=c[2], neg_counts=c[3], test_users=c[4],
        item_lo=aux[0], num_items=aux[1], user_lo=aux[2],
        item_feat=c[5], item_feat_counts=c[6], user_feat=c[7],
        user_feat_counts=c[8], ent_lo=c[9], ent_hi=c[10],
    ),
)


def build_device_tables(hin: HINData) -> DeviceTables:
    ef = hin.entity_feats
    return DeviceTables(
        train_pos=jnp.asarray(hin.train_pos, dtype=jnp.int32),
        ratings=jnp.asarray(hin.ratings, dtype=jnp.float32),
        cand=jnp.asarray(hin.candidates.cand, dtype=jnp.int32),
        neg_counts=jnp.asarray(hin.candidates.neg_counts, dtype=jnp.int32),
        test_users=jnp.asarray(hin.candidates.test_users, dtype=jnp.int32),
        item_lo=int(hin.item_acc),
        num_items=int(hin.num_items),
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


def sample_cf_negatives(key, u_nids, tables: DeviceTables, strategy: str):
    """Negative item nids for a batch of users (movielens.py:920-940)."""
    b = u_nids.shape[0]
    if strategy == "random":
        return tables.item_lo + jax.random.randint(key, (b,), 0, tables.num_items)
    if strategy == "unseen":
        u_local = u_nids - tables.user_lo
        counts = tables.neg_counts[u_local] + 1  # +1: test item at col 0
        idx = _uniform_below(key, counts, (b,))
        return tables.cand[u_local, idx]
    raise NotImplementedError(strategy)


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
