"""Dataset builder tests over the synthetic raw dataframes."""

import numpy as np

from graph_recsys_benchmark_tpu.data import (
    build_mlsmall_hin,
    synthetic_mlsmall_raw,
)


def _build(num_core=3, num_feat_core=2, seed=0):
    movies, ratings, tagging = synthetic_mlsmall_raw(seed=seed)
    return build_mlsmall_hin(movies, ratings, tagging, num_core=num_core, num_feat_core=num_feat_core)


def test_build_structure():
    hin = _build()
    assert hin.types == ["uid", "iid", "genre", "year", "director", "actor", "writer", "tid"]
    # node space is contiguous and ordered by type
    acc = 0
    for t in hin.types:
        assert hin.type_accs[t] == acc
        acc += hin.num_nodes_dict[t]
    assert acc == hin.num_nodes
    # all edges within node space
    for name, e in hin.edge_index.items():
        if e.shape[1]:
            assert e.min() >= 0 and e.max() < hin.num_nodes, name


def test_leave_one_out_split():
    hin = _build()
    u = hin.candidates.test_users
    assert u.shape[0] == hin.num_users
    # test item is a real item nid and is NOT among the user's train edges
    train_set = {(a, b) for a, b in hin.train_pos}
    for k in range(hin.num_users):
        ti = int(hin.candidates.cand[k, 0])
        assert hin.item_acc <= ti < hin.item_acc + hin.num_items
        assert (int(u[k]), ti) not in train_set
    # every user with interactions has >= num_core train edges (filter >3)
    counts = np.bincount(hin.train_pos[:, 0], minlength=hin.num_users)
    assert counts.min() >= 3


def test_candidates_are_unseen():
    hin = _build()
    seen_by_user = {}
    for a, b in hin.train_pos:
        seen_by_user.setdefault(int(a), set()).add(int(b))
    for k in range(hin.num_users):
        u = int(hin.candidates.test_users[k])
        n = int(hin.candidates.neg_counts[k])
        negs = set(int(x) for x in hin.candidates.cand[k, 1 : 1 + n])
        assert not (negs & seen_by_user.get(u, set()))
        assert int(hin.candidates.cand[k, 0]) not in negs


def test_entity_feature_tables():
    hin = _build()
    ef = hin.entity_feats
    assert ef.item_feat.shape[0] == hin.num_items
    assert ef.user_feat.shape[0] == hin.num_users
    # features are attribute nodes (genre/year/crew/tag ranges), never users/items
    attr_lo = hin.type_accs["genre"]
    for k in range(hin.num_items):
        n = int(ef.item_feat_counts[k])
        if n:
            feats = ef.item_feat[k, :n]
            assert feats.min() >= attr_lo
    lo, hi = ef.ent_lo, ef.ent_hi
    assert lo.shape[0] == hin.num_nodes + 1
    # type range brackets every node id of that type
    for t in hin.types:
        a, n = hin.type_accs[t], hin.num_nodes_dict[t]
        if n:
            assert lo[a] == a and hi[a] == a + n


def test_deterministic():
    h1, h2 = _build(seed=3), _build(seed=3)
    assert np.array_equal(h1.train_pos, h2.train_pos)
    assert np.array_equal(h1.candidates.cand, h2.candidates.cand)
    for k in h1.edge_index:
        assert np.array_equal(h1.edge_index[k], h2.edge_index[k])
