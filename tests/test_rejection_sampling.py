"""Rejection/complement sampling: exactness + distribution + 25m/yelp builders."""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from graph_recsys_benchmark_tpu.data import build_mlsmall_hin, synthetic_mlsmall_raw
from graph_recsys_benchmark_tpu.data.hin import RejectionCandidates
from graph_recsys_benchmark_tpu.train.sampling import (
    build_device_tables,
    sample_cf_negatives,
    sample_complement,
    sample_eval_negatives,
)


def test_sample_complement_exact_uniform():
    # 10 items, user 0 has seen {2, 5, 7} -> unseen {0,1,3,4,6,8,9}
    seen_sorted = jnp.asarray([[2, 5, 7, 10, 10]], dtype=jnp.int32)
    counts = jnp.asarray([3], dtype=jnp.int32)
    u = jnp.zeros((20000,), dtype=jnp.int32)
    out = np.asarray(
        sample_complement(jax.random.PRNGKey(0), u, seen_sorted, counts, 10, (20000,))
    )
    unseen = {0, 1, 3, 4, 6, 8, 9}
    assert set(np.unique(out)) == unseen
    freqs = np.bincount(out, minlength=10)[sorted(unseen)] / 20000
    np.testing.assert_allclose(freqs, 1 / 7, atol=0.01)


@pytest.fixture(scope="module")
def hin_rej():
    movies, ratings, tagging = synthetic_mlsmall_raw(seed=0)
    return build_mlsmall_hin(
        movies, ratings, tagging, num_core=3, num_feat_core=2,
        candidate_mode="rejection",
    )


def test_rejection_tables_match_dense(hin_rej):
    movies, ratings, tagging = synthetic_mlsmall_raw(seed=0)
    hin_dense = build_mlsmall_hin(movies, ratings, tagging, num_core=3, num_feat_core=2)
    assert isinstance(hin_rej.candidates, RejectionCandidates)
    # same split
    np.testing.assert_array_equal(
        hin_rej.candidates.test_items, hin_dense.candidates.cand[:, 0]
    )
    # unseen sets agree: dense table lists exactly the complement of seen
    td = build_device_tables(hin_dense)
    tr = build_device_tables(hin_rej)
    u = 0
    n_dense = int(td.neg_counts[u])
    dense_unseen = set(np.asarray(td.cand[u, 1 : 1 + n_dense]).tolist())
    seen = set((np.asarray(tr.seen_all[u]) + tr.item_lo).tolist()) - {tr.item_lo + tr.num_items}
    complement = {
        tr.item_lo + i for i in range(tr.num_items) if tr.item_lo + i not in seen
    }
    assert dense_unseen == complement


def test_unseen_negatives_never_in_train_history(hin_rej):
    tables = build_device_tables(hin_rej)
    train_seen = {}
    for a, b in hin_rej.train_pos:
        train_seen.setdefault(int(a), set()).add(int(b))
    u = tables.train_pos[:256, 0]
    neg = np.asarray(
        sample_cf_negatives(jax.random.PRNGKey(1), u, tables, "unseen")
    )
    for un, ng in zip(np.asarray(u), neg):
        assert int(ng) not in train_seen[int(un)]


def test_eval_negatives_never_seen_at_all(hin_rej):
    tables = build_device_tables(hin_rej)
    seen = {}
    for a, b in hin_rej.train_pos:
        seen.setdefault(int(a), set()).add(int(b))
    for k in range(hin_rej.num_users):
        seen.setdefault(int(tables.test_users[k]), set()).add(int(tables.test_items[k]))
    neg = np.asarray(sample_eval_negatives(jax.random.PRNGKey(2), tables, 20))
    for k in range(hin_rej.num_users):
        un = int(tables.test_users[k])
        assert not (set(neg[k].tolist()) & seen[un])


def test_pea_trains_with_rejection_tables(hin_rej):
    from graph_recsys_benchmark_tpu.models.pea import PEAConfig
    from graph_recsys_benchmark_tpu.train import PEATrainer, TrainConfig

    cfg = PEAConfig(
        conv="gcn", num_nodes=hin_rej.num_nodes, meta_path_steps=(2,) * 9,
        emb_dim=16, hidden_size=16, repr_dim=8,
    )
    tr = PEATrainer(hin_rej, cfg, TrainConfig(batch_size=256, sampling_strategy="unseen"))
    params, opt = tr.init(2020)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(3):
        key, k = jax.random.split(key)
        params, opt, loss = tr.run_epoch(params, opt, k)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    m = tr.evaluate(params, jax.random.PRNGKey(1))
    assert float(m["HR"][5]) > 0.1
