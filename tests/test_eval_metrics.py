"""Metric parity tests vs the reference formulas (utils/rec_utils.py)."""

import numpy as np
import jax.numpy as jnp

from graph_recsys_benchmark_tpu.eval.metrics import hit_vec_metrics, KS


def _reference_hit(hit_vec):
    # rec_utils.py:7-15
    return [1 if np.sum(hit_vec[:k]) > 0 else 0 for k in range(5, 21)]


def _reference_ndcg(hit_vec):
    # rec_utils.py:18-25
    out = []
    for k in range(5, 21):
        h = np.array(hit_vec[:k], dtype=int).reshape(1, -1)
        out.append(np.sum(h) / (np.log2(np.argmax(h) + 2)))
    return out


def _reference_auc(pos, neg):
    # rec_utils.py:28-30
    from itertools import product

    return np.mean([1 if p > n else 0 for p, n in product(pos, neg)])


def test_metrics_match_reference_over_random_scores():
    rng = np.random.default_rng(0)
    u, m = 40, 99
    pos = rng.standard_normal(u).astype(np.float32)
    neg = rng.standard_normal((u, m)).astype(np.float32)
    hr, ndcg, auc, ranks = hit_vec_metrics(jnp.asarray(pos), jnp.asarray(neg))
    hr, ndcg, auc, ranks = map(np.asarray, (hr, ndcg, auc, ranks))

    for i in range(u):
        scores = np.concatenate([[pos[i]], neg[i]])
        order = np.argsort(-scores, kind="stable")  # pos (index 0) wins ties
        hit_vec = (order == 0).astype(int)
        np.testing.assert_array_equal(hr[i], _reference_hit(hit_vec))
        np.testing.assert_allclose(ndcg[i], _reference_ndcg(hit_vec), rtol=1e-6)
        np.testing.assert_allclose(auc[i], _reference_auc([pos[i]], neg[i]), rtol=1e-6)


def test_rank_zero_gets_full_marks():
    pos = jnp.asarray([10.0])
    neg = jnp.asarray([[1.0, 2.0, 3.0]])
    hr, ndcg, auc, ranks = hit_vec_metrics(pos, neg)
    assert ranks[0] == 0
    assert np.all(np.asarray(hr[0]) == 1)
    np.testing.assert_allclose(np.asarray(ndcg[0]), 1.0)
    assert float(auc[0]) == 1.0


def test_ks_layout():
    assert len(KS) == 16 and KS[0] == 5 and KS[5] == 10 and KS[-1] == 20
