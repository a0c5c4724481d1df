"""Full-catalog ranking evaluator: oracle parity in both table modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_recsys_benchmark_tpu.data import build_mlsmall_hin, synthetic_mlsmall_raw
from graph_recsys_benchmark_tpu.eval.full_ranking import evaluate_full_ranking
from graph_recsys_benchmark_tpu.train.sampling import build_device_tables


@pytest.fixture(scope="module", params=["dense", "rejection"])
def tables(request):
    movies, ratings, tagging = synthetic_mlsmall_raw(
        seed=0, num_users=50, num_items=40, min_ratings_per_user=5, max_ratings_per_user=10
    )
    hin = build_mlsmall_hin(
        movies, ratings, tagging, num_core=2, num_feat_core=1,
        candidate_mode=request.param,
    )
    return build_device_tables(hin), hin


def test_full_ranking_matches_numpy_oracle(tables):
    t, hin = tables
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((hin.num_nodes, 8)).astype(np.float32)
    emb_j = jnp.asarray(emb)

    def score(u, i):
        return jnp.sum(emb_j[u] * emb_j[i], axis=-1)

    out = evaluate_full_ranking(score, t, chunk_users=16)
    ranks = np.asarray(out["ranks"])

    seen_by_user = {}
    for a, b in hin.train_pos:
        seen_by_user.setdefault(int(a), set()).add(int(b))
    item_ids = np.arange(hin.num_items) + hin.item_acc
    for k in range(hin.num_users):
        u = int(t.test_users[k])
        p = int(t.test_items[k])
        unseen = [i for i in item_ids if i not in seen_by_user.get(u, set()) and i != p]
        pos_s = float(emb[u] @ emb[p])
        above = sum(1 for i in unseen if float(emb[u] @ emb[i]) > pos_s)
        assert ranks[k] == above, (k, ranks[k], above)

    assert np.all(np.diff(np.asarray(out["HR"])) >= -1e-6)
