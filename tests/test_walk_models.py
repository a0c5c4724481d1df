"""Walk-based family: walker correctness, skip-gram training, 2-stage models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_recsys_benchmark_tpu.data import build_mlsmall_hin, synthetic_mlsmall_raw
from graph_recsys_benchmark_tpu.models import metapath2vec as M
from graph_recsys_benchmark_tpu.train import TrainConfig
from graph_recsys_benchmark_tpu.train.walk_trainers import (
    HeRecTrainer,
    MetaPath2VecTrainer,
    pretrain_mp2v,
)


@pytest.fixture(scope="module")
def hin():
    movies, ratings, tagging = synthetic_mlsmall_raw(seed=0)
    return build_mlsmall_hin(movies, ratings, tagging, num_core=3, num_feat_core=2)


def _small_cfg(hin, wpn=4):
    return M.MP2VConfig(
        embedding_dim=16, walk_length=12, context_size=5, walks_per_node=wpn,
        num_negative_samples=2,
        start_offset=hin.type_accs["uid"], num_start=hin.num_users,
        num_nodes=hin.num_nodes,
    )


def test_walks_respect_metapath_types(hin):
    cfg = _small_cfg(hin)
    steps = M.metapath_from_hin(hin, [("user2item", False), ("user2item", True)])
    starts = jnp.arange(6, dtype=jnp.int32)
    rw = np.asarray(M.sample_pos_walks(jax.random.PRNGKey(0), starts, steps, cfg))
    assert rw.shape == (6 * cfg.walks_per_node, cfg.walk_length + 1)
    u_lo, u_hi = hin.type_accs["uid"], hin.type_accs["uid"] + hin.num_users
    i_lo, i_hi = hin.item_acc, hin.item_acc + hin.num_items
    # positions alternate uid, iid, uid, iid, ...
    for pos in range(cfg.walk_length + 1):
        col = rw[:, pos]
        if pos % 2 == 0:
            assert np.all((col >= u_lo) & (col < u_hi)), pos
        else:
            assert np.all((col >= i_lo) & (col < i_hi)), pos


def test_walk_steps_follow_real_edges(hin):
    cfg = _small_cfg(hin, wpn=2)
    steps = M.metapath_from_hin(hin, [("user2item", False), ("user2item", True)])
    starts = jnp.arange(8, dtype=jnp.int32)
    rw = np.asarray(M.sample_pos_walks(jax.random.PRNGKey(1), starts, steps, cfg))
    edges = set(map(tuple, hin.edge_index["user2item"].T))
    # check the first transition uid->iid is a real (train) edge whenever the
    # user has any; users always have train edges here
    for r in rw[:50]:
        assert (r[0], r[1]) in edges


def test_pretrain_reduces_loss(hin):
    cfg = _small_cfg(hin, wpn=8)
    emb, loss = pretrain_mp2v(hin, [("user2item", False), ("user2item", True)], cfg, seed=0)
    assert emb.shape == (hin.num_nodes, 16)
    assert np.isfinite(loss)


def test_metapath2vec_two_stage(hin):
    cfg = _small_cfg(hin, wpn=8)
    tcfg = TrainConfig(batch_size=256, sampling_strategy="random")
    tr = MetaPath2VecTrainer(hin, cfg, tcfg)
    params, opt = tr.init(2020)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(3):
        key, k = jax.random.split(key)
        params, opt, loss = tr.run_epoch(params, opt, k)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    m = tr.evaluate(params, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["AUC"]))


def test_herec_two_stage(hin):
    cfg = _small_cfg(hin, wpn=4)
    tcfg = TrainConfig(batch_size=256)
    tr = HeRecTrainer(hin, cfg, tcfg)
    params, opt = tr.init(2020)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(3):
        key, k = jax.random.split(key)
        params, opt, loss = tr.run_epoch(params, opt, k)
        losses.append(float(loss))
    assert losses[-1] < losses[0]  # MSE on ratings drops
    m = tr.evaluate(params, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["AUC"]))
