"""Edge-parallel (sharded edge set + psum partial aggregates) vs the
single-device fused path: loss and updated params must match."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from graph_recsys_benchmark_tpu.data import build_mlsmall_hin, synthetic_mlsmall_raw
from graph_recsys_benchmark_tpu.data.movielens import mlsmall_metapath_edges
from graph_recsys_benchmark_tpu.graph import build_fused_metapath_graphs
from graph_recsys_benchmark_tpu.models.pea import PEAConfig, pea_init, pea_loss
from graph_recsys_benchmark_tpu.parallel import (
    make_edge_sharded_train_step,
    make_mesh,
    shard_fused_graphs,
    shard_step_graph,
)
from graph_recsys_benchmark_tpu.train.optim import make_optimizer


@pytest.fixture(scope="module")
def setup():
    movies, ratings, tagging = synthetic_mlsmall_raw(
        seed=3, num_users=50, num_items=40, min_ratings_per_user=5, max_ratings_per_user=10
    )
    hin = build_mlsmall_hin(movies, ratings, tagging, num_core=2, num_feat_core=1)
    return hin


def _batch(hin, bs, entity_aware=False):
    rng = np.random.default_rng(0)
    rows = rng.integers(0, len(hin.train_pos), bs)
    u = hin.train_pos[rows, 0]
    i = hin.train_pos[rows, 1]
    n = hin.item_acc + rng.integers(0, hin.num_items, bs)
    cols = [u, i, n]
    if entity_aware:
        # (pos_item_ent, neg_item_ent, item_mask, pos_user_ent, neg_user_ent, user_mask)
        for _ in range(2):
            cols.append(rng.integers(0, hin.num_nodes, bs))
        cols.append(rng.integers(0, 2, bs))
        for _ in range(2):
            cols.append(rng.integers(0, hin.num_nodes, bs))
        cols.append(rng.integers(0, 2, bs))
    return jnp.asarray(np.stack(cols, axis=1).astype(np.int32))


def test_shard_step_graph_partitions_edges(setup):
    hin = setup
    fused = build_fused_metapath_graphs(
        mlsmall_metapath_edges(hin), hin.num_nodes, "gcn"
    )
    g = fused[0]
    sg = shard_step_graph(g, 4)
    assert sg.src.shape[0] == 4
    # every real edge appears exactly once; shard-local dst stays
    # block-monotone (graph.py block order survives contiguous slicing)
    dst = np.asarray(sg.dst)
    w = np.asarray(sg.w)
    for s in range(4):
        real = w[s] != 0
        assert np.all(np.diff(dst[s][real] // 128) >= 0)
    total_real = int((w != 0).sum())
    assert total_real == int((np.asarray(g.w) != 0).sum())


@pytest.mark.parametrize("conv,entity_aware", [("gcn", False), ("gat", True), ("sage", False)])
def test_edge_sharded_step_matches_single_device(setup, conv, entity_aware):
    hin = setup
    cfg = PEAConfig(
        conv=conv, num_nodes=hin.num_nodes, meta_path_steps=(2,) * 9,
        emb_dim=16, hidden_size=16, repr_dim=8, entity_aware=entity_aware,
    )
    params = pea_init(jax.random.PRNGKey(0), cfg)
    fused = build_fused_metapath_graphs(mlsmall_metapath_edges(hin), hin.num_nodes, conv)

    optimizer = make_optimizer("adam", 1e-3, 1e-3)
    opt_state = optimizer.init(params)
    bs = 32
    batch = _batch(hin, bs, entity_aware)
    mask = jnp.ones(bs, dtype=jnp.float32)
    key = jax.random.PRNGKey(1)

    # single-device reference step
    def ref_step(p, o):
        loss, grads = jax.value_and_grad(
            lambda pp: pea_loss(pp, fused, cfg, batch, row_mask=mask, training=True)
        )(p)
        ups, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, ups), o, loss

    p1, o1, loss1 = jax.jit(ref_step)(params, opt_state)

    mesh = make_mesh(dp=4, mp=2)
    sharded = shard_fused_graphs(fused, 4)
    step, place = make_edge_sharded_train_step(cfg, sharded, optimizer, mesh)
    b2, m2 = place(batch, mask)
    p2, o2, loss2 = step(params, opt_state, b2, m2, key)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(p1["x"]), np.asarray(p2["x"]), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(p1["fc1"]["w"]), np.asarray(p2["fc1"]["w"]), rtol=1e-4, atol=1e-6
    )
