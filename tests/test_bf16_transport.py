"""bf16 message-transport mode (ops/config.py SEGSUM_TRANSPORT='bf16'):
values/gradients stay close to the f32 path within bf16 tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_recsys_benchmark_tpu.data import build_mlsmall_hin, synthetic_mlsmall_raw
from graph_recsys_benchmark_tpu.data.movielens import mlsmall_metapath_edges
from graph_recsys_benchmark_tpu.graph import build_fused_metapath_graphs
from graph_recsys_benchmark_tpu.models.pea import PEAConfig, pea_forward, pea_init, pea_loss
from graph_recsys_benchmark_tpu.ops import config as ops_config


@pytest.fixture(autouse=True)
def _restore_config():
    yield
    ops_config.SEGSUM_TRANSPORT = "f32"


@pytest.fixture(scope="module")
def setup():
    movies, ratings, tagging = synthetic_mlsmall_raw(
        seed=0, num_users=60, num_items=50, min_ratings_per_user=5, max_ratings_per_user=12
    )
    hin = build_mlsmall_hin(movies, ratings, tagging, num_core=2, num_feat_core=1)
    return hin, mlsmall_metapath_edges(hin)


@pytest.mark.parametrize("conv", ["gcn", "sage", "gat"])
def test_bf16_forward_close_to_f32(setup, conv):
    hin, edges = setup
    cfg = PEAConfig(
        conv=conv, num_nodes=hin.num_nodes, meta_path_steps=(2,) * 9,
        emb_dim=16, hidden_size=16, repr_dim=8,
    )
    params = pea_init(jax.random.PRNGKey(0), cfg)
    fused = build_fused_metapath_graphs(edges, hin.num_nodes, conv)

    ref = np.asarray(pea_forward(params, fused, cfg))
    ops_config.SEGSUM_TRANSPORT = "bf16"
    got = np.asarray(pea_forward(params, fused, cfg))
    scale = np.maximum(np.abs(ref), 1e-2)
    assert np.max(np.abs(got - ref) / scale) < 0.1  # bf16 has ~2-3 decimal digits


def test_bf16_grads_flow_and_match_f32(setup):
    hin, edges = setup
    cfg = PEAConfig(
        conv="gat", num_nodes=hin.num_nodes, meta_path_steps=(2,) * 9,
        emb_dim=8, hidden_size=8, repr_dim=4,
    )
    params = pea_init(jax.random.PRNGKey(1), cfg)
    fused = build_fused_metapath_graphs(edges, hin.num_nodes, "gat")
    batch = jnp.asarray(
        np.stack(
            [
                np.arange(16) % hin.num_users,
                hin.item_acc + np.arange(16) % hin.num_items,
                hin.item_acc + (np.arange(16) + 3) % hin.num_items,
            ],
            axis=1,
        ).astype(np.int32)
    )

    def loss(p):
        return pea_loss(p, fused, cfg, batch, training=True)

    l_ref, g_ref = jax.value_and_grad(loss)(params)
    ops_config.SEGSUM_TRANSPORT = "bf16"
    l_bf, g_bf = jax.value_and_grad(loss)(params)

    assert np.isfinite(float(l_bf))
    np.testing.assert_allclose(float(l_bf), float(l_ref), rtol=0.05)
    # every grad leaf stays f32 (params are f32; casts happen inside) and
    # tracks the f32 gradient direction
    for ref_leaf, bf_leaf in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_bf)
    ):
        assert bf_leaf.dtype == ref_leaf.dtype
        r = np.asarray(ref_leaf).ravel()
        b = np.asarray(bf_leaf).ravel()
        # near-zero leaves are bf16-noise dominated; only check direction
        # where the f32 gradient is meaningful
        if np.linalg.norm(r) > 1e-4:
            cos = float(np.dot(r, b)) / (np.linalg.norm(r) * np.linalg.norm(b))
            # at the tiny dims of this test (8/8/4) bf16 relative noise is
            # large; the check guards against broken VJPs (zeros / wrong
            # permutation), which would send the cosine towards 0
            assert cos > 0.9, cos
