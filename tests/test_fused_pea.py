"""Fused-channel PEA path: numerical parity with the per-channel path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_recsys_benchmark_tpu.data import build_mlsmall_hin, synthetic_mlsmall_raw
from graph_recsys_benchmark_tpu.data.movielens import mlsmall_metapath_edges
from graph_recsys_benchmark_tpu.graph import build_fused_metapath_graphs, build_metapath_graphs
from graph_recsys_benchmark_tpu.models.pea import PEAConfig, pea_forward, pea_init


@pytest.fixture(scope="module")
def setup():
    movies, ratings, tagging = synthetic_mlsmall_raw(
        seed=0, num_users=60, num_items=50, min_ratings_per_user=5, max_ratings_per_user=12
    )
    hin = build_mlsmall_hin(movies, ratings, tagging, num_core=2, num_feat_core=1)
    return hin, mlsmall_metapath_edges(hin)


@pytest.mark.parametrize("conv", ["gcn", "sage", "gat"])
def test_fused_matches_per_channel(setup, conv):
    hin, edges = setup
    cfg = PEAConfig(
        conv=conv, num_nodes=hin.num_nodes, meta_path_steps=(2,) * 9,
        emb_dim=16, hidden_size=16, repr_dim=8,
        num_heads=2 if conv == "gat" else 1,
    )
    params = pea_init(jax.random.PRNGKey(0), cfg)
    per = build_metapath_graphs(edges, hin.num_nodes, conv)
    fused = build_fused_metapath_graphs(edges, hin.num_nodes, conv)
    out_per = np.asarray(pea_forward(params, per, cfg))
    out_fused = np.asarray(pea_forward(params, fused, cfg))
    np.testing.assert_allclose(out_fused, out_per, rtol=2e-4, atol=2e-5)


def test_fused_channel_ablation(setup):
    hin, edges = setup
    cfg = PEAConfig(
        conv="gcn", num_nodes=hin.num_nodes, meta_path_steps=(2,) * 9,
        emb_dim=16, hidden_size=16, repr_dim=8,
    )
    params = pea_init(jax.random.PRNGKey(1), cfg)
    fused = build_fused_metapath_graphs(edges, hin.num_nodes, "gcn")
    mask = jnp.ones(9).at[3].set(0.0)
    a = np.asarray(pea_forward(params, fused, cfg, channel_mask=mask))
    b = np.asarray(pea_forward(params, fused, cfg))
    assert not np.allclose(a, b)


def test_fused_grads_match(setup):
    hin, edges = setup
    cfg = PEAConfig(
        conv="gcn", num_nodes=hin.num_nodes, meta_path_steps=(2,) * 9,
        emb_dim=8, hidden_size=8, repr_dim=4,
    )
    params = pea_init(jax.random.PRNGKey(2), cfg)
    per = build_metapath_graphs(edges, hin.num_nodes, "gcn")
    fused = build_fused_metapath_graphs(edges, hin.num_nodes, "gcn")

    def loss(p, graphs):
        return jnp.sum(pea_forward(p, graphs, cfg) ** 2)

    g1 = jax.grad(loss)(params, per)
    g2 = jax.grad(loss)(params, fused)
    np.testing.assert_allclose(
        np.asarray(g1["x"]), np.asarray(g2["x"]), rtol=5e-4, atol=5e-5
    )
