"""Reference-checkpoint migration (utils/torch_import.py).

The six shipped REAL pre-trained checkpoints (reference
experiments/checkpoint/weights/Movielenslatest-small/, SURVEY.md 2.3) are
converted into this framework's parameter pytrees: structure/shape identity
with pea_init is asserted leaf-by-leaf, the imported weights drive a real
forward + predict, and the recorded real-data metric histories (the
reference's OWN measurements on ml-latest-small) are sanity-pinned.
"""

import glob
import os

import jax
import numpy as np
import pytest

REF = "/root/reference/experiments/checkpoint/weights/Movielenslatest-small"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkpoints not present"
)


def _ckpt(model, entity_aware):
    pat = f"{REF}/{model}/BPR/*entity_aware': {entity_aware}*/run_1/latest.pkl"
    hits = glob.glob(pat)
    assert hits, pat
    return hits[0]


def _cfg(conv):
    from graph_recsys_benchmark_tpu.models.pea import PEAConfig

    # the shipped checkpoints' recipe (dir name = str(model_args), reference
    # peagat_solver_bpr.py:100-101): emb 64, hidden 64, repr 16, 9 metapaths,
    # att fusion, 2933 nodes in the real core-10 ml-latest-small HIN
    return PEAConfig(
        conv=conv, num_nodes=2933, meta_path_steps=(2,) * 9,
        emb_dim=64, hidden_size=64, repr_dim=16, entity_aware=True,
    )


@pytest.mark.parametrize("model,conv", [
    ("PEAGAT", "gat"), ("PEAGCN", "gcn"), ("PEASage", "sage"),
])
@pytest.mark.parametrize("entity_aware", [True, False])
def test_import_matches_init_structure(model, conv, entity_aware):
    from graph_recsys_benchmark_tpu.models.pea import pea_init
    from graph_recsys_benchmark_tpu.utils.torch_import import (
        import_reference_checkpoint,
    )

    cfg = _cfg(conv)
    params, rec, epoch = import_reference_checkpoint(
        _ckpt(model, entity_aware), cfg
    )
    assert epoch == 30
    ref_tree = pea_init(jax.random.PRNGKey(0), cfg)
    got = jax.tree_util.tree_structure(params)
    want = jax.tree_util.tree_structure(ref_tree)
    assert got == want
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(ref_tree)
    ):
        assert np.asarray(a).shape == np.asarray(b).shape

    # the recorded REAL ml-latest-small history: 30 epochs x 16-wide vectors,
    # best HR@10 in the published band (BASELINE.md table is the mean of the
    # per-run maxima over 5 runs; run_1 must be in a plausible neighborhood)
    assert rec["HR"].shape == (30, 16)
    best_hr10 = float(rec["HR"][:, 5].max())
    assert 0.40 < best_hr10 < 0.65, best_hr10


def test_imported_weights_drive_forward():
    """Imported PEAGAT weights run the full forward/predict on a graph over
    the checkpoint's 2933-node id space (edges synthetic: the reference's
    processed-graph pickle was stripped, so only structure can be driven)."""
    import jax.numpy as jnp

    from graph_recsys_benchmark_tpu.graph import build_metapath_graphs
    from graph_recsys_benchmark_tpu.models.pea import pea_forward, pea_predict
    from graph_recsys_benchmark_tpu.utils.torch_import import (
        import_reference_checkpoint,
    )

    cfg = _cfg("gat")
    params, _, _ = import_reference_checkpoint(_ckpt("PEAGAT", True), cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    rng = np.random.default_rng(0)
    metapaths = [[(rng.integers(0, 2933, size=500), rng.integers(0, 2933, size=500)),
                  (rng.integers(0, 2933, size=500), rng.integers(0, 2933, size=500))]
                 for _ in range(9)]
    graphs = build_metapath_graphs(metapaths, 2933, "gat")
    cached = pea_forward(params, graphs, cfg)
    assert cached.shape == (2933, 16)
    scores = pea_predict(params, cached, jnp.arange(10), jnp.arange(10, 20))
    assert np.all(np.isfinite(np.asarray(scores)))
