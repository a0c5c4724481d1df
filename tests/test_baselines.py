"""Baseline zoo end-to-end: NGCF, KGAT, KGCN, CFKG, NFM train + eval."""

import jax
import numpy as np
import pytest

from graph_recsys_benchmark_tpu.data import build_mlsmall_hin, synthetic_mlsmall_raw
from graph_recsys_benchmark_tpu.models.cfkg import CFKGConfig
from graph_recsys_benchmark_tpu.models.kg import KGConfig
from graph_recsys_benchmark_tpu.models.nfm import NFMConfig
from graph_recsys_benchmark_tpu.models.ngcf import NGCFConfig
from graph_recsys_benchmark_tpu.train import TrainConfig
from graph_recsys_benchmark_tpu.train.baseline_trainers import (
    CFKGTrainer,
    KGTrainer,
    NFMTrainer,
    NGCFTrainer,
)


@pytest.fixture(scope="module")
def hin():
    movies, ratings, tagging = synthetic_mlsmall_raw(seed=0)
    return build_mlsmall_hin(movies, ratings, tagging, num_core=3, num_feat_core=2)


TCFG = TrainConfig(batch_size=256, sampling_strategy="random")


def _train_epochs(trainer, n=4, seed=2020):
    params, opt_state = trainer.init(seed)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(n):
        key, k = jax.random.split(key)
        params, opt_state, loss = trainer.run_epoch(params, opt_state, k)
        if isinstance(loss, dict):  # KGAT/KGCN report kg + cf phase losses
            assert np.isfinite(float(loss["kg_train_loss"]))
            loss = loss["train_loss"]
        losses.append(float(loss))
    m = trainer.evaluate(params, jax.random.PRNGKey(1))
    return losses, m


def test_ngcf(hin):
    cfg = NGCFConfig(num_nodes=hin.num_nodes, emb_dim=16, hidden_size=16)
    losses, m = _train_epochs(NGCFTrainer(hin, cfg, TCFG), n=5)
    assert losses[-1] < losses[0]
    assert float(m["HR"][5]) > 0.12  # beats the 0.10 random baseline
    assert np.isfinite(float(m["AUC"]))


def test_ngcf_entity_aware(hin):
    cfg = NGCFConfig(num_nodes=hin.num_nodes, emb_dim=16, hidden_size=16, entity_aware=True)
    losses, m = _train_epochs(NGCFTrainer(hin, cfg, TCFG), n=2)
    assert np.isfinite(losses[-1])


@pytest.mark.parametrize("variant", ["kgat", "kgcn"])
def test_kg_models(hin, variant):
    cfg = KGConfig(
        variant=variant, num_nodes=hin.num_nodes,
        num_relations=hin.num_edge_types, emb_dim=16, hidden_size=16,
    )
    losses, m = _train_epochs(KGTrainer(hin, cfg, TCFG), n=4)
    assert losses[-1] < losses[0]
    assert float(m["HR"][5]) > 0.10
    assert np.all(np.isfinite(np.asarray(m["NDCG"])))


def test_cfkg(hin):
    cfg = CFKGConfig(
        num_nodes=hin.num_nodes, num_relations=hin.num_edge_types,
        user2item_rel=hin.edge_type_dict["user2item"], emb_dim=16,
    )
    losses, m = _train_epochs(CFKGTrainer(hin, cfg, TCFG), n=4)
    assert losses[-1] < losses[0]
    assert np.isfinite(float(m["AUC"]))


def test_nfm(hin):
    cfg = NFMConfig(num_users=hin.num_users, num_items=hin.num_items, emb_dim=16, hidden_size=16)
    trainer = NFMTrainer(hin, cfg, TCFG)
    tree, opt_state = trainer.init(2020)
    key = jax.random.PRNGKey(0)
    losses = []
    state0 = np.asarray(tree["state"]["bn0_mean"]).copy()
    for _ in range(4):
        key, k = jax.random.split(key)
        tree, opt_state, loss = trainer.run_epoch(tree, opt_state, k)
        losses.append(float(loss))
    # BN running stats actually moved
    assert not np.allclose(state0, np.asarray(tree["state"]["bn0_mean"]))
    assert losses[-1] < losses[0]
    m = trainer.evaluate(tree, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["AUC"]))
