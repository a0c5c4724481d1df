"""End-to-end vertical slice: synthetic HIN -> PEAGCN -> BPR epochs -> eval.

Mirrors SURVEY.md section 7.2 step 3: the minimum end-to-end slice.  Random
scoring of 1 pos + 99 negs gives HR@10 ~= 0.10; a few epochs on the small
synthetic HIN must clearly beat that and the train loss must drop.
"""

import jax
import numpy as np
import pytest

from graph_recsys_benchmark_tpu.data import build_mlsmall_hin, synthetic_mlsmall_raw
from graph_recsys_benchmark_tpu.models.pea import PEAConfig
from graph_recsys_benchmark_tpu.train import PEATrainer, TrainConfig


def _make_trainer(conv="gcn", entity_aware=False, strategy="unseen", aggr="att"):
    movies, ratings, tagging = synthetic_mlsmall_raw(seed=0)
    hin = build_mlsmall_hin(movies, ratings, tagging, num_core=3, num_feat_core=2)
    cfg = PEAConfig(
        conv=conv,
        num_nodes=hin.num_nodes,
        meta_path_steps=(2,) * 9,
        emb_dim=16,
        hidden_size=16,
        repr_dim=8,
        channel_aggr=aggr,
        entity_aware=entity_aware,
    )
    tcfg = TrainConfig(
        batch_size=256,
        sampling_strategy=strategy,
        num_negative_samples=4,
    )
    return PEATrainer(hin, cfg, tcfg), hin


@pytest.mark.parametrize("conv", ["gcn", "sage"])
def test_training_improves_ranking(conv):
    trainer, hin = _make_trainer(conv=conv)
    params, opt_state = trainer.init(seed=2020)

    key = jax.random.PRNGKey(0)
    m0 = trainer.evaluate(params, key)
    hr10_before = float(m0["HR"][5])

    losses = []
    for epoch in range(6):
        key, k = jax.random.split(key)
        params, opt_state, loss = trainer.run_epoch(params, opt_state, k)
        losses.append(float(loss))

    m1 = trainer.evaluate(params, jax.random.PRNGKey(1))
    hr10_after = float(m1["HR"][5])

    assert losses[-1] < losses[0] * 0.9, losses
    assert hr10_after > max(0.15, hr10_before), (hr10_before, hr10_after)
    assert np.all(np.isfinite(np.asarray(m1["NDCG"])))
    # metric vector layout sanity: HR is monotone in k
    hr = np.asarray(m1["HR"])
    assert np.all(np.diff(hr) >= -1e-6)


def test_gat_entity_aware_trains():
    trainer, _ = _make_trainer(conv="gat", entity_aware=True, strategy="random")
    params, opt_state = trainer.init(seed=2020)
    key = jax.random.PRNGKey(0)
    l0 = None
    for epoch in range(3):
        key, k = jax.random.split(key)
        params, opt_state, loss = trainer.run_epoch(params, opt_state, k)
        if l0 is None:
            l0 = float(loss)
    assert float(loss) < l0
    assert np.isfinite(float(loss))


def test_metapath_ablation_changes_scores():
    trainer, _ = _make_trainer(conv="gcn")
    params, opt_state = trainer.init(seed=2021)
    key = jax.random.PRNGKey(0)
    params, opt_state, _ = trainer.run_epoch(params, opt_state, key)
    full = trainer.evaluate(params, jax.random.PRNGKey(7))
    ablated = trainer.evaluate(params, jax.random.PRNGKey(7), metapath_idx=0)
    # same eval RNG: any difference comes from the zeroed channel
    assert not np.allclose(np.asarray(full["AUC"]), np.asarray(ablated["AUC"]))


def test_mean_and_concat_aggregation():
    for aggr in ("mean", "concat"):
        trainer, _ = _make_trainer(aggr=aggr)
        params, opt_state = trainer.init(seed=2022)
        params, opt_state, loss = trainer.run_epoch(params, opt_state, jax.random.PRNGKey(0))
        assert np.isfinite(float(loss))
