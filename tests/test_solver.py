"""Solver orchestration: run/epoch loops, logging, checkpoint resume."""

import os

import jax
import numpy as np

from graph_recsys_benchmark_tpu.data import build_mlsmall_hin, synthetic_mlsmall_raw
from graph_recsys_benchmark_tpu.models.pea import PEAConfig
from graph_recsys_benchmark_tpu.train import PEATrainer, TrainConfig
from graph_recsys_benchmark_tpu.train.solver import Solver
from graph_recsys_benchmark_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def _trainer():
    movies, ratings, tagging = synthetic_mlsmall_raw(
        seed=2, num_users=40, num_items=30, min_ratings_per_user=5, max_ratings_per_user=10
    )
    hin = build_mlsmall_hin(movies, ratings, tagging, num_core=2, num_feat_core=1)
    cfg = PEAConfig(
        conv="gcn", num_nodes=hin.num_nodes, meta_path_steps=(2,) * 9,
        emb_dim=8, hidden_size=8, repr_dim=4,
    )
    return PEATrainer(hin, cfg, TrainConfig(batch_size=64, sampling_strategy="random"))


def test_checkpoint_roundtrip(tmp_path):
    trainer = _trainer()
    params, opt_state = trainer.init(seed=1)
    params2, opt_state2, loss = trainer.run_epoch(params, opt_state, jax.random.PRNGKey(0))
    hist = {"HR": np.zeros((1, 16)), "NDCG": np.zeros((1, 16)), "AUC": np.zeros(1),
            "train_loss": np.asarray([float(loss)]), "eval_loss": np.zeros(1)}
    path = os.path.join(tmp_path, "run_1", "latest.ckpt")
    save_checkpoint(path, params2, opt_state2, 1, hist)

    fresh_p, fresh_o = trainer.init(seed=1)
    lp, lo, epoch, rec = load_checkpoint(path, fresh_p, fresh_o)
    assert epoch == 1
    np.testing.assert_allclose(np.asarray(lp["x"]), np.asarray(params2["x"]))
    np.testing.assert_allclose(rec["train_loss"], hist["train_loss"])
    # loaded state continues training identically
    a1 = trainer.run_epoch(params2, opt_state2, jax.random.PRNGKey(9))
    a2 = trainer.run_epoch(lp, lo, jax.random.PRNGKey(9))
    np.testing.assert_allclose(float(a1[2]), float(a2[2]), rtol=1e-6)


def test_solver_runs_and_resumes(tmp_path):
    trainer = _trainer()
    out = os.path.join(tmp_path, "solver")
    s = Solver(trainer, out, runs=2, epochs=2, init_eval=True,
               save_epochs=(1,), save_every_epoch=0,
               metapath_test=True, num_metapaths=9)
    overall = s.run()
    assert overall["HR"].shape == (16,)
    assert os.path.isfile(os.path.join(out, "logger_file.txt"))
    assert os.path.isfile(os.path.join(out, "run_1", "latest.ckpt"))
    txt = open(os.path.join(out, "logger_file.txt")).read()
    assert "exclude path:8" in txt  # metapath ablation ran at final epoch
    assert "Overall" in txt

    # run-level resume: a new solver sees 2 completed runs and does nothing new
    s2 = Solver(trainer, out, runs=2, epochs=2)
    assert s2.logger.last_run == 2
    overall2 = s2.run()
    np.testing.assert_allclose(overall["HR"], overall2["HR"])
