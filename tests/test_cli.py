"""CLI end-to-end: every model family runs through the unified entry point."""

import numpy as np
import pytest

from graph_recsys_benchmark_tpu.cli import main


@pytest.mark.parametrize(
    "model", ["PEAGCN", "NGCF", "KGAT", "CFKG", "NFM", "MetaPath2Vec", "HeRec"]
)
def test_cli_smoke(tmp_path, model, monkeypatch):
    monkeypatch.chdir(tmp_path)
    argv = [
        "--model", model, "--dataset", "synthetic-ml",
        "--runs", "1", "--epochs", "2", "--batch_size", "256",
        "--emb_dim", "8", "--hidden_size", "8", "--repr_dim", "4",
        "--init_eval", "false",
        "--walks_per_node", "4", "--walk_length", "8", "--context_size", "4",
        "--out_dir", str(tmp_path / "runs"),
        "--cache_dir", str(tmp_path / "cache"),
    ]
    overall = main(argv)
    assert overall["HR"].shape == (16,)
    assert np.all(np.isfinite(overall["HR"]))


def test_cli_metapath_test_and_resume(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    argv = [
        "--model", "PEAGCN", "--dataset", "synthetic-ml",
        "--runs", "1", "--epochs", "1", "--batch_size", "256",
        "--emb_dim", "8", "--hidden_size", "8", "--repr_dim", "4",
        "--init_eval", "false", "--metapath_test", "true",
        "--out_dir", str(tmp_path / "runs"),
        "--cache_dir", str(tmp_path / "cache"),
    ]
    o1 = main(argv)
    o2 = main(argv)  # resumes at run granularity: same summary
    np.testing.assert_allclose(o1["HR"], o2["HR"])
