"""Dataset download/extract path (data/download.py) with file:// fixtures.

Mirrors the reference `_download` recipe
(/root/reference/graph_recsys_benchmark/datasets/dataset.py:117-123 and
movielens.py:627-629) without network: the environment has zero egress, so
the full fetch -> extract -> skip pipeline runs against local zip
archives via file:// URLs.
"""

import os
import os.path as osp
import zipfile

import numpy as np
import pandas as pd

from graph_recsys_benchmark_tpu.data.download import (
    DATASET_URLS,
    download_url,
    ensure_raw_dataset,
    extract_zip,
)


def _make_ml_zip(tmp_path, folder_name="ml-latest-small"):
    """A grouplens-style zip: files wrapped in '<dataset>/'."""
    movies = pd.DataFrame(
        {"movieId": [1, 2], "title": ["A (1990)", "B (1991)"],
         "genres": ["Comedy", "Drama|Comedy"]}
    )
    ratings = pd.DataFrame(
        {"userId": [1, 1, 2], "movieId": [1, 2, 1],
         "rating": [4.0, 3.0, 5.0], "timestamp": [1, 2, 3]}
    )
    tags = pd.DataFrame(
        {"userId": [1], "movieId": [1], "tag": ["fun"], "timestamp": [4]}
    )
    src = tmp_path / "stage" / folder_name
    os.makedirs(src)
    movies.to_csv(src / "movies.csv", index=False)
    ratings.to_csv(src / "ratings.csv", index=False)
    tags.to_csv(src / "tags.csv", index=False)
    zpath = tmp_path / f"{folder_name}.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        for f in ("movies.csv", "ratings.csv", "tags.csv"):
            zf.write(src / f, arcname=f"{folder_name}/{f}")
    return str(zpath)


def test_download_url_file_scheme_and_skip(tmp_path, capsys):
    zpath = _make_ml_zip(tmp_path)
    folder = str(tmp_path / "dl")
    p1 = download_url("file://" + zpath, folder)
    assert osp.exists(p1)
    # second call skips (reference/PyG 'Using exist file' semantics)
    p2 = download_url("file://" + zpath, folder)
    assert p1 == p2
    assert "Using exist file" in capsys.readouterr().out


def test_ensure_raw_fresh_extract_and_cached_skip(tmp_path):
    zpath = _make_ml_zip(tmp_path)
    raw_dir = str(tmp_path / "data" / "ml-latest-small")
    required = ["movies.csv", "ratings.csv", "tags.csv"]
    ok = ensure_raw_dataset(raw_dir, required, "file://" + zpath)
    assert ok
    for f in required:
        assert osp.exists(osp.join(raw_dir, f))
    # parse the extracted dir with the real parser
    from graph_recsys_benchmark_tpu.data.ml_raw import parse_ml_dir

    movies, ratings, tagging = parse_ml_dir(raw_dir)
    assert len(ratings) == 3 and len(movies) == 2
    # cached skip: corrupt the archive; existing files must short-circuit
    with open(zpath, "wb") as f:
        f.write(b"not a zip")
    assert ensure_raw_dataset(raw_dir, required, "file://" + zpath)


def test_ensure_raw_flat_zip(tmp_path):
    """Archives without the dataset wrapper extract straight into raw_dir."""
    flat = tmp_path / "flat.zip"
    with zipfile.ZipFile(flat, "w") as zf:
        zf.writestr("a.csv", "x\n1\n")
    raw_dir = str(tmp_path / "rawflat")
    assert ensure_raw_dataset(raw_dir, ["a.csv"], "file://" + str(flat))
    assert osp.exists(osp.join(raw_dir, "a.csv"))


def test_ensure_raw_missing_url_returns_false(tmp_path):
    assert not ensure_raw_dataset(str(tmp_path / "nope"), ["x.csv"], None)


def test_reference_urls_pinned():
    """URL table matches the reference (movielens.py:587, raw_file_names)."""
    assert DATASET_URLS["ml-latest-small"].endswith("ml-latest-small.zip")
    assert DATASET_URLS["ml-25m"].endswith("ml-25m.zip")
    assert "grouplens.org/datasets/movielens" in DATASET_URLS["ml-25m"]


def test_cli_build_hin_downloads_from_file_url(tmp_path):
    """End-to-end through the CLI loader: missing raw_dir + file:// URL ->
    download, extract, parse, build the HIN."""
    import argparse

    from graph_recsys_benchmark_tpu.cli import _build_hin

    zpath = _make_ml_zip(tmp_path)
    args = argparse.Namespace(
        dataset="ml-latest-small",
        raw_dir=str(tmp_path / "auto" / "ml-latest-small"),
        dataset_url="file://" + zpath,
        num_core=0, num_feat_core=0, candidate_mode=None,
    )
    hin = _build_hin(args)
    assert hin.num_nodes > 0
    assert hin.train_pos.shape[0] > 0
