"""Native C++ runtime (hinx_core): build + parity with numpy fallbacks."""

import numpy as np
import pytest

from graph_recsys_benchmark_tpu import native


def test_native_builds():
    assert native.available(), "libhinx_core.so failed to build (g++ required)"


def test_sort_edges_parity():
    rng = np.random.default_rng(0)
    n, e = 500, 20000
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    order = native.sort_edges_by_dst(src, dst, n)
    ref = np.lexsort((src, dst))
    np.testing.assert_array_equal(dst[order], dst[ref])
    np.testing.assert_array_equal(src[order], src[ref])


def test_build_csr():
    src = np.array([0, 2, 2, 1, 0])
    dst = np.array([5, 6, 7, 8, 9])
    rowptr, col = native.build_csr(src, dst, 3)
    np.testing.assert_array_equal(rowptr, [0, 2, 3, 5])
    assert set(col[0:2]) == {5, 9}
    assert col[2] == 8
    assert set(col[3:5]) == {6, 7}


def test_leave_one_out():
    uid = np.array([0, 0, 1, 1, 1, 2])
    ts = np.array([5, 9, 3, 3, 1, 7])
    mask = native.leave_one_out(uid, ts, 3)
    # user 0 -> row 1 (ts 9); user 1 -> row 3 (tie 3 -> later row); user 2 -> row 5
    np.testing.assert_array_equal(mask, [False, True, False, True, False, True])


def test_seen_table():
    uid = np.array([0, 0, 0, 1, 1])
    iid = np.array([4, 2, 4, 7, 3])
    seen, counts = native.build_seen_table(uid, iid, 2, width=4, pad_value=99)
    np.testing.assert_array_equal(seen[0], [2, 4, 99, 99])
    np.testing.assert_array_equal(seen[1], [3, 7, 99, 99])
    np.testing.assert_array_equal(counts, [2, 2])


def test_metapath_walk_follows_edges():
    # bipartite 3 users x 4 items, forward/backward CSRs
    u2i = (np.array([0, 2, 3, 5, 6]), np.array([0, 1, 1, 2, 0, 3]))  # rowptr over 4? users=4
    rowptr_f = np.array([0, 2, 4, 6])
    col_f = np.array([0, 1, 1, 2, 0, 3])
    rowptr_b = np.array([0, 2, 4, 5, 6])
    col_b = np.array([0, 2, 0, 1, 1, 2])
    walks = native.metapath_walk(
        [(rowptr_f, col_f), (rowptr_b, col_b)], np.array([0, 1, 2]), walk_len=6, seed=7
    )
    assert walks.shape == (3, 7)
    fwd = {(u, col_f[k]) for u in range(3) for k in range(rowptr_f[u], rowptr_f[u + 1])}
    for w in walks:
        for t in range(0, 6, 2):
            assert (w[t], w[t + 1]) in fwd
