"""Localized gather / scatter-add kernels + block edge order: parity tests.

These are the TPU replacements for XLA's serial-loop edge gathers and for
the E->E permutation gather in the gather backward (ops/gather.py); all run
in Pallas interpret mode here.  Correctness must NOT depend on index
locality — the kernels derive per-chunk windows from min/max — so the tests
cover sorted, block-ordered, and fully random index arrays.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_recsys_benchmark_tpu.graph import _sort_pad
from graph_recsys_benchmark_tpu.native import sort_edges_block
from graph_recsys_benchmark_tpu.ops.pallas_segment import (
    _broadcast_forward,
    localized_scatter_add_pallas,
    sorted_segment_sum_pallas,
    segment_softmax_pallas,
)


@pytest.mark.parametrize("order", ["sorted", "block", "random"])
@pytest.mark.parametrize("n,e,k", [(13, 77, 1), (300, 2600, 17), (130, 700, 64)])
def test_localized_gather_any_order(order, n, e, k):
    rng = np.random.default_rng(0)
    idx = rng.integers(0, n, e)
    if order == "sorted":
        idx = np.sort(idx)
    elif order == "block":
        idx = idx[np.argsort(idx // 128, kind="stable")]
    v = rng.standard_normal((n, k)).astype(np.float32)
    got = _broadcast_forward(jnp.asarray(v), jnp.asarray(idx, jnp.int32), n, True)
    np.testing.assert_array_equal(np.asarray(got), v[idx])


def test_localized_gather_bf16_exact_row_copy():
    rng = np.random.default_rng(1)
    n, e, k = 50, 300, 24
    idx = rng.integers(0, n, e)
    v = rng.standard_normal((n, k)).astype(jnp.bfloat16)
    got = _broadcast_forward(jnp.asarray(v), jnp.asarray(idx, jnp.int32), n, True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got, dtype=np.float32), np.asarray(v, dtype=np.float32)[idx]
    )


def test_localized_gather_padding_sentinel_reads_zero():
    n, k = 10, 4
    idx = np.array([0, 3, n, n, 7], dtype=np.int32)
    v = np.ones((n, k), dtype=np.float32)
    got = np.asarray(_broadcast_forward(jnp.asarray(v), jnp.asarray(idx), n, True))
    np.testing.assert_array_equal(got[2], np.zeros(k))
    np.testing.assert_array_equal(got[4], np.ones(k))


@pytest.mark.parametrize("order", ["sorted", "block", "random"])
@pytest.mark.parametrize("n,e,k", [(13, 77, 3), (300, 2600, 17), (64, 5000, 64)])
def test_localized_scatter_add_any_order(order, n, e, k):
    rng = np.random.default_rng(2)
    idx = rng.integers(0, n, e)
    if order == "sorted":
        idx = np.sort(idx)
    elif order == "block":
        idx = idx[np.argsort(idx // 128, kind="stable")]
    ct = rng.standard_normal((e, k)).astype(np.float32)
    want = np.zeros((n, k), dtype=np.float64)
    np.add.at(want, idx, ct.astype(np.float64))
    got = localized_scatter_add_pallas(
        jnp.asarray(ct), jnp.asarray(idx, jnp.int32), n, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_localized_scatter_add_padding_edges_zero_ct():
    n, k = 9, 5
    idx = np.array([1, 1, n, 0], dtype=np.int32)
    ct = np.array(
        [[1.0] * k, [2.0] * k, [0.0] * k, [4.0] * k], dtype=np.float32
    )
    got = np.asarray(
        localized_scatter_add_pallas(jnp.asarray(ct), jnp.asarray(idx), n, interpret=True)
    )
    np.testing.assert_allclose(got[1], np.full(k, 3.0))
    np.testing.assert_allclose(got[0], np.full(k, 4.0))


def test_block_order_properties():
    rng = np.random.default_rng(3)
    e, n = 4000, 700
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    order = sort_edges_block(src, dst, n, 128)
    s, d = src[order], dst[order]
    blk = d // 128
    assert np.all(np.diff(blk) >= 0), "dst//128 must be non-decreasing"
    for b in np.unique(blk):
        m = blk == b
        assert np.all(np.diff(s[m]) >= 0), "src ascending within a block"


def test_block_order_matches_numpy_fallback():
    rng = np.random.default_rng(4)
    e, n = 1000, 300
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    got = sort_edges_block(src, dst, n, 128)
    want = np.lexsort((dst, src, dst // 128))
    keys = lambda o: np.stack([dst[o] // 128, src[o], dst[o]])
    np.testing.assert_array_equal(keys(got), keys(want))


def test_segment_kernels_on_block_ordered_edges():
    """The MXU segment-sum and fused softmax must be exact under the block
    order _sort_pad now emits (dst within a 128-block is NOT sorted)."""
    rng = np.random.default_rng(5)
    e, n, d = 3000, 400, 16
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = _sort_pad(src, dst, np.ones(e, np.float32), np.zeros(e), n)
    msgs = rng.standard_normal((g.src.shape[0], d)).astype(np.float32)
    msgs[g.num_edges:] = 0.0
    want = np.zeros((n, d))
    np.add.at(want, np.asarray(g.dst)[: g.num_edges], msgs[: g.num_edges])
    got = sorted_segment_sum_pallas(jnp.asarray(msgs), g.dst, n, True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    alpha = rng.standard_normal(g.src.shape[0]).astype(np.float32)
    att = np.asarray(segment_softmax_pallas(jnp.asarray(alpha), g.dst, n, True))
    from graph_recsys_benchmark_tpu.ops import segment_softmax

    want_att = np.asarray(
        segment_softmax(jnp.asarray(alpha), g.dst, n)
    )
    real = np.asarray(g.dst) < n
    np.testing.assert_allclose(att[real], want_att[real], rtol=1e-5, atol=1e-6)


def test_gather_rows_grad_uses_scatter_path_correctly():
    """End-to-end VJP parity of gather_rows against plain XLA indexing, on a
    block-ordered graph (exercises the scatter/segment backward dispatch)."""
    from graph_recsys_benchmark_tpu.ops.gather import gather_src

    rng = np.random.default_rng(6)
    e, n, d = 2000, 150, 8
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = _sort_pad(src, dst, np.ones(e, np.float32), np.zeros(e), n)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    wt = jnp.asarray((np.asarray(g.w) != 0).astype(np.float32))[:, None]

    def f_ours(x):
        return jnp.sum((gather_src(x, g) * wt) ** 2)

    def f_xla(x):
        return jnp.sum((x[g.src] * wt) ** 2)

    np.testing.assert_allclose(f_ours(x), f_xla(x), rtol=1e-6)
    g1, g2 = jax.grad(f_ours)(x), jax.grad(f_xla)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5)
