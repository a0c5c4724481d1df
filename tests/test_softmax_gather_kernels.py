"""Fused softmax-stats kernel + sorted-backward gather: parity tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_recsys_benchmark_tpu.ops import segment_softmax, segment_sum
from graph_recsys_benchmark_tpu.ops.gather import gather_rows
from graph_recsys_benchmark_tpu.ops.pallas_segment import segment_softmax_pallas


def _sorted_edges(rng, n, e):
    dst = np.sort(rng.integers(0, n, e)).astype(np.int32)
    return dst


@pytest.mark.parametrize("n,e", [(13, 77), (200, 3000)])
def test_softmax_pallas_matches_xla(n, e):
    rng = np.random.default_rng(0)
    dst = _sorted_edges(rng, n, e)
    alpha = rng.standard_normal(e).astype(np.float32) * 3
    got = segment_softmax_pallas(jnp.asarray(alpha), jnp.asarray(dst), n, True)
    want = segment_softmax(jnp.asarray(alpha), jnp.asarray(dst), n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_softmax_pallas_grad_matches_xla():
    rng = np.random.default_rng(1)
    n, e = 50, 1200
    dst = _sorted_edges(rng, n, e)
    alpha = jnp.asarray(rng.standard_normal(e).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(e).astype(np.float32))

    def f_pallas(a):
        return jnp.sum(segment_softmax_pallas(a, jnp.asarray(dst), n, True) * w)

    def f_xla(a):
        return jnp.sum(segment_softmax(a, jnp.asarray(dst), n) * w)

    g1 = jax.grad(f_pallas)(alpha)
    g2 = jax.grad(f_xla)(alpha)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_softmax_pallas_with_padding_sentinel():
    n, e = 10, 64
    rng = np.random.default_rng(2)
    dst = np.sort(rng.integers(0, n, e)).astype(np.int32)
    dst[-10:] = n  # padding
    alpha = rng.standard_normal(e).astype(np.float32)
    got = np.asarray(segment_softmax_pallas(jnp.asarray(alpha), jnp.asarray(dst), n, True))
    assert np.all(np.isfinite(got))
    # real segments sum to 1
    sums = np.asarray(
        segment_sum(jnp.asarray(got), jnp.asarray(dst), n)
    )
    for seg in np.unique(dst[dst < n]):
        np.testing.assert_allclose(sums[seg], 1.0, rtol=1e-5)


def test_gather_rows_value_and_grad():
    rng = np.random.default_rng(3)
    n, e, d = 40, 500, 8
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    idx = rng.integers(0, n, e).astype(np.int32)
    perm = np.argsort(idx, kind="stable").astype(np.int32)
    idx_sorted = idx[perm]
    args = (jnp.asarray(idx), jnp.asarray(perm), jnp.asarray(idx_sorted))

    got = gather_rows(x, *args, n)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(x)[idx])

    w = jnp.asarray(rng.standard_normal((e, d)).astype(np.float32))
    g1 = jax.grad(lambda x: jnp.sum(gather_rows(x, *args, n) * w))(x)
    g2 = jax.grad(lambda x: jnp.sum(x[idx] * w))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5)


def test_gather_rows_3d_cotangent():
    rng = np.random.default_rng(4)
    n, e, h, c = 20, 200, 2, 4
    x = jnp.asarray(rng.standard_normal((n, h, c)).astype(np.float32))
    idx = rng.integers(0, n, e).astype(np.int32)
    perm = np.argsort(idx, kind="stable").astype(np.int32)
    args = (jnp.asarray(idx), jnp.asarray(perm), jnp.asarray(idx[perm]))
    w = jnp.asarray(rng.standard_normal((e, h, c)).astype(np.float32))
    g1 = jax.grad(lambda x: jnp.sum(gather_rows(x, *args, n) * w))(x)
    g2 = jax.grad(lambda x: jnp.sum(x[idx] * w))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------- broadcast

def test_sorted_broadcast_1d_value_and_grad():
    from graph_recsys_benchmark_tpu.ops.pallas_segment import sorted_broadcast_pallas

    rng = np.random.default_rng(3)
    n, e = 300, 5000
    dst = np.sort(rng.integers(0, n, e)).astype(np.int32)
    dst[-17:] = n  # padding sentinel
    v = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(e).astype(np.float32))
    dstj = jnp.asarray(dst)

    got = np.asarray(sorted_broadcast_pallas(v, dstj, n, True))
    want = np.where(dst < n, np.asarray(v)[np.minimum(dst, n - 1)], 0.0)
    np.testing.assert_array_equal(got, want)  # exact row select

    g1 = jax.grad(lambda x: jnp.sum(sorted_broadcast_pallas(x, dstj, n, True) * w))(v)
    safe = jnp.minimum(dstj, n - 1)
    g2 = jax.grad(
        lambda x: jnp.sum(jnp.where(dstj < n, x[safe], 0.0) * w)
    )(v)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-6)


def test_sorted_broadcast_2d_columns():
    from graph_recsys_benchmark_tpu.ops.pallas_segment import sorted_broadcast_pallas

    rng = np.random.default_rng(4)
    n, e, k = 150, 4000, 3
    dst = np.sort(rng.integers(0, n, e)).astype(np.int32)
    v = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    got = np.asarray(sorted_broadcast_pallas(v, jnp.asarray(dst), n, True))
    np.testing.assert_array_equal(got, np.asarray(v)[dst])
