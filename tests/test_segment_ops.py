"""Property tests: segment ops vs a dense one-hot matmul oracle.

The oracle builds the dense [N, E] incidence matrix and multiplies — the
exact math `torch-scatter`'s scatter_add computes in the reference's PyG
convs (SURVEY.md section 2.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_recsys_benchmark_tpu.ops import (
    segment_max,
    segment_mean,
    segment_softmax,
    segment_sum,
    sorted_segment_sum_pallas,
)


def _random_sorted_edges(rng, n, e, d):
    dst = np.sort(rng.integers(0, n, size=e))
    msgs = rng.standard_normal((e, d)).astype(np.float32)
    return msgs, dst.astype(np.int32)


def _dense_oracle(msgs, dst, n):
    onehot = (dst[None, :] == np.arange(n)[:, None]).astype(np.float32)
    return onehot @ msgs


@pytest.mark.parametrize("n,e,d", [(7, 23, 3), (64, 500, 16), (130, 1030, 8)])
def test_segment_sum_matches_dense(n, e, d):
    rng = np.random.default_rng(0)
    msgs, dst = _random_sorted_edges(rng, n, e, d)
    got = segment_sum(jnp.asarray(msgs), jnp.asarray(dst), n)
    np.testing.assert_allclose(np.asarray(got), _dense_oracle(msgs, dst, n), rtol=1e-5, atol=1e-5)


def test_segment_sum_drops_out_of_bounds_padding():
    n = 5
    msgs = jnp.ones((4, 2), dtype=jnp.float32)
    dst = jnp.array([0, 1, n, n], dtype=jnp.int32)  # last two are padding
    got = jax.jit(lambda m, d: segment_sum(m, d, n))(msgs, dst)
    expected = np.zeros((n, 2), dtype=np.float32)
    expected[0] = 1.0
    expected[1] = 1.0
    np.testing.assert_allclose(np.asarray(got), expected)


def test_segment_mean_empty_segments_zero():
    msgs = jnp.array([[2.0], [4.0], [10.0]])
    dst = jnp.array([0, 0, 2], dtype=jnp.int32)
    got = segment_mean(msgs, dst, 4)
    np.testing.assert_allclose(np.asarray(got).ravel(), [3.0, 0.0, 10.0, 0.0])


def test_segment_max():
    x = jnp.array([1.0, 5.0, -2.0, 7.0])
    ids = jnp.array([0, 0, 1, 1], dtype=jnp.int32)
    got = segment_max(x, ids, 3)
    assert got[0] == 5.0 and got[1] == 7.0 and not np.isfinite(np.asarray(got)[2])


def test_segment_softmax_matches_per_segment_softmax():
    rng = np.random.default_rng(1)
    n, e = 9, 40
    dst = np.sort(rng.integers(0, n, size=e)).astype(np.int32)
    logits = rng.standard_normal(e).astype(np.float32)
    got = np.asarray(segment_softmax(jnp.asarray(logits), jnp.asarray(dst), n))
    for seg in range(n):
        m = dst == seg
        if m.sum() == 0:
            continue
        ref = np.exp(logits[m] - logits[m].max())
        ref = ref / (ref.sum() + 1e-16)
        np.testing.assert_allclose(got[m], ref, rtol=1e-5, atol=1e-6)
    # sums to ~1 per non-empty segment
    sums = np.asarray(segment_sum(jnp.asarray(got), jnp.asarray(dst), n))
    for seg in np.unique(dst):
        np.testing.assert_allclose(sums[seg], 1.0, rtol=1e-5)


def test_segment_softmax_finite_with_padding_sentinel():
    n = 4
    logits = jnp.array([0.3, -0.1, 2.0, 9.0, 9.0])
    dst = jnp.array([0, 0, 1, n, n], dtype=jnp.int32)  # segment 2,3 empty
    got = np.asarray(segment_softmax(logits, dst, n))
    assert np.all(np.isfinite(got))


@pytest.mark.parametrize("n,e,d", [(7, 23, 4), (200, 1500, 64), (128, 512, 128)])
def test_pallas_segment_sum_interpret_matches_xla(n, e, d):
    rng = np.random.default_rng(2)
    msgs, dst = _random_sorted_edges(rng, n, e, d)
    want = _dense_oracle(msgs, dst, n)
    got = sorted_segment_sum_pallas(jnp.asarray(msgs), jnp.asarray(dst), n, True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_pallas_segment_sum_grad_matches_xla_grad():
    rng = np.random.default_rng(3)
    n, e, d = 33, 700, 8
    msgs, dst = _random_sorted_edges(rng, n, e, d)
    msgs_j, dst_j = jnp.asarray(msgs), jnp.asarray(dst)

    def f_pallas(m):
        return jnp.sum(sorted_segment_sum_pallas(m, dst_j, n, True) ** 2)

    def f_xla(m):
        return jnp.sum(segment_sum(m, dst_j, n) ** 2)

    g1 = jax.grad(f_pallas)(msgs_j)
    g2 = jax.grad(f_xla)(msgs_j)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4)
