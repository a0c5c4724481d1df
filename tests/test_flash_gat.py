"""Flash-GAT megakernel vs the XLA oracle — values and gradients.

The kernel fuses gather + logits + segment-softmax + weighted segment-sum
(models/pea._fused_gat_step's edge pipeline) into one Pallas pass; these
tests run it in interpret mode on the CPU mesh against
ops.flash_gat.flash_gat_reference (itself tested against PyG semantics via
tests/test_convs.py) in value and gradient, over block-ordered and fully
sorted edge lists, with and without padding edges, f32 and bf16 transport.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_recsys_benchmark_tpu.ops.flash_gat import (
    flash_gat_attention,
    flash_gat_reference,
)


def _block_order(src, dst):
    order = np.lexsort((src, dst // 128))
    return src[order], dst[order]


def _make_case(rng, n, e, kz, pad=0, block_order=True):
    src = rng.integers(0, n, size=e).astype(np.int32)
    dst = rng.integers(0, n, size=e).astype(np.int32)
    if block_order:
        src, dst = _block_order(src, dst)
    else:
        order = np.argsort(dst, kind="stable")
        src, dst = src[order], dst[order]
    if pad:
        src = np.concatenate([src, np.full(pad, n, np.int32)])
        dst = np.concatenate([dst, np.full(pad, n, np.int32)])
    packed = rng.standard_normal((n, kz + 1)).astype(np.float32)
    a_dst = rng.standard_normal(n).astype(np.float32)
    perm = np.argsort(src, kind="stable").astype(np.int32)
    return packed, a_dst, src, dst, perm, src[perm]


@pytest.mark.parametrize("block_order", [True, False])
@pytest.mark.parametrize("pad", [0, 37])
def test_flash_gat_forward_matches_oracle(block_order, pad):
    rng = np.random.default_rng(0 if block_order else 1)
    n, e, kz = 300, 2500, 16
    packed, a_dst, src, dst, perm, src_sorted = _make_case(
        rng, n, e, kz, pad=pad, block_order=block_order
    )
    out = flash_gat_attention(
        packed, a_dst, src, dst, perm, src_sorted, n, kz, 0.2, True, "f32"
    )
    ref = flash_gat_reference(packed, a_dst, src, dst, n, kz)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_gat_gradients_match_oracle():
    rng = np.random.default_rng(2)
    n, e, kz = 260, 2100, 8
    packed, a_dst, src, dst, perm, src_sorted = _make_case(rng, n, e, kz, pad=12)
    cot = rng.standard_normal((n, kz)).astype(np.float32)

    def f_kernel(p, a):
        out = flash_gat_attention(
            p, a, src, dst, perm, src_sorted, n, kz, 0.2, True, "f32"
        )
        return jnp.sum(out * cot)

    def f_ref(p, a):
        return jnp.sum(flash_gat_reference(p, a, src, dst, n, kz) * cot)

    # jit: the backward gathers with the padding sentinel (clamped in XLA,
    # out-of-bounds in eager numpy indexing) — production is always jitted
    gp, ga = jax.jit(jax.grad(f_kernel, argnums=(0, 1)))(packed, a_dst)
    gp_ref, ga_ref = jax.grad(f_ref, argnums=(0, 1))(packed, a_dst)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gp_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ga_ref), atol=3e-5)


def test_flash_gat_bf16_transport_close():
    rng = np.random.default_rng(3)
    n, e, kz = 300, 2500, 16
    packed, a_dst, src, dst, perm, src_sorted = _make_case(rng, n, e, kz, pad=20)
    out = flash_gat_attention(
        packed.astype(jnp.bfloat16), a_dst, src, dst, perm, src_sorted,
        n, kz, 0.2, True, "bf16",
    )
    ref = flash_gat_reference(packed, a_dst, src, dst, n, kz)
    # bf16 transport costs ~3 mantissa bits on z and the logits
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.05)


def test_flash_gat_isolated_and_empty_rows():
    # rows with no incoming edges must produce exactly zero (s=0 guard)
    rng = np.random.default_rng(4)
    n, kz = 140, 8
    src = np.array([0, 1, 2, 3], np.int32)
    dst = np.array([5, 5, 130, 130], np.int32)
    packed = rng.standard_normal((n, kz + 1)).astype(np.float32)
    a_dst = rng.standard_normal(n).astype(np.float32)
    perm = np.argsort(src, kind="stable").astype(np.int32)
    out = flash_gat_attention(
        packed, a_dst, src, dst, perm, src[perm], n, kz, 0.2, True, "f32"
    )
    ref = flash_gat_reference(packed, a_dst, src, dst, n, kz)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    assert np.all(np.asarray(out)[0] == 0.0)
