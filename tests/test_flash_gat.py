"""Flash-GAT megakernels vs the XLA oracle — values and gradients.

The forward kernel fuses gather + logits + segment-softmax + weighted
segment-sum (models/pea._fused_gat_step's edge pipeline) into one Pallas
pass; the backward megakernel fuses the dst stat broadcast, src re-gather,
cotangent scatter and da_dst segment-sum into another.  These tests run
both in interpret mode on the CPU mesh against
ops.flash_gat.flash_gat_reference (itself tested against PyG semantics via
tests/test_convs.py) in value and gradient, over block-ordered and fully
sorted edge lists, with and without padding edges, f32 and bf16 transport.
The composed non-VMEM fallback backward is exercised separately.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_recsys_benchmark_tpu.ops import flash_gat as fg
from graph_recsys_benchmark_tpu.ops.flash_gat import (
    flash_gat_attention,
    flash_gat_reference,
    pack_gat_table,
)


def _block_order(src, dst):
    order = np.lexsort((src, dst // 128))
    return src[order], dst[order]


def _make_case(rng, n, e, kz, pad=0, block_order=True, t_dtype=jnp.float32):
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
    z_t = rng.standard_normal((kz, n)).astype(np.float32)
    a_src = rng.standard_normal(n).astype(np.float32)
    a_dst = rng.standard_normal(n).astype(np.float32)
    packed_t = pack_gat_table(jnp.asarray(z_t), jnp.asarray(a_src), n, t_dtype)
    perm = np.argsort(src, kind="stable").astype(np.int32)
    return packed_t, a_dst, src, dst, perm, src[perm]


@pytest.mark.parametrize("block_order", [True, False])
@pytest.mark.parametrize("pad", [0, 37])
def test_flash_gat_forward_matches_oracle(block_order, pad):
    rng = np.random.default_rng(0 if block_order else 1)
    n, e, kz = 300, 2500, 16
    packed_t, a_dst, src, dst, perm, src_sorted = _make_case(
        rng, n, e, kz, pad=pad, block_order=block_order
    )
    out = flash_gat_attention(
        packed_t, a_dst, src, dst, perm, src_sorted, n, kz, 0.2, True, "f32"
    )
    ref = flash_gat_reference(packed_t, a_dst, src, dst, n, kz)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("bwd_path", ["glue", "mega"])
def test_flash_gat_gradients_match_oracle(bwd_path):
    """Backward kernels (interpret mode) vs oracle autodiff: the chunk-major
    glue kernel (the TPU default) and the one-pass megakernel."""
    from graph_recsys_benchmark_tpu.ops import config as ops_config

    rng = np.random.default_rng(2)
    n, e, kz = 260, 2100, 8
    packed_t, a_dst, src, dst, perm, src_sorted = _make_case(
        rng, n, e, kz, pad=12
    )
    cot = rng.standard_normal((n, kz)).astype(np.float32)

    def f_kernel(p, a):
        out = flash_gat_attention(
            p, a, src, dst, perm, src_sorted, n, kz, 0.2, True, "f32"
        )
        return jnp.sum(out * cot)

    def f_ref(p, a):
        return jnp.sum(flash_gat_reference(p, a, src, dst, n, kz) * cot)

    old = ops_config.FLASH_BWD_MEGA
    try:
        ops_config.FLASH_BWD_MEGA = bwd_path == "mega"
        gp, ga = jax.jit(jax.grad(f_kernel, argnums=(0, 1)))(packed_t, a_dst)
    finally:
        ops_config.FLASH_BWD_MEGA = old
    gp_ref, ga_ref = jax.grad(f_ref, argnums=(0, 1))(packed_t, a_dst)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gp_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ga_ref), atol=3e-5)


def test_flash_gat_composed_fallback_backward_matches_oracle():
    """The non-VMEM fallback path (ml-25m-scale tables) — composed from the
    round-1 kernels, here dispatched to their XLA oracles on CPU."""
    rng = np.random.default_rng(5)
    n, e, kz = 260, 2100, 8
    packed_t, a_dst, src, dst, perm, src_sorted = _make_case(
        rng, n, e, kz, pad=12
    )
    cot = jnp.asarray(rng.standard_normal((n, kz)).astype(np.float32))

    out, m, s = fg._flash_forward_impl(
        packed_t, jnp.asarray(a_dst), jnp.asarray(src), jnp.asarray(dst),
        n, kz, 0.2, True, "f32",
    )
    res = (packed_t, jnp.asarray(a_dst), jnp.asarray(src), jnp.asarray(dst),
           jnp.asarray(perm), jnp.asarray(src_sorted), m, s, out)
    # interpret=False on CPU -> use_mega False -> composed fallback
    gp, ga, *_ = jax.jit(
        lambda r, c: fg._flash_bwd(n, kz, 0.2, False, "f32", r, c)
    )(res, cot)

    def f_ref(p, a):
        return jnp.sum(flash_gat_reference(p, a, src, dst, n, kz) * cot)

    gp_ref, ga_ref = jax.grad(f_ref, argnums=(0, 1))(packed_t, jnp.asarray(a_dst))
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gp_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ga_ref), atol=3e-5)


def test_flash_gat_bf16_transport_close():
    rng = np.random.default_rng(3)
    n, e, kz = 300, 2500, 16
    packed_t, a_dst, src, dst, perm, src_sorted = _make_case(
        rng, n, e, kz, pad=20, t_dtype=jnp.bfloat16
    )
    out = flash_gat_attention(
        packed_t, a_dst, src, dst, perm, src_sorted, n, kz, 0.2, True, "bf16"
    )
    ref = flash_gat_reference(packed_t, a_dst, src, dst, n, kz)
    # bf16 transport costs ~3 mantissa bits on z and the logits
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.05)


def test_flash_gat_bf16_gradients_close():
    rng = np.random.default_rng(6)
    n, e, kz = 300, 2500, 16
    packed_t, a_dst, src, dst, perm, src_sorted = _make_case(
        rng, n, e, kz, pad=20, t_dtype=jnp.bfloat16
    )
    cot = rng.standard_normal((n, kz)).astype(np.float32)

    def f_kernel(p, a):
        out = flash_gat_attention(
            p, a, src, dst, perm, src_sorted, n, kz, 0.2, True, "bf16"
        )
        return jnp.sum(out * cot)

    def f_ref(p, a):
        # the kernel's logits ride bf16 transport, which can flip the sign
        # of near-zero pre-activations — the leaky-ReLU kink then picks a
        # different slope than an f32 oracle would.  The kernel backward is
        # consistent with ITS forward, so the oracle must see the same
        # rounded a_dst to make kink decisions comparable.
        a_r = a.astype(jnp.bfloat16).astype(jnp.float32)
        return jnp.sum(flash_gat_reference(p, a_r, src, dst, n, kz) * cot)

    gp, ga = jax.jit(jax.grad(f_kernel, argnums=(0, 1)))(packed_t, a_dst)
    gp_ref, ga_ref = jax.grad(f_ref, argnums=(0, 1))(
        packed_t.astype(jnp.float32), jnp.asarray(a_dst)
    )
    np.testing.assert_allclose(
        np.asarray(gp, np.float32), np.asarray(gp_ref), atol=0.08
    )
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ga_ref), atol=0.08)


def test_flash_gat_isolated_and_empty_rows():
    # rows with no incoming edges must produce exactly zero (s=0 guard)
    rng = np.random.default_rng(4)
    n, kz = 140, 8
    src = np.array([0, 1, 2, 3], np.int32)
    dst = np.array([5, 5, 130, 130], np.int32)
    z_t = rng.standard_normal((kz, n)).astype(np.float32)
    a_src = rng.standard_normal(n).astype(np.float32)
    a_dst = rng.standard_normal(n).astype(np.float32)
    packed_t = pack_gat_table(
        jnp.asarray(z_t), jnp.asarray(a_src), n, jnp.float32
    )
    perm = np.argsort(src, kind="stable").astype(np.int32)
    out = flash_gat_attention(
        packed_t, a_dst, src, dst, perm, src[perm], n, kz, 0.2, True, "f32"
    )
    ref = flash_gat_reference(packed_t, a_dst, src, dst, n, kz)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    assert np.all(np.asarray(out)[0] == 0.0)


@pytest.mark.parametrize("grid", ["chunk", "block"])
def test_flash_gat_grid_modes_match_oracle(grid):
    """Both forward grid layouts (ops/config.FLASH_FWD_GRID) compute the
    same attention: 'chunk' walks edge chunks with a VMEM-resident shared
    accumulator, 'block' walks dst blocks (flash_gat docstrings)."""
    from graph_recsys_benchmark_tpu.ops import config as ops_config

    rng = np.random.default_rng(11)
    n, e, kz = 300, 2500, 16
    packed_t, a_dst, src, dst, perm, src_sorted = _make_case(
        rng, n, e, kz, pad=23, block_order=True
    )
    old = ops_config.FLASH_FWD_GRID
    try:
        ops_config.FLASH_FWD_GRID = grid
        out, m, s = fg._flash_forward_impl(
            packed_t, jnp.asarray(a_dst), jnp.asarray(src), jnp.asarray(dst),
            n, kz, 0.2, True, "f32",
        )
    finally:
        ops_config.FLASH_FWD_GRID = old
    ref = flash_gat_reference(packed_t, a_dst, src, dst, n, kz)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # the residual contract (m, s reproduce the denominator) must hold for
    # the composed backward regardless of grid layout
    den = np.exp(np.asarray(m)) * np.asarray(s)
    assert np.all(np.isfinite(den))


def test_flash_gat_grid_modes_bf16_transport_parity():
    """Under bf16 transport the chunk-major grid must gather the SAME
    t_dtype-rounded [a_dst | m̂] table the block-major kernel casts
    internally — and both must hand the backward a residual m that matches
    their forward shift bitwise (round-3 ADVICE, medium)."""
    from graph_recsys_benchmark_tpu.ops import config as ops_config

    rng = np.random.default_rng(21)
    n, e, kz = 300, 2500, 16
    packed_t, a_dst, src, dst, perm, src_sorted = _make_case(
        rng, n, e, kz, pad=23, block_order=True, t_dtype=jnp.bfloat16
    )
    cot = rng.standard_normal((n, kz)).astype(np.float32)
    outs, grads = {}, {}
    old = ops_config.FLASH_FWD_GRID
    try:
        for grid in ("chunk", "block"):
            ops_config.FLASH_FWD_GRID = grid

            def f(p, a):
                out = flash_gat_attention(
                    p, a, src, dst, perm, src_sorted, n, kz, 0.2, True,
                    "bf16",
                )
                return jnp.sum(out * cot), out

            (_, out), g = jax.value_and_grad(
                f, argnums=(0, 1), has_aux=True
            )(packed_t, a_dst)
            outs[grid], grads[grid] = np.asarray(out), g
    finally:
        ops_config.FLASH_FWD_GRID = old
    # identical rounded logits -> identical softmax weights up to fp noise
    np.testing.assert_allclose(outs["chunk"], outs["block"], atol=2e-5)
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(grads["chunk"][i], np.float32),
            np.asarray(grads["block"][i], np.float32),
            atol=3e-4,
        )


def test_flash_gat_empty_edge_list():
    """e=0 must return exact zeros on every path (round-3 ADVICE: the
    chunk-major zero-size grid left the accumulator uninitialized)."""
    rng = np.random.default_rng(22)
    n, kz = 140, 8
    src = np.zeros((0,), np.int32)
    dst = np.zeros((0,), np.int32)
    z_t = rng.standard_normal((kz, n)).astype(np.float32)
    a_src = rng.standard_normal(n).astype(np.float32)
    a_dst = rng.standard_normal(n).astype(np.float32)
    packed_t = pack_gat_table(
        jnp.asarray(z_t), jnp.asarray(a_src), n, jnp.float32
    )
    perm = np.zeros((0,), np.int32)

    def f(p, a):
        out = flash_gat_attention(
            p, a, src, dst, perm, src[perm], n, kz, 0.2, True, "f32"
        )
        return jnp.sum(out * out), out

    (_, out), (gp, ga) = jax.value_and_grad(f, argnums=(0, 1), has_aux=True)(
        packed_t, a_dst
    )
    assert np.all(np.asarray(out) == 0.0)
    assert np.all(np.asarray(gp) == 0.0) and np.all(np.asarray(ga) == 0.0)


@pytest.mark.parametrize("shift", ["bound", "online"])
def test_flash_gat_shift_modes_match_oracle(shift):
    """Both softmax-shift strategies (ops/config.FLASH_SOFTMAX_SHIFT) are
    fp-equivalent to the oracle: the shift cancels between numerator and
    denominator (flash_gat._make_flash_kernel v2/v3 docstrings)."""
    from graph_recsys_benchmark_tpu.ops import config as ops_config

    rng = np.random.default_rng(7)
    n, e, kz = 300, 2500, 16
    packed_t, a_dst, src, dst, perm, src_sorted = _make_case(
        rng, n, e, kz, pad=19, block_order=True
    )
    old = ops_config.FLASH_SOFTMAX_SHIFT
    try:
        ops_config.FLASH_SOFTMAX_SHIFT = shift

        def loss(q, a):
            out = flash_gat_attention(
                q, a, src, dst, perm, src_sorted, n, kz, 0.2, True, "f32"
            )
            return jnp.sum(out * out), out

        (_, out), (gp, ga) = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True
        )(packed_t, a_dst)
    finally:
        ops_config.FLASH_SOFTMAX_SHIFT = old

    ref = flash_gat_reference(packed_t, a_dst, src, dst, n, kz)

    def loss_ref(q, a):
        return jnp.sum(flash_gat_reference(q, a, src, dst, n, kz) ** 2)

    gp_ref, ga_ref = jax.grad(loss_ref, argnums=(0, 1))(packed_t, a_dst)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gp_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ga_ref), atol=3e-5)
