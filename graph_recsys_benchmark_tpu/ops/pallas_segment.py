"""Pallas TPU kernels: the edge pipeline as block one-hot MXU matmuls.

These are the TPU-native replacement for the `torch-scatter` CUDA kernels
inside every PyG ``MessagePassing.propagate`` of the reference AND for
XLA's serial-loop lowering of edge gathers (SURVEY.md section 2.4).  All
edge lists are statically padded and follow graph.py's (dst//128, src)
block order; every kernel matches node ids by VALUE, so ordering is purely
a locality/speed contract, never a correctness one.

Four kernels share one idea — resolve an edge chunk against a 128-row node
window with a one-hot matmul, which is an exact row select/accumulate on
the MXU:

  segment-sum   grid = 128-row output blocks; per edge chunk in the block's
                range: acc[R, D] += OH_dst[R, C] . msgs[D, C]^T
                (double-buffered feature-major DMA; scalar-prefetched
                per-block chunk bounds from the sorted dst//128 ids)
  softmax stats online (max, rescaled sum-of-exp) per destination row —
                same loop, VPU reductions instead of matmuls
  localized     out[e] = v[idx[e]]: grid = edge chunks; per chunk resolve
  gather        against its idx min/max row windows: out[K, C] +=
                v_win[K, R] . OH[R, C]  (double-buffered window DMA)
  localized     out[i] = sum_{idx[e]==i} ct[e]: whole accumulator table
  scatter-add   VMEM-resident (node tables here are a few MB); grid walks
                edge chunks, acc[win] += OH[R, C] . ct[C, K] — this is the
                gather backward with NO E->E permutation gather

Precision: one-hot row selection is exact in any dtype (single 1.0 x v
product per output, f32 accumulate).  f32 message sums use HIGHEST (bf16x6)
to stay bit-faithful; gradient-side kernels use DEFAULT (bf16x3); the bf16
transport config halves HBM bytes and runs 1-pass MXU matmuls everywhere.

Padding edges carry a destination sentinel == num_rows (never matches an
in-bounds row; gathers read a zeroed pad row) and zero cotangents/messages.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Row-block (output rows per program) and edge-chunk sizes.  R matches the
# MXU tile; C amortizes DMA latency while keeping VMEM use small
# (2*C*D*4B = 256KB at D=64).
_R = 128
_C = 512


def _cdiv(a, b):
    return -(-a // b)


def _block_chunk_bounds(dst, n_blocks, chunk):
    """Per-row-block [first_chunk, last_chunk) ranges, TRANSPOSED [2, B].

    Edge lists are *block-monotone*: `dst // _R` is non-decreasing (true both
    for fully dst-sorted lists and for the (dst//_R, src) block order that
    graph.py emits so src gathers are window-local).  A plain searchsorted on
    `dst` would be wrong under block order, so bound chunks via the sorted
    block ids instead.

    Layout note: scalar-prefetch operands live in SMEM with rows padded to
    the 128-lane width, so a [B, 2] i32 layout costs 512 B per block and
    overflows the ~1 MB SMEM at B > 2048 (hit at ML-25M scale: 2.1M edges /
    1024-edge chunks).  [2, B] costs 8 B per block instead."""
    blk = (dst // _R).astype(jnp.int32)
    blocks = jnp.arange(n_blocks, dtype=jnp.int32)
    e_lo = jnp.searchsorted(blk, blocks, side="left").astype(jnp.int32)
    e_hi = jnp.searchsorted(blk, blocks, side="right").astype(jnp.int32)
    return jnp.stack([e_lo // chunk, _cdiv(e_hi, chunk)], axis=0)


def _make_segsum_kernel(chunk, msg_dtype):
    """Kernel factory.  f32 transport uses precision=HIGHEST (TPU default
    would decompose f32 matmuls through bf16, losing ~3 mantissa bits per
    message); bf16 transport is a native 1-pass MXU matmul (the one-hot
    operand is exact in bf16 — entries are 0/1).  Mosaic does not support
    per-operand precision, so it is uniform per transport dtype."""
    msg_precision = (
        jax.lax.Precision.DEFAULT
        if msg_dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )

    def _kernel(chunk_bounds_ref, msgs_t_hbm, dst_hbm, out_ref, msg_buf, dst_buf, sems):
        return _segsum_kernel_body(
            chunk, msg_dtype, msg_precision, chunk_bounds_ref, msgs_t_hbm,
            dst_hbm, out_ref, msg_buf, dst_buf, sems,
        )

    return _kernel


def _segsum_kernel_body(_C, msg_dtype, msg_precision, chunk_bounds_ref,
                        msgs_t_hbm, dst_hbm, out_ref, msg_buf, dst_buf, sems):
    i = pl.program_id(0)
    c_lo = chunk_bounds_ref[0, i]
    c_hi = chunk_bounds_ref[1, i]
    row0 = i * _R

    out_ref[:] = jnp.zeros_like(out_ref)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (_R, _C), dimension=0) + row0

    def start_dma(c, slot):
        msg_dma = pltpu.make_async_copy(
            msgs_t_hbm.at[:, pl.ds(c * _C, _C)], msg_buf.at[slot], sems.at[slot, 0]
        )
        dst_dma = pltpu.make_async_copy(
            dst_hbm.at[:, pl.ds(c * _C, _C)], dst_buf.at[slot], sems.at[slot, 1]
        )
        msg_dma.start()
        dst_dma.start()
        return msg_dma, dst_dma

    def wait_dma(c, slot):
        pltpu.make_async_copy(
            msgs_t_hbm.at[:, pl.ds(c * _C, _C)], msg_buf.at[slot], sems.at[slot, 0]
        ).wait()
        pltpu.make_async_copy(
            dst_hbm.at[:, pl.ds(c * _C, _C)], dst_buf.at[slot], sems.at[slot, 1]
        ).wait()

    @pl.when(c_lo < c_hi)
    def _():
        start_dma(c_lo, 0)

    def body(c, _):
        slot = jax.lax.rem(c - c_lo, 2)

        @pl.when(c + 1 < c_hi)
        def _():
            start_dma(c + 1, jax.lax.rem(c + 1 - c_lo, 2))

        wait_dma(c, slot)
        onehot = (dst_buf[slot] == row_ids).astype(msg_dtype)  # [R, C]
        # acc[R, D] += OH[R, C] . msgs[D, C]^T — contract on C, no transpose.
        out_ref[:] += jax.lax.dot_general(
            onehot,
            msg_buf[slot],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=msg_precision,
        )
        return ()

    jax.lax.fori_loop(c_lo, c_hi, body, (), unroll=False)


def _pallas_forward(msgs, dst, num_rows, interpret, transport="f32", chunk=None):
    e, d = msgs.shape
    msg_dtype = jnp.bfloat16 if transport == "bf16" else jnp.float32
    if chunk is None:
        # tools/bench_segsum_variants.py on v5e: f32 fastest at 512; bf16 at
        # 1024 (DMA-latency-bound — bf16 halves bytes/chunk, so go bigger).
        # Wider chunks for 1-col reductions were measured SLOWER end to end
        # (256.5k vs 268.8k ex/s at 4096): chunk ranges are per dst block,
        # so coarser chunks duplicate boundary chunks across neighboring
        # blocks (~70% extra edge visits at bench scale).  Mosaic also can't
        # lower the unpadded [R, C]x[C, 1] contraction (vector.broadcast
        # bf16->f32 fails at C=4096) — the 8-col pad stays.
        chunk = 1024 if msg_dtype == jnp.bfloat16 else _C
    d_pad = max(8, _cdiv(d, 8) * 8)
    e_pad = _cdiv(e, chunk) * chunk
    n_blocks = _cdiv(num_rows, _R)
    n_pad = n_blocks * _R

    msgs_t = msgs.astype(msg_dtype).T  # [D, E]
    if d_pad != d or e_pad != e:
        msgs_t = jnp.pad(msgs_t, ((0, d_pad - d), (0, e_pad - e)))
    if e_pad != e:
        dst = jnp.pad(dst, (0, e_pad - e), constant_values=num_rows)

    chunk_bounds = _block_chunk_bounds(dst, n_blocks, chunk)

    itemsize = 2 if msg_dtype == jnp.bfloat16 else 4
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (_R, d_pad), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, d_pad, chunk), msg_dtype),
            pltpu.VMEM((2, 1, chunk), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    out = pl.pallas_call(
        _make_segsum_kernel(chunk, msg_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d_pad), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * _R * e_pad * d_pad,
            bytes_accessed=e_pad * d_pad * itemsize + e_pad * 4 + n_pad * d_pad * 4,
            transcendentals=0,
        ),
    )(chunk_bounds, msgs_t, dst.reshape(1, -1).astype(jnp.int32))
    return out[:num_rows, :d]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def sorted_segment_sum_pallas(msgs, dst, num_rows, interpret=False, transport="f32"):
    """Segment-sum `msgs[E, D]` by sorted destination ids `dst[E]` into
    `[num_rows, D]`.  Padding edges must use `dst == num_rows` (their
    messages must be zeroed by the caller, as graph.py's `w == 0` does).
    transport='bf16' moves messages through HBM/MXU in bfloat16 with f32
    accumulation (half the DMA bytes, 1 MXU pass vs 3; costs ~3 mantissa
    bits per message)."""
    return _pallas_forward(msgs, dst, num_rows, interpret, transport)


def _fwd(msgs, dst, num_rows, interpret, transport):
    out = _pallas_forward(msgs, dst, num_rows, interpret, transport)
    return out, (dst, jnp.zeros((0,), msgs.dtype))


def _bwd(num_rows, interpret, transport, res, g):
    dst, dtype_probe = res
    # d/dmsgs of segment-sum is a row gather; padding edges get zero (the
    # localized-gather kernel reads the zero pad row for the sentinel, the
    # XLA fallback masks explicitly).  dst is block-monotone -> window-local.
    g_msgs = sorted_broadcast_auto(g, dst, num_rows, exact=False)
    return (g_msgs.astype(dtype_probe.dtype), None)


sorted_segment_sum_pallas.defvjp(_fwd, _bwd)


_CS = 2048  # stats-kernel edge chunk: alpha is [1, C] so bigger chunks
            # amortize DMA latency (8KB vs 2KB per transfer)


def _softmax_stats_kernel(chunk_bounds_ref, alpha_hbm, dst_hbm, max_ref, sum_ref,
                          a_buf, dst_buf, sems):
    """Online softmax statistics per destination row: running max + rescaled
    sum-of-exp, one pass over the row block's edge chunks."""
    i = pl.program_id(0)
    c_lo = chunk_bounds_ref[0, i]
    c_hi = chunk_bounds_ref[1, i]
    row0 = i * _R

    max_ref[:] = jnp.full_like(max_ref, -jnp.inf)
    sum_ref[:] = jnp.zeros_like(sum_ref)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (_R, _CS), dimension=0) + row0

    def start_dma(c, slot):
        pltpu.make_async_copy(
            alpha_hbm.at[:, pl.ds(c * _CS, _CS)], a_buf.at[slot], sems.at[slot, 0]
        ).start()
        pltpu.make_async_copy(
            dst_hbm.at[:, pl.ds(c * _CS, _CS)], dst_buf.at[slot], sems.at[slot, 1]
        ).start()

    def wait_dma(c, slot):
        pltpu.make_async_copy(
            alpha_hbm.at[:, pl.ds(c * _CS, _CS)], a_buf.at[slot], sems.at[slot, 0]
        ).wait()
        pltpu.make_async_copy(
            dst_hbm.at[:, pl.ds(c * _CS, _CS)], dst_buf.at[slot], sems.at[slot, 1]
        ).wait()

    @pl.when(c_lo < c_hi)
    def _():
        start_dma(c_lo, 0)

    def body(c, _):
        slot = jax.lax.rem(c - c_lo, 2)

        @pl.when(c + 1 < c_hi)
        def _():
            start_dma(c + 1, jax.lax.rem(c + 1 - c_lo, 2))

        wait_dma(c, slot)
        match = dst_buf[slot] == row_ids  # [R, C]
        vals = jnp.where(match, a_buf[slot], -jnp.inf)  # alpha [1, C] broadcast
        cmax = jnp.max(vals, axis=1, keepdims=True)  # [R, 1]
        csum = jnp.sum(
            jnp.where(match, jnp.exp(vals - cmax), 0.0), axis=1, keepdims=True
        )
        m_old = max_ref[:]
        m_new = jnp.maximum(m_old, cmax)
        f_old = jnp.where(jnp.isfinite(m_old), jnp.exp(m_old - m_new), 0.0)
        f_new = jnp.where(jnp.isfinite(cmax), jnp.exp(cmax - m_new), 0.0)
        max_ref[:] = m_new
        sum_ref[:] = sum_ref[:] * f_old + csum * f_new
        return ()

    jax.lax.fori_loop(c_lo, c_hi, body, (), unroll=False)


def _softmax_stats(alpha, dst, num_rows, interpret=False):
    """alpha: f32[E] (sorted by dst) -> (seg_max[num_rows], seg_sumexp[num_rows])."""
    e = alpha.shape[0]
    e_pad = _cdiv(e, _CS) * _CS
    n_blocks = _cdiv(num_rows, _R)
    n_pad = n_blocks * _R
    if e_pad != e:
        alpha = jnp.pad(alpha, (0, e_pad - e))
        dst = jnp.pad(dst, (0, e_pad - e), constant_values=num_rows)

    chunk_bounds = _block_chunk_bounds(dst, n_blocks, _CS)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((_R, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_R, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 1, _CS), jnp.float32),
            pltpu.VMEM((2, 1, _CS), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    seg_max, seg_sum = pl.pallas_call(
        _softmax_stats_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        ),
        interpret=interpret,
    )(chunk_bounds, alpha.reshape(1, -1).astype(jnp.float32),
      dst.reshape(1, -1).astype(jnp.int32))
    return seg_max[:num_rows, 0], seg_sum[:num_rows, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def segment_softmax_pallas(alpha, dst, num_rows, interpret=False):
    """Fused per-destination softmax over sorted edges: one online-softmax
    Pallas pass for (max, sum) stats + cheap XLA gathers.  Replaces the
    3-scatter XLA `segment_softmax` on TPU (10x on GAT-sized edge lists).
    alpha: f32[E]; padding edges (dst == num_rows) produce finite garbage
    that downstream out-of-bounds scatters drop (same contract as the XLA
    path).  PyG parity: denominator carries the +1e-16 guard."""
    att, _ = _softmax_fwd_impl(alpha, dst, num_rows, interpret)
    return att


def _softmax_fwd_impl(alpha, dst, num_rows, interpret):
    seg_max, seg_sum = _softmax_stats(alpha, dst, num_rows, interpret)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    # both per-edge stats ride ONE 2-column broadcast kernel pass (XLA's
    # narrow gather lowers to a scalar loop on TPU)
    stats = jax.lax.stop_gradient(jnp.stack([seg_max, seg_sum], axis=1))
    stats_e = sorted_broadcast_pallas(stats, dst, num_rows, interpret)
    expd = jnp.exp(alpha - stats_e[:, 0])
    # padding edges (dst == num_rows) read the zero stats row; force their
    # att to 0 so no exp overflow / grad leakage can ever reach real nodes
    att = jnp.where(dst < num_rows, expd / (stats_e[:, 1] + 1e-16), 0.0)
    return att, (att, dst)


def _softmax_fwd(alpha, dst, num_rows, interpret):
    att, res = _softmax_fwd_impl(alpha, dst, num_rows, interpret)
    return att, res


def _softmax_bwd(num_rows, interpret, res, g):
    from . import config as _cfg

    att, dst = res
    # d alpha_e = att_e * (g_e - sum_seg(att * g)); the segment-sum rides
    # the MXU kernel (in the configured gradient transport — bf16 halves
    # the DMA bytes and runs 1 MXU pass) and the per-edge readback rides
    # the localized-gather kernel (not XLA's serial-loop gather).
    s = sorted_segment_sum_pallas(
        (att * g)[:, None], dst, num_rows, interpret, _cfg.SEGSUM_TRANSPORT
    )[:, 0]
    s_e = sorted_broadcast_pallas(s, dst, num_rows, interpret, False)
    return (att * (g - s_e), None)


segment_softmax_pallas.defvjp(_softmax_fwd, _softmax_bwd)


# ------------------------------------------------------------------
# Localized gather: out[e] = v[idx[e]] for *window-local* idx — every edge
# chunk's indices span few 128-row windows.  True for dst under either edge
# order graph.py emits (fully sorted, or (dst//128, src) block order) and
# for src under block order.
#
# XLA lowers 1-D / narrow-row gathers to a serial scalar loop on TPU
# (~1.4 GB/s measured on the GAT attention path — tools/profile_step.py);
# this kernel instead streams the edge list in chunks and resolves each
# chunk against its row windows with an exact one-hot MXU matmul (each edge
# matches exactly one row, so no accumulation rounding).  Correct for ANY
# index array (windows come from per-chunk min/max) — locality only buys
# speed.  The backward of a gather is a segment-sum keyed by idx.

_BR = 128  # v-row window (lane-aligned so dynamic window DMAs are legal)


def _edge_chunk(k_pad):
    """Gather edge-chunk size.  Measured on v5e at bench scale (662k edges,
    15k rows): 2048 beats 1024/4096/8192 for K=8 f32 and K=24 bf16 alike —
    larger chunks widen each chunk's window span, and every window matmuls
    the WHOLE chunk, so flops grow superlinearly past the locality limit."""
    return 2048


def _scatter_chunk(k_pad):
    """Scatter edge-chunk size: 1024 measured fastest (same sweep) — the
    read-modify-write of the VMEM accumulator serializes against the next
    window's matmul, so smaller chunks pipeline better."""
    return 1024


def _make_broadcast_kernel(chunk, k_pad, v_dtype, exact):
    # One-hot row selection is exact in any dtype (one 1.0 x v product per
    # output element, f32 accumulate); bf16 tables ride the native 1-pass
    # MXU matmul.  f32 tables need HIGHEST (bf16x6) for bit-faithful f32
    # products; gradient readbacks pass exact=False and take the 2x-faster
    # bf16x3 DEFAULT (~2^-21 relative error — far below SGD noise).
    precision = (
        jax.lax.Precision.DEFAULT
        if (v_dtype == jnp.bfloat16 or not exact)
        else jax.lax.Precision.HIGHEST
    )

    def _kernel(meta_ref, v_hbm, dst_ref, out_ref, v_buf, sems):
        j = pl.program_id(0)
        row0_blk = meta_ref[0, j]  # window start in _BR units (alignment proof)
        n_win = meta_ref[1, j]

        col_dst = dst_ref[:]  # [1, C] (auto-pipelined block)

        # double-buffered window DMAs: narrow-K windows are tiny (4-32KB),
        # so without prefetch the loop is DMA-latency-bound
        def start_dma(w, slot):
            pltpu.make_async_copy(
                v_hbm.at[:, pl.ds((row0_blk + w) * _BR, _BR)],
                v_buf.at[slot],
                sems.at[slot],
            ).start()

        def wait_dma(w, slot):
            pltpu.make_async_copy(
                v_hbm.at[:, pl.ds((row0_blk + w) * _BR, _BR)],
                v_buf.at[slot],
                sems.at[slot],
            ).wait()

        start_dma(0, 0)

        def body(w, acc):
            slot = jax.lax.rem(w, 2)

            @pl.when(w + 1 < n_win)
            def _():
                start_dma(w + 1, jax.lax.rem(w + 1, 2))

            wait_dma(w, slot)
            start = (row0_blk + w) * _BR
            row_ids = (
                jax.lax.broadcasted_iota(jnp.int32, (_BR, chunk), dimension=0)
                + start
            )
            oh = (col_dst == row_ids).astype(v_dtype)  # [R, C]
            # [K, R] @ [R, C]: one nonzero per column -> exact row select
            return acc + jax.lax.dot_general(
                v_buf[slot],
                oh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )

        out_ref[:] = jax.lax.fori_loop(
            0, n_win, body, jnp.zeros((k_pad, chunk), jnp.float32)
        ).astype(v_dtype)

    return _kernel


def _chunk_window_meta(idx, n_chunks, chunk, num_rows):
    """Per-chunk [first_window, n_windows] over 128-row windows of v.

    Padding lanes (idx == num_rows) are excluded from BOTH ends of the span:
    sentinel rows need no window (an uncovered id simply never matches a
    one-hot row, contributing exactly 0), so a tail chunk mixing real edges
    with sentinel padding spans only its real rows.  All-padding chunks
    degenerate to one window at the sentinel row (zero pad region)."""
    by_chunk = idx.reshape(n_chunks, chunk)
    real = by_chunk < num_rows
    lo = jnp.min(jnp.where(real, by_chunk, num_rows), axis=1)
    hi = jnp.max(jnp.where(real, by_chunk, lo[:, None]), axis=1)
    row0_blk = lo // _BR
    n_win = _cdiv(hi + 1 - row0_blk * _BR, _BR)
    # transposed [2, n_chunks]: SMEM pads each row to 128 lanes, so the
    # [n_chunks, 2] layout would cost 512 B/chunk and overflow at >2048
    # chunks (see _block_chunk_bounds)
    return jnp.stack([row0_blk, n_win], axis=0).astype(jnp.int32)


def _broadcast_forward(v, dst, num_rows, interpret, exact=True,
                       out_transposed=False, v_t=None, k=None):
    """v[dst] via the localized one-hot gather kernel.

    v: [N] / [N, K] row-major table — OR pass the pre-built column-major
    padded table via ``v_t`` ([k_pad, n_pad], e.g. flash_gat.pack_gat_table)
    with its true column count ``k`` to skip the transpose prep.
    out_transposed=True returns the kernel's native [K, E] layout (the
    kernel emits feature-major blocks; the default row-major return pays an
    [E, K] transpose — callers doing column-major glue should not)."""
    squeeze = False
    if v_t is None:
        squeeze = v.ndim == 1
        if squeeze:
            v = v[:, None]
        n, k = v.shape
        v_dtype = jnp.bfloat16 if v.dtype == jnp.bfloat16 else jnp.float32
    else:
        assert k is not None, "v_t requires the true column count k"
        v_dtype = (
            jnp.bfloat16 if v_t.dtype == jnp.bfloat16 else jnp.float32
        )
        n = num_rows
    k_pad = max(8, _cdiv(k, 8) * 8)
    assert k <= 128, "localized gather supports K <= 128 columns"
    e = dst.shape[0]
    bc = _edge_chunk(k_pad)
    e_pad = _cdiv(e, bc) * bc
    n_chunks = e_pad // bc
    # v windows may start at any _BR-aligned row <= last real dst and read
    # _BR rows; pad so every window stays in bounds
    n_pad = _cdiv(num_rows + 1, _BR) * _BR + _BR

    if v_t is None:
        v_t = jnp.zeros((k_pad, n_pad), v_dtype).at[:k, :n].set(
            v.astype(v_dtype).T
        )
    else:
        assert v_t.shape == (k_pad, n_pad), (v_t.shape, (k_pad, n_pad))
        v_t = v_t.astype(v_dtype)
    if e_pad != e:
        dst = jnp.pad(dst, (0, e_pad - e), constant_values=num_rows)
    dst = dst.astype(jnp.int32)

    meta = _chunk_window_meta(dst, n_chunks, bc, num_rows)

    itemsize = 2 if v_dtype == jnp.bfloat16 else 4
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # v_t stays in HBM
            pl.BlockSpec((1, bc), lambda j, *_: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (k_pad, bc), lambda j, *_: (0, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, k_pad, _BR), v_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _make_broadcast_kernel(bc, k_pad, v_dtype, exact),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k_pad, e_pad), v_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * _BR * e_pad * k_pad,
            bytes_accessed=e_pad * (4 + 4 * k_pad) + n_pad * itemsize * k_pad,
            transcendentals=0,
        ),
    )(meta, v_t, dst.reshape(1, -1))
    if out_transposed:
        return out[:k, :e]  # [K, E] — the kernel's native layout
    out = out[:k, :e].T  # [E, K]
    return out[:, 0] if squeeze else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def sorted_broadcast_pallas(v, dst, num_rows, interpret=False, exact=True):
    """out[e] = v[dst[e]] for window-local `dst` (any order is CORRECT;
    locality is the speed contract); v: [N] or [N, K<=128], f32 or bf16.
    Padding edges (dst == num_rows) read the zero pad row.  Backward is a
    segment-sum keyed by dst (MXU kernel when dst is block-monotone).
    exact=False allows bf16x3 products on f32 tables (gradient paths)."""
    return _broadcast_forward(v, dst, num_rows, interpret, exact)


def _bc_fwd(v, dst, num_rows, interpret, exact):
    return (
        _broadcast_forward(v, dst, num_rows, interpret, exact),
        (dst, v.ndim, jnp.zeros((0,), v.dtype)),
    )


def _bc_bwd(num_rows, interpret, exact, res, g):
    dst, v_ndim, dtype_probe = res
    g2 = g[:, None] if v_ndim == 1 else g
    gv = segment_sum_auto(g2, dst, num_rows)
    # segment accumulation is f32; the cotangent must match the primal
    # dtype (bf16 tables under the bf16 message-transport config)
    gv = gv.astype(dtype_probe.dtype)
    return (gv[:, 0] if v_ndim == 1 else gv, None)


sorted_broadcast_pallas.defvjp(_bc_fwd, _bc_bwd)


# ------------------------------------------------------------------
# Localized scatter-add: out[i] = sum_{e: idx[e]==i} ct[e] with the WHOLE
# output table resident in VMEM (node tables here are a few MB — 15k rows).
#
# This is the transpose of the localized gather and replaces the backward
# path `segment_sum(ct[perm], idx_sorted)` whose E->E permutation gather was
# the single hottest op of the fused PEAGAT step (5.3ms of a 17.8ms step,
# 8.5 GB/s — tools/profile_step.py).  Grid walks edge chunks sequentially
# (TPU grid semantics), each chunk one-hot-matmuls into its idx windows of
# the VMEM accumulator; no permutation, no HBM round-trips.  Correct for
# ANY idx array; the (dst//128, src) block order makes chunks window-local.



def _make_scatter_kernel(chunk, k_pad, ct_dtype, wins_per_tile):
    # Scatter-add only serves gradient accumulation (gather backward), so
    # f32 cotangents take the bf16x3 DEFAULT (~2^-21 relative per product,
    # f32 accumulate) — half the MXU passes of HIGHEST.
    #
    # Grid is (tiles, chunks): the accumulator block is ONE row-tile of the
    # node table (whole table when it fits one VMEM tile); pass p clamps
    # each chunk's window span to tile p's rows, so chunks whose span
    # misses the tile cost only their block DMA.  Edge chunks are src-local
    # under the (dst//128, src) block order, so most (tile, chunk) pairs
    # skip entirely.
    precision = jax.lax.Precision.DEFAULT

    def _kernel(meta_ref, ct_ref, idx_ref, out_ref):
        p = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        win0 = meta_ref[0, j]
        w_lo = jnp.maximum(win0, p * wins_per_tile)
        w_hi = jnp.minimum(win0 + meta_ref[1, j], (p + 1) * wins_per_tile)
        col_idx = idx_ref[:]  # [1, C]
        row_off = p * (wins_per_tile * _BR)

        def body(w, _):
            start = w * _BR
            row_ids = (
                jax.lax.broadcasted_iota(jnp.int32, (_BR, chunk), dimension=0)
                + start
            )
            oh = (col_idx == row_ids).astype(ct_dtype)  # [R, C]
            # [R, C] . [C, K]: sum of this chunk's messages into window rows
            contrib = jax.lax.dot_general(
                oh,
                ct_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            out_ref[pl.ds(start - row_off, _BR), :] += contrib
            return ()

        jax.lax.fori_loop(w_lo, w_hi, body, (), unroll=False)

    return _kernel


def localized_scatter_add_pallas(ct, idx, num_rows, interpret=False,
                                 transport="f32", ct_t=None):
    """Segment-sum `ct[E, K]` by `idx[E]` into `[num_rows, K]` with a
    VMEM-resident accumulator; `idx` needs NO ordering (window metadata is
    per-chunk min/max — locality only buys speed).  Padding edges must carry
    zero ct (the same invariant the perm-gather backward relied on).
    Callers holding the cotangent column-major already (the flash backward
    glue) pass ``ct_t`` [K, E] instead of ct and skip the transpose prep.
    The accumulator is row-TILED: tables larger than one VMEM-budget tile
    (ops.config.VMEM_TABLE_BUDGET) split into `scatter_num_tiles` row tiles,
    and the kernel makes one pass over all edge chunks per tile (each pass
    re-reads the cotangent blocks, clamping every chunk's window to the
    tile).  Gate via `scatter_fits_vmem`, which caps the tile count at
    ops.config.MAX_SCATTER_TILES before the permuted sorted segment-sum
    fallback wins."""
    ct_dtype = jnp.bfloat16 if transport == "bf16" else jnp.float32
    if ct_t is not None:
        k, e = ct_t.shape
        ct_t = ct_t.astype(ct_dtype)
    else:
        e, k = ct.shape
        ct_t = ct.astype(ct_dtype).T  # [K, E]
    k_pad = max(8, _cdiv(k, 8) * 8)
    sc = _scatter_chunk(k_pad)
    e_pad = _cdiv(e, sc) * sc
    n_chunks = e_pad // sc
    n_pad = _cdiv(num_rows + 1, _BR) * _BR
    n_tiles = scatter_num_tiles(num_rows, k)
    tile_rows = _cdiv(n_pad, n_tiles * _BR) * _BR

    if k_pad != k or e_pad != e:
        ct_t = jnp.pad(ct_t, ((0, k_pad - k), (0, e_pad - e)))
    if e_pad != e:
        idx = jnp.pad(idx, (0, e_pad - e), constant_values=num_rows)
    idx = idx.astype(jnp.int32)

    meta = _chunk_window_meta(idx, n_chunks, sc, num_rows)

    itemsize = 2 if ct_dtype == jnp.bfloat16 else 4
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((k_pad, sc), lambda p, j, *_: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sc), lambda p, j, *_: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_rows, k_pad), lambda p, j, *_: (p, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _make_scatter_kernel(sc, k_pad, ct_dtype, tile_rows // _BR),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile_rows, k_pad), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * _BR * e_pad * k_pad,
            bytes_accessed=n_tiles * e_pad * (4 + itemsize * k_pad)
            + n_tiles * tile_rows * 4 * k_pad,
            transcendentals=0,
        ),
    )(meta, ct_t, idx.reshape(1, -1))
    return out[:num_rows, :k]


def scatter_num_tiles(num_rows, k, budget_bytes=None):
    """Row tiles needed so each scatter accumulator tile fits the per-tile
    VMEM budget (ops.config.VMEM_TABLE_BUDGET; ~16 MiB VMEM/core on v5e).

    The budget must count PHYSICAL bytes: VMEM stores f32 in (8, 128) tiles,
    so every accumulator row occupies ceil(k_pad/128)*128 lanes regardless
    of the logical width (a [69k, 24] accumulator really costs 35 MB, not
    6.6 MB — measured as a Mosaic scoped-vmem OOM at ML-25M scale)."""
    from . import config as _cfg

    if budget_bytes is None:
        budget_bytes = _cfg.VMEM_TABLE_BUDGET
    k_pad = max(8, _cdiv(k, 8) * 8)
    k_lanes = _cdiv(k_pad, 128) * 128  # physical lanes per row (T(8,128))
    n_pad = _cdiv(num_rows + 1, _BR) * _BR
    phys = n_pad * k_lanes * 4
    # one tile = one constant-index output block, fetched once (no double
    # buffer) — a larger single-tile limit applies (config rationale)
    if phys <= _cfg.SCATTER_SINGLE_TILE_LIMIT:
        return 1
    return max(2, _cdiv(phys, budget_bytes))


def scatter_fits_vmem(num_rows, k, budget_bytes=None):
    """Whether the tiled scatter kernel is worth dispatching: the table
    splits into at most MAX_SCATTER_TILES row tiles (each pass over the
    edges re-reads the cotangent blocks; beyond the cap the permuted
    sorted segment-sum fallback wins)."""
    from . import config as _cfg

    return scatter_num_tiles(num_rows, k, budget_bytes) <= _cfg.MAX_SCATTER_TILES


def sorted_broadcast_auto(v, dst, num_rows, indices_are_sorted=True, use_pallas=None,
                          exact=True):
    """Dispatch v[dst] for window-local dst: Pallas localized-gather kernel
    on TPU (where XLA's serial-loop gather pathology bites), XLA gather
    elsewhere."""
    from . import config as _cfg

    k = 1 if v.ndim == 1 else v.shape[1]
    use_pallas = _cfg.resolve(
        use_pallas,
        _on_tpu() and indices_are_sorted and k <= 128 and dst.shape[0] >= 65536,
    ) and (indices_are_sorted and k <= 128)
    if use_pallas:
        return sorted_broadcast_pallas(v, dst, num_rows, False, exact)
    safe = jnp.minimum(dst, num_rows - 1)
    pad_zero = (dst < num_rows)
    out = v[safe]
    if v.ndim == 1:
        return jnp.where(pad_zero, out, 0.0)
    return jnp.where(pad_zero[:, None], out, 0.0)


def segment_softmax_auto(alpha, dst, num_rows, indices_are_sorted=True, use_pallas=None):
    """Dispatch per-head segment softmax: Pallas fused kernel on TPU for
    large edge lists, XLA scatter path elsewhere.  alpha: [E] or [E, H]."""
    from . import config as _cfg

    use_pallas = _cfg.resolve(
        use_pallas, _on_tpu() and indices_are_sorted and alpha.shape[0] >= 65536
    ) and indices_are_sorted
    if not use_pallas:
        from .segment import segment_softmax

        # block order is not full sortedness — never claim it to XLA
        return segment_softmax(alpha, dst, num_rows, indices_are_sorted=False)
    if alpha.ndim == 1:
        return segment_softmax_pallas(alpha, dst, num_rows)
    heads = [
        segment_softmax_pallas(alpha[:, h], dst, num_rows)
        for h in range(alpha.shape[1])
    ]
    return jnp.stack(heads, axis=1)


def _on_tpu():
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def segment_sum_auto(msgs, dst, num_rows, indices_are_sorted=True, use_pallas=None):
    """Dispatch segment-sum: Pallas MXU kernel on TPU, XLA scatter elsewhere.

    `use_pallas` forces the choice (used by bench.py to measure both paths).
    """
    from . import config as _cfg

    # Measured on TPU v5e (tools/bench_segsum.py): the MXU kernel wins
    # from ~100k edges (1.55x at 100k, 3.6x at 2M); below that XLA
    # scatter's lower launch overhead wins.
    use_pallas = _cfg.resolve(
        use_pallas,
        _on_tpu()
        and indices_are_sorted
        and msgs.ndim == 2
        and msgs.shape[0] >= 65536,
    ) and (indices_are_sorted and msgs.ndim == 2)
    if use_pallas:
        return sorted_segment_sum_pallas(
            msgs, dst, num_rows, False, _cfg.SEGSUM_TRANSPORT
        )
    if msgs.dtype == jnp.bfloat16:
        # XLA fallback accumulates in the message dtype; keep f32 accumulation
        # (the Pallas path always accumulates f32)
        msgs = msgs.astype(jnp.float32)
    # `indices_are_sorted` here means "block-monotone" (kernel eligibility);
    # that is weaker than XLA's sorted contract, so never claim it to XLA.
    return jax.ops.segment_sum(msgs, dst, num_segments=num_rows)
