"""Fused flash-style GAT attention megakernels (single head; callers loop
heads — models/pea._fused_gat_step).

Replaces the five-op edge pipeline of models/pea._fused_gat_step —
  packed src gather -> dst logit gather -> softmax stats -> stats
  broadcast -> weighted segment-sum
— with ONE Pallas pass per direction that never materializes an [E, *]
intermediate in HBM.  This is the graph analog of flash attention: the grid
walks 128-row destination blocks, each block streams its edge chunks,
gathers the packed ``[z | a_src]`` source rows with one-hot MXU matmuls
(exact row selection, ops/pallas_segment.py), forms the per-edge logits,
and maintains an online softmax.

The reference computes the same math as PyG 1.5 GATConv's
scatter-softmax + scatter-add (torch-scatter CUDA; SURVEY.md §2.4) —
semantics per graph_recsys_benchmark/models/peagat.py:14-21 and the +1e-16
denominator guard of PyG softmax.

Layout: the packed table travels COLUMN-major (``packed_t [k_pad, N_pad]``,
rows 0..kz-1 = z features, row kz = a_src) end to end.  The producing
einsum emits that layout natively, the kernels consume it, and the backward
megakernel's scatter accumulates the cotangent in the same layout — no
[N, k] <-> [k, N] transpose op anywhere on the hot path (a measured
~0.11 ms/step each at bench scale).  Use ``pack_gat_table`` to build it.

Backward is ONE megakernel (same dst-block grid): gathers the per-row
``[g | g·out | m | s | a_dst]`` table through the one-hot dst matrix (free —
it is a block input), recomputes ``att`` flash-style from the re-gathered
sources, forms the per-edge cotangents in [1, chunk] registers, scatter-adds
``[att·g | dpre]`` into a VMEM-resident ``dpacked_t`` accumulator through
the src windows, and segment-reduces ``da_dst`` block-locally.  It replaces
four separate kernel launches (dst broadcast, src re-gather, localized
scatter, 1-col segment-sum) plus all their [E, *] HBM glue.

Edge-order contract: ``dst`` must be block-monotone (``dst // 128``
non-decreasing — true for graph.py's (dst//128, src) block order and for
fully dst-sorted lists); ``src`` may be anything (window metadata is
per-chunk min/max over REAL lanes — locality only buys speed).  Padding
edges carry ``dst == num_rows`` (src is arbitrary; in blocks that contain
the in-table pad row ``num_rows`` their contributions land there and are
sliced off).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_segment import (
    _BR,
    _R,
    _block_chunk_bounds,
    _cdiv,
    _chunk_window_meta,
    _on_tpu,
)

# Edge-chunk size: the fused kernel pays the gather's window matmuls, the
# one-hot build and a handful of [1, C] per-edge ops per chunk.  1024
# measured fastest on v5e at bench scale (512/2048/4096 all slower).
_FC = 1024
def _fc_cm(k_pad):
    """Chunk-major forward chunk size.  The grid walks edge chunks, so the
    size trades per-chunk fixed cost against window-span growth (wider
    chunks touch more src windows, and every window matmuls the whole
    chunk).  Measured on v5e at bench scale: k_pad=72 fastest at 1024
    (0.44 vs 0.53/0.67 ms at 2048/4096), k_pad=24 at 2048 (0.66 vs
    0.72/0.74) — wide tables saturate on window matmul flops sooner."""
    return 2048 if k_pad <= 32 else 1024
# Backward chunk: the bwd kernel walks each chunk's windows twice (gather +
# scatter) and adds two stat matmuls, so larger chunks amortize better.
_FC_BWD = 1024

# Packed tables / cotangent accumulators up to this size stay VMEM-resident
# for the whole grid (v5e VMEM ~16 MiB/core; leave room for blocks+buffers).
_TABLE_VMEM_BYTES = 6 * 1024 * 1024


def _layout(num_rows, kz):
    k = kz + 1
    k_pad = max(8, _cdiv(k, 8) * 8)
    # src windows may start at any _BR-aligned row <= the sentinel and read
    # _BR rows; pad the packed table so every window stays in bounds
    n_src_pad = _cdiv(num_rows + 1, _BR) * _BR + _BR
    return k, k_pad, n_src_pad


def pack_gat_table(z_t, a_src, num_rows, t_dtype):
    """Build the column-major packed table ``[k_pad, n_src_pad]``.

    z_t: [kz, N] (any float dtype) — feature-major z; a_src: [N] f32.
    Rows 0..kz-1 = z (cast to t_dtype), row kz = a_src, rest zero."""
    kz, n = z_t.shape
    _, k_pad, n_src_pad = _layout(num_rows, kz)
    table = jnp.concatenate(
        [z_t.astype(t_dtype), a_src[None].astype(t_dtype)], axis=0
    )
    return jnp.pad(table, ((0, k_pad - kz - 1), (0, n_src_pad - n)))


def _ids_pipeline(src_hbm, dst_hbm, sid_buf, did_buf, sem_ids, chunk):
    def start_ids(c, slot):
        pltpu.make_async_copy(
            src_hbm.at[:, pl.ds(c * chunk, chunk)], sid_buf.at[slot],
            sem_ids.at[slot, 0],
        ).start()
        pltpu.make_async_copy(
            dst_hbm.at[:, pl.ds(c * chunk, chunk)], did_buf.at[slot],
            sem_ids.at[slot, 1],
        ).start()

    def wait_ids(c, slot):
        pltpu.make_async_copy(
            src_hbm.at[:, pl.ds(c * chunk, chunk)], sid_buf.at[slot],
            sem_ids.at[slot, 0],
        ).wait()
        pltpu.make_async_copy(
            dst_hbm.at[:, pl.ds(c * chunk, chunk)], did_buf.at[slot],
            sem_ids.at[slot, 1],
        ).wait()

    return start_ids, wait_ids


def _make_flash_kernel(chunk, k_pad, kz, t_dtype, negative_slope,
                       table_in_vmem, bound_shift=False):
    """Forward kernel.  Strategy (v2): keep ALL per-edge math [1, chunk].

    The v1 kernel formed logits/exp/softmax terms as [128, chunk] blocks
    (one row per candidate dst) — 128x redundant VPU work.  v2 computes
    per-edge quantities in [1, chunk] registers and moves values between
    row-space [128, ·] and edge-space [1, ·] with the SAME one-hot dst
    matrix used for the final aggregation:

      a_dst_e, m_e  = (col [R,1])ᵀ · OH_dst      (row -> edge broadcast)
      out | s      += OH_dst · [p·z | p]ᵀ        (edge -> row reduce)

    leaving 4 full [128, chunk] VPU passes per chunk (compare, cast,
    masked-val select, row-max) instead of ~10 including a [128, chunk]
    exp.  The online row-max `m` is stored pre-rounded to the transport
    dtype so the matmul-gathered m_e is bitwise the stored value (the
    softmax shift cancels exactly between numerator and denominator, so a
    rounded shift changes nothing but fp noise; in f32 transport it is
    exact).  s rides as column `kz` of the out accumulator (z rows above kz
    are zero), so edge->row reduction is ONE matmul per chunk.

    Strategy (v3, ``bound_shift``): the shift is the PRECOMPUTED per-row
    bound m̂ (ops/config.FLASH_SOFTMAX_SHIFT) riding as column 1 of the
    a_dst block, gathered edge-wise in the SAME [2, C] matmul as a_dst.
    Since m̂ ≥ every logit of its row, exp(act − m̂) ∈ (0, 1] directly —
    no running max, no masked [R, C] select/row-max, no m regather, no
    accumulator rescale.  The exp argument is clamped at +60 only to keep
    edges whose dst lies OUTSIDE this block (chunks straddling block
    boundaries gather m̂_e = 0 for them) from producing inf·0 = NaN before
    the one-hot matmul multiplies them by zero; real edges sit at ≤ ~0.01.
    """
    gather_precision = (
        jax.lax.Precision.DEFAULT
        if t_dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    acc_precision = gather_precision

    def _kernel_bound(cb_ref, wm_ref, adst_ref, packed_ref, src_hbm, dst_hbm,
                      out_ref, s_ref, *scratch):
        if table_in_vmem:
            sid_buf, did_buf, sem_ids = scratch
        else:
            win_buf, sid_buf, did_buf, sem_win, sem_ids = scratch
        i = pl.program_id(0)
        c_lo = cb_ref[0, i]
        c_hi = cb_ref[1, i]
        row0 = i * _R

        out_ref[:] = jnp.zeros_like(out_ref)

        drow_ids = (
            jax.lax.broadcasted_iota(jnp.int32, (_R, chunk), dimension=0) + row0
        )
        krow_is_s = (
            jax.lax.broadcasted_iota(jnp.int32, (k_pad, chunk), dimension=0)
            == kz
        )
        adst2_t = adst_ref[:, 0:2].astype(t_dtype)  # [R, 2]: [a_dst | m̂]

        start_ids, wait_ids = _ids_pipeline(
            src_hbm, dst_hbm, sid_buf, did_buf, sem_ids, chunk
        )

        @pl.when(c_lo < c_hi)
        def _():
            start_ids(c_lo, 0)

        def body(c, _):
            slot = jax.lax.rem(c - c_lo, 2)

            @pl.when(c + 1 < c_hi)
            def _():
                start_ids(c + 1, jax.lax.rem(c + 1 - c_lo, 2))

            wait_ids(c, slot)
            src_ids = sid_buf[slot]  # [1, C]
            dst_ids = did_buf[slot]  # [1, C]

            win0 = wm_ref[0, c]
            n_win = wm_ref[1, c]

            if table_in_vmem:
                def wbody(w, acc):
                    start = (win0 + w) * _BR
                    srow_ids = (
                        jax.lax.broadcasted_iota(
                            jnp.int32, (_BR, chunk), dimension=0
                        )
                        + start
                    )
                    oh = (src_ids == srow_ids).astype(t_dtype)  # [R, C]
                    return acc + jax.lax.dot_general(
                        packed_ref[:, pl.ds(start, _BR)],
                        oh,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=gather_precision,
                    )
            else:
                def start_win(w, wslot):
                    pltpu.make_async_copy(
                        packed_ref.at[:, pl.ds((win0 + w) * _BR, _BR)],
                        win_buf.at[wslot],
                        sem_win.at[wslot],
                    ).start()

                def wait_win(w, wslot):
                    pltpu.make_async_copy(
                        packed_ref.at[:, pl.ds((win0 + w) * _BR, _BR)],
                        win_buf.at[wslot],
                        sem_win.at[wslot],
                    ).wait()

                start_win(0, 0)

                def wbody(w, acc):
                    wslot = jax.lax.rem(w, 2)

                    @pl.when(w + 1 < n_win)
                    def _():
                        start_win(w + 1, jax.lax.rem(w + 1, 2))

                    wait_win(w, wslot)
                    start = (win0 + w) * _BR
                    srow_ids = (
                        jax.lax.broadcasted_iota(
                            jnp.int32, (_BR, chunk), dimension=0
                        )
                        + start
                    )
                    oh = (src_ids == srow_ids).astype(t_dtype)  # [R, C]
                    return acc + jax.lax.dot_general(
                        win_buf[wslot],
                        oh,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=gather_precision,
                    )

            zacc = jax.lax.fori_loop(
                0, n_win, wbody, jnp.zeros((k_pad, chunk), jnp.float32),
                unroll=False,
            )  # [K_pad, C]: rows [:kz] = z_e, row kz = a_src_e

            oh = (dst_ids == drow_ids).astype(t_dtype)  # [R, C]

            # row -> edge: [a_dst_e | m̂_e] in ONE matmul (exact: one
            # nonzero per column)
            a_src_e = zacc[kz : kz + 1, :]  # [1, C] f32
            A = jax.lax.dot_general(
                adst2_t, oh,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=gather_precision,
            )  # [2, C]
            pre = A[0:1, :] + a_src_e  # [1, C]
            act = jnp.where(pre > 0, pre, negative_slope * pre)
            # m̂ ≥ act for every real edge, so p ≤ ~1 (t_dtype rounding of
            # m̂ can undershoot by ~2^-9 rel); the clamp only guards
            # straddle edges whose m̂_e gathered 0 (their column of `oh` is
            # zero, but inf·0 would be NaN)
            p = jnp.exp(jnp.minimum(act - A[1:2, :], 60.0))  # [1, C]
            # [p·z | p]: s rides as row kz (z rows above kz are zero)
            wzp = jnp.where(krow_is_s, p, zacc * p).astype(t_dtype)
            out_ref[:] += jax.lax.dot_general(
                oh, wzp,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=acc_precision,
            )  # [R, k_pad]
            return ()

        jax.lax.fori_loop(c_lo, c_hi, body, (), unroll=False)

        s_fin = out_ref[:, kz : kz + 1]
        s_ref[:] = s_fin
        out_ref[:] = out_ref[:] / (s_fin + 1e-16)

    if bound_shift:
        return _kernel_bound

    def _kernel(cb_ref, wm_ref, adst_ref, packed_ref, src_hbm, dst_hbm,
                out_ref, m_ref, s_ref, *scratch):
        if table_in_vmem:
            # packed_ref IS the whole [k_pad, n_src_pad] table, resident in
            # VMEM for the entire grid (constant index_map) — windows are
            # free dynamic slices, no DMA latency on the chunk critical path
            sid_buf, did_buf, sem_ids = scratch
        else:
            win_buf, sid_buf, did_buf, sem_win, sem_ids = scratch
        i = pl.program_id(0)
        c_lo = cb_ref[0, i]
        c_hi = cb_ref[1, i]
        row0 = i * _R

        out_ref[:] = jnp.zeros_like(out_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)

        drow_ids = (
            jax.lax.broadcasted_iota(jnp.int32, (_R, chunk), dimension=0) + row0
        )
        krow_is_s = (
            jax.lax.broadcasted_iota(jnp.int32, (k_pad, chunk), dimension=0)
            == kz
        )
        adst_t = adst_ref[:, 0:1].astype(t_dtype)  # [R, 1]

        start_ids, wait_ids = _ids_pipeline(
            src_hbm, dst_hbm, sid_buf, did_buf, sem_ids, chunk
        )

        @pl.when(c_lo < c_hi)
        def _():
            start_ids(c_lo, 0)

        def body(c, _):
            slot = jax.lax.rem(c - c_lo, 2)

            @pl.when(c + 1 < c_hi)
            def _():
                start_ids(c + 1, jax.lax.rem(c + 1 - c_lo, 2))

            wait_ids(c, slot)
            src_ids = sid_buf[slot]  # [1, C]
            dst_ids = did_buf[slot]  # [1, C]

            win0 = wm_ref[0, c]
            n_win = wm_ref[1, c]

            if table_in_vmem:
                def wbody(w, acc):
                    start = (win0 + w) * _BR
                    srow_ids = (
                        jax.lax.broadcasted_iota(
                            jnp.int32, (_BR, chunk), dimension=0
                        )
                        + start
                    )
                    oh = (src_ids == srow_ids).astype(t_dtype)  # [R, C]
                    return acc + jax.lax.dot_general(
                        packed_ref[:, pl.ds(start, _BR)],
                        oh,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=gather_precision,
                    )
            else:
                def start_win(w, wslot):
                    pltpu.make_async_copy(
                        packed_ref.at[:, pl.ds((win0 + w) * _BR, _BR)],
                        win_buf.at[wslot],
                        sem_win.at[wslot],
                    ).start()

                def wait_win(w, wslot):
                    pltpu.make_async_copy(
                        packed_ref.at[:, pl.ds((win0 + w) * _BR, _BR)],
                        win_buf.at[wslot],
                        sem_win.at[wslot],
                    ).wait()

                start_win(0, 0)

                def wbody(w, acc):
                    wslot = jax.lax.rem(w, 2)

                    @pl.when(w + 1 < n_win)
                    def _():
                        start_win(w + 1, jax.lax.rem(w + 1, 2))

                    wait_win(w, wslot)
                    start = (win0 + w) * _BR
                    srow_ids = (
                        jax.lax.broadcasted_iota(
                            jnp.int32, (_BR, chunk), dimension=0
                        )
                        + start
                    )
                    oh = (src_ids == srow_ids).astype(t_dtype)  # [R, C]
                    return acc + jax.lax.dot_general(
                        win_buf[wslot],
                        oh,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=gather_precision,
                    )

            zacc = jax.lax.fori_loop(
                0, n_win, wbody, jnp.zeros((k_pad, chunk), jnp.float32),
                unroll=False,
            )  # [K_pad, C]: rows [:kz] = z_e, row kz = a_src_e

            match = dst_ids == drow_ids  # [R, C]
            oh = match.astype(t_dtype)  # [R, C] — reused by all 3 matmuls

            # row -> edge: a_dst_e = a_dstᵀ · OH  (exact: one nonzero/col)
            a_src_e = zacc[kz : kz + 1, :]  # [1, C] f32
            a_dst_e = jax.lax.dot_general(
                adst_t, oh,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=gather_precision,
            )  # [1, C]
            pre = a_dst_e + a_src_e  # [1, C]
            act = jnp.where(pre > 0, pre, negative_slope * pre)

            # per-row running max (the only remaining [R, C] reduction)
            vals = jnp.where(match, act, -jnp.inf)
            cmax = jnp.max(vals, axis=1, keepdims=True)  # [R, 1]
            m_old = m_ref[:]
            # store pre-rounded so the t_dtype matmul gather below is exact
            m_new = (
                jnp.maximum(m_old, cmax).astype(t_dtype).astype(jnp.float32)
            )
            f_old = jnp.where(jnp.isfinite(m_old), jnp.exp(m_old - m_new), 0.0)
            m_ref[:] = m_new
            # rows with m == -inf have no matching edge in this chunk (else
            # cmax would be finite), so a 0 placeholder is never selected —
            # and it keeps -inf·0 = NaN out of the gather matmul
            m_g = jnp.where(jnp.isfinite(m_new), m_new, 0.0).astype(t_dtype)
            m_e = jax.lax.dot_general(
                m_g, oh,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=gather_precision,
            )  # [1, C]

            p = jnp.exp(act - m_e)  # [1, C]; sentinel edges -> p<=1, no row
            # [p·z | p]: s rides as row kz (z rows above kz are zero)
            wzp = jnp.where(krow_is_s, p, zacc * p).astype(t_dtype)
            out_ref[:] = out_ref[:] * f_old + jax.lax.dot_general(
                oh, wzp,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=acc_precision,
            )  # [R, k_pad]
            return ()

        jax.lax.fori_loop(c_lo, c_hi, body, (), unroll=False)

        s_fin = out_ref[:, kz : kz + 1]
        s_ref[:] = s_fin
        out_ref[:] = out_ref[:] / (s_fin + 1e-16)
        m_ref[:] = jnp.where(jnp.isfinite(m_ref[:]), m_ref[:], 0.0)

    return _kernel


def _make_flash_fwd_chunk_kernel(chunk, k_pad, kz, t_dtype, negative_slope):
    """Chunk-major forward kernel (bound-shift softmax only).

    The block-major kernel above parallelizes over 128-row dst blocks and
    serially walks each block's edge chunks with a hand-rolled id-DMA
    pipeline; boundary chunks are visited by BOTH adjacent blocks and every
    block pays its own zero-init + epilogue.  At bench scale the step is
    overhead-bound (the MXU is <10% busy), so this variant flips the grid:
    one grid step per EDGE chunk, with

      * src/dst ids as auto-pipelined block inputs (Mosaic double-buffers
        them across grid steps — no manual DMA, no wait on the critical
        path),
      * the packed source table AND the [n_pad, k_pad] output accumulator
        VMEM-resident for the whole grid (constant index maps),
      * the [a_dst | m̂] table column-major [8, n_pad] so dst-window slices
        are free,
      * per chunk: walk the chunk's src windows (gather matmuls, same math
        as the block-major kernel), gather [a_dst|m̂] through the chunk's
        1-2 dst windows, form p = exp(act − m̂) in [1, C] registers, and
        scatter-add [p·z | p] into the accumulator through the SAME dst
        one-hots (dst is block-monotone, so a chunk spans very few dst
        windows and every edge is visited exactly once).

    The s column (index kz) accumulates in-table exactly like the
    block-major kernel; normalization happens outside (one [n_pad, k_pad]
    XLA op) because the accumulator is shared across the whole grid.
    Sentinel edges (dst == num_rows) land in accumulator row num_rows when
    a window covers it and are sliced off by the caller."""
    gather_precision = (
        jax.lax.Precision.DEFAULT
        if t_dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )

    def _kernel(swm_ref, dwm_ref, adst_ref, packed_ref, sid_ref, did_ref,
                out_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        src_ids = sid_ref[:]  # [1, C]
        dst_ids = did_ref[:]  # [1, C]

        krow_is_s = (
            jax.lax.broadcasted_iota(jnp.int32, (k_pad, chunk), dimension=0)
            == kz
        )
        # shared window-row base for the one-hot compares
        row_base = jax.lax.broadcasted_iota(jnp.int32, (_BR, chunk),
                                            dimension=0)

        # ---- src gather: z_e | a_src_e through the chunk's src windows
        s_win0 = swm_ref[0, j]
        s_nwin = swm_ref[1, j]

        def sbody(w, acc):
            start = (s_win0 + w) * _BR
            oh = (src_ids == row_base + start).astype(t_dtype)  # [R, C]
            return acc + jax.lax.dot_general(
                packed_ref[:, pl.ds(start, _BR)],
                oh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=gather_precision,
            )

        zacc = jax.lax.fori_loop(
            0, s_nwin, sbody, jnp.zeros((k_pad, chunk), jnp.float32),
            unroll=False,
        )  # [k_pad, C]: rows [:kz] = z_e, row kz = a_src_e
        a_src_e = zacc[kz : kz + 1, :]  # [1, C]

        # ---- dst windows: ONE walk — gather [a_dst | m̂], form this
        # window's p (edges whose dst lies outside the window read a zero
        # stat row and produce garbage p, but the SAME one-hot zeroes
        # their scatter contribution), scatter [p·z | p]
        d_win0 = dwm_ref[0, j]
        d_nwin = dwm_ref[1, j]

        def dbody(w, _):
            start = (d_win0 + w) * _BR
            oh = (dst_ids == row_base + start).astype(t_dtype)  # [R, C]
            A = jax.lax.dot_general(
                adst_ref[:, pl.ds(start, _BR)],
                oh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=gather_precision,
            )  # [8, C]: row 0 = a_dst_e, row 1 = m̂_e (this window only)
            pre = A[0:1, :] + a_src_e  # [1, C]
            act = jnp.where(pre > 0, pre, negative_slope * pre)
            # clamp contract: out-of-window / sentinel edges gather m̂ = 0
            # and need the +60 clamp to stay finite before the one-hot
            # multiplies them by zero
            p = jnp.exp(jnp.minimum(act - A[1:2, :], 60.0))  # [1, C]
            wzp = jnp.where(krow_is_s, p, zacc * p).astype(t_dtype)
            out_ref[pl.ds(start, _BR), :] += jax.lax.dot_general(
                oh,
                wzp,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=gather_precision,
            )  # [_BR, k_pad]
            return ()

        jax.lax.fori_loop(0, d_nwin, dbody, (), unroll=False)

    return _kernel


def _flash_forward_chunkmajor(packed_t, adst_col, src, dst, num_rows, kz,
                              negative_slope, interpret, t_dtype):
    """Dispatch helper for the chunk-major grid.  adst_col: [n_out, 2] f32
    ([a_dst | m̂], bound-shift layout).  Returns the raw [n_pad, k_pad] f32
    accumulator (s in column kz, unnormalized)."""
    k, k_pad, n_src_pad = _layout(num_rows, kz)
    fc = _fc_cm(k_pad)
    e = dst.shape[0]
    e_pad = _cdiv(e, fc) * fc
    n_chunks = e_pad // fc
    n_pad = _cdiv(num_rows + 1, _BR) * _BR

    if e_pad != e:
        src = jnp.pad(src, (0, e_pad - e), constant_values=num_rows)
        dst = jnp.pad(dst, (0, e_pad - e), constant_values=num_rows)
    src = src.astype(jnp.int32)
    dst = dst.astype(jnp.int32)

    src_meta = _chunk_window_meta(src, n_chunks, fc, num_rows)
    # dst spans INCLUDE the sentinel row so pad-edge contributions land in
    # row num_rows (sliced off) instead of vanishing mid-kernel: clamp ids
    # to num_rows (they already are) and extend via min/max over ALL lanes
    dst_meta = _chunk_window_meta(dst, n_chunks, fc, num_rows + 1)

    # [a_dst | m̂] column-major [8, n_pad] so dst-window slices are free
    # (adst_col may be n_out = cdiv(num_rows, 128)*128 rows — off n_pad by
    # one 128-block when num_rows % 128 == 0; real rows fit either way).
    # Pre-rounded through the transport dtype: the block-major kernel casts
    # its [a_dst | m̂] block to t_dtype before gathering, the residual m is
    # the t_dtype-ROUNDED m̂, and both backward paths pre-round a_dst to
    # match the forward's logits bitwise — so this grid must gather the
    # same rounded values (round-3 ADVICE, bf16 transport).
    w = min(adst_col.shape[0], n_pad)
    adst_t = jnp.zeros((8, n_pad), jnp.float32).at[0:2, :w].set(
        adst_col[:w].astype(t_dtype).astype(jnp.float32).T
    )

    itemsize = 2 if t_dtype == jnp.bfloat16 else 4
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (8, n_pad), lambda j, *_: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (k_pad, n_src_pad), lambda j, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, fc), lambda j, *_: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fc), lambda j, *_: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (n_pad, k_pad), lambda j, *_: (0, 0), memory_space=pltpu.VMEM
        ),
    )
    acc = pl.pallas_call(
        _make_flash_fwd_chunk_kernel(fc, k_pad, kz, t_dtype,
                                     negative_slope),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, k_pad), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * e_pad * k_pad * (_BR + 2 * _R),
            bytes_accessed=(
                e_pad * 8
                + k_pad * n_src_pad * itemsize
                + n_pad * (k_pad + 8) * 4
            ),
            transcendentals=e_pad,
        ),
    )(src_meta, dst_meta, adst_t, packed_t.astype(t_dtype),
      src.reshape(1, -1), dst.reshape(1, -1))
    return acc


def _flash_forward_impl(packed_t, a_dst, src, dst, num_rows, kz,
                        negative_slope, interpret, transport):
    """packed_t: [k_pad, n_src_pad] (pack_gat_table layout).
    Returns (out[num_rows, kz], m[num_rows], s[num_rows])."""
    t_dtype = jnp.bfloat16 if transport == "bf16" else jnp.float32
    k, k_pad, n_src_pad = _layout(num_rows, kz)
    assert packed_t.shape == (k_pad, n_src_pad), (
        packed_t.shape, (k_pad, n_src_pad))
    n = num_rows
    e = dst.shape[0]
    if e == 0:
        # zero-size grids leave accumulators uninitialized (and the id DMA
        # pipeline can't slice a [1, 0] array) — the result is exact zeros
        # with an empty softmax everywhere (round-3 ADVICE)
        return (
            jnp.zeros((num_rows, kz), jnp.float32),
            jnp.zeros((num_rows,), jnp.float32),
            jnp.zeros((num_rows,), jnp.float32),
        )
    e_pad = _cdiv(e, _FC) * _FC
    n_chunks = e_pad // _FC
    n_blocks = _cdiv(num_rows, _R)
    n_out = n_blocks * _R

    from . import config as _cfg

    bound_shift = getattr(_cfg, "FLASH_SOFTMAX_SHIFT", "bound") == "bound"
    packed_t = packed_t.astype(t_dtype)
    if bound_shift:
        # per-row safe shift: m̂_i = leaky(a_dst_i + max_j a_src_j), built
        # from the SAME t_dtype-rounded values the kernel gathers, so the
        # bound holds in kernel arithmetic (f32 add / leaky are monotone)
        adst_r = a_dst.astype(t_dtype).astype(jnp.float32)
        smax = jnp.max(packed_t[kz, :n].astype(jnp.float32))
        pre_b = adst_r + smax
        mhat = jnp.where(pre_b > 0, pre_b, negative_slope * pre_b)
        adst_col = (
            jnp.zeros((n_out, 2), jnp.float32)
            .at[:n, 0].set(a_dst.astype(jnp.float32))
            .at[:n, 1].set(mhat)
        )
    else:
        adst_col = jnp.zeros((n_out, 1), jnp.float32).at[:n, 0].set(
            a_dst.astype(jnp.float32)
        )
    itemsize = 2 if t_dtype == jnp.bfloat16 else 4
    # Small tables live whole in VMEM for the entire grid (index_map is
    # constant, so Pallas fetches once) — window "DMAs" become free slices,
    # removing the per-chunk first-window DMA latency from the critical path
    table_in_vmem = k_pad * n_src_pad * itemsize <= _TABLE_VMEM_BYTES

    # Chunk-major grid (bound-shift only): needs the packed table AND the
    # row-major [n_pad, k_pad] f32 accumulator (128 physical lanes/row under
    # the (8,128) tiling, regardless of k_pad) resident in VMEM together.
    n_pad_cm = _cdiv(num_rows + 1, _BR) * _BR
    acc_phys = n_pad_cm * _cdiv(k_pad, 128) * 128 * 4
    chunk_major = (
        bound_shift
        and getattr(_cfg, "FLASH_FWD_GRID", "chunk") == "chunk"
        and table_in_vmem
        and dst.shape[0] > 0  # e=0 -> zero-size grid, acc never zero-inited
        and k_pad * n_src_pad * itemsize + acc_phys + 8 * n_pad_cm * 4
        <= _cfg.SCATTER_SINGLE_TILE_LIMIT
    )
    if chunk_major:
        acc = _flash_forward_chunkmajor(
            packed_t, adst_col, src, dst, num_rows, kz, negative_slope,
            interpret, t_dtype,
        )
        s = acc[:num_rows, kz]
        out = acc[:num_rows, :kz] / (s[:, None] + 1e-16)
        m = mhat.astype(t_dtype).astype(jnp.float32)
        return out, m, s

    if e_pad != e:
        src = jnp.pad(src, (0, e_pad - e), constant_values=num_rows)
        dst = jnp.pad(dst, (0, e_pad - e), constant_values=num_rows)
    src = src.astype(jnp.int32)
    dst = dst.astype(jnp.int32)

    chunk_bounds = _block_chunk_bounds(dst, n_blocks, _FC)
    win_meta = _chunk_window_meta(src, n_chunks, _FC, num_rows)
    if table_in_vmem:
        packed_spec = pl.BlockSpec(
            (k_pad, n_src_pad), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
        )
        scratch = [
            pltpu.VMEM((2, 1, _FC), jnp.int32),
            pltpu.VMEM((2, 1, _FC), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
    else:
        packed_spec = pl.BlockSpec(memory_space=pl.ANY)  # stays in HBM
        scratch = [
            pltpu.VMEM((2, k_pad, _BR), t_dtype),
            pltpu.VMEM((2, 1, _FC), jnp.int32),
            pltpu.VMEM((2, 1, _FC), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
    adst_cols = adst_col.shape[1]
    out_specs = [
        pl.BlockSpec((_R, k_pad), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((_R, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((n_out, k_pad), jnp.float32),
        jax.ShapeDtypeStruct((n_out, 1), jnp.float32),
    ]
    if not bound_shift:  # the online kernel also emits the running max m
        out_specs.insert(
            1,
            pl.BlockSpec((_R, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        )
        out_shapes.insert(1, jax.ShapeDtypeStruct((n_out, 1), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (_R, adst_cols), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            packed_spec,
            pl.BlockSpec(memory_space=pl.ANY),  # src ids
            pl.BlockSpec(memory_space=pl.ANY),  # dst ids
        ],
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )
    res = pl.pallas_call(
        _make_flash_kernel(_FC, k_pad, kz, t_dtype, negative_slope,
                           table_in_vmem, bound_shift=bound_shift),
        grid_spec=grid_spec,
        out_shape=tuple(out_shapes),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            # windows stream once per chunk + the two accumulator matmuls
            flops=2 * e_pad * k_pad * (_BR + _R),
            bytes_accessed=(
                e_pad * 8
                + e_pad // _FC * 2 * _BR * k_pad * itemsize
                + n_out * (k_pad + 3) * 4
            ),
            transcendentals=e_pad * 2,
        ),
    )(chunk_bounds, win_meta, adst_col, packed_t,
      src.reshape(1, -1), dst.reshape(1, -1))
    if bound_shift:
        out, s = res
        # residual m = the t_dtype-rounded shift the kernel actually used
        # (matches the gathered m̂_e bitwise — same contract as the online
        # kernel's pre-rounded running max)
        m = mhat.astype(t_dtype).astype(jnp.float32)
        return out[:num_rows, :kz], m, s[:num_rows, 0]
    out, m, s = res
    return out[:num_rows, :kz], m[:num_rows, 0], s[:num_rows, 0]


# ------------------------------------------------------------------ backward


def _make_bwd_glue_kernel(chunk, k_pad, kg_pad, kz, t_dtype, ct_dtype,
                          negative_slope, fused_scatter=False):
    """Chunk-major backward GLUE kernel: everything but the src scatter.

    Replaces four pieces of the composed backward — the g-cotangent dst
    broadcast, the stats dst broadcast, the packed-source src re-gather and
    the 1-column da_dst segment-sum — plus their XLA elementwise glue, with
    ONE streaming pass over the edge chunks:

      * gtab_t [kg_pad, n_pad] f32 ([g | g·out | logden | a_dst] column-
        major) and the packed source table are VMEM-resident for the whole
        grid; src/dst ids are auto-pipelined block inputs,
      * per chunk: re-gather sources through the chunk's src windows,
        gather the stat table through its 1-2 dst windows (dst is
        block-monotone), form att/datt/dalpha/dpre in [1, C] registers,
      * emit the per-edge cotangent columns ``[att·g | dpre]`` as the
        chunk's OUTPUT block (auto-written, feeds the src scatter kernel),
      * accumulate da_dst into a window-major [n_pad/128, 128] f32 VMEM
        accumulator (row = dst window): the [1, C] dpre row one-hot-reduces
        to [1, 128] per window, and the singleton-sublane dynamic
        read-modify-write is the fast Mosaic pattern (61 KB at bench scale
        vs 7.9 MB for a [n_pad, 1] column under (8,128) tiling).

    Sentinel edges (dst == num_rows) gather an all-zero stat row, so
    datt = gout = 0 ⇒ dpre = 0 and every cotangent column vanishes (the
    +60 exp clamp keeps att finite first); the padded tail of the ct output
    is therefore exactly zero, which is the scatter kernel's contract.

    fused_scatter: instead of emitting ct to HBM for a separate scatter
    kernel, walk the chunk's src windows a second time and scatter-add ct
    into a COLUMN-major [k_pad, n_src_pad] f32 VMEM accumulator (lane-dim
    dynamic RMW on _BR-aligned slices — measured at parity with the
    row-tiled scatter on v5e) — one kernel replaces two and the [k, E]
    cotangent never touches HBM."""
    gather_precision = (
        jax.lax.Precision.DEFAULT
        if t_dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )

    def _kernel(swm_ref, dwm_ref, gtab_ref, packed_ref, sid_ref, did_ref,
                out0_ref, dadst_ref):
        # out0_ref = ct block output (composed mode) or the col-major
        # dpk accumulator (fused_scatter mode)
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            dadst_ref[:] = jnp.zeros_like(dadst_ref)
            if fused_scatter:
                out0_ref[:] = jnp.zeros_like(out0_ref)

        src_ids = sid_ref[:]  # [1, C]
        dst_ids = did_ref[:]  # [1, C]
        row_base = jax.lax.broadcasted_iota(jnp.int32, (_BR, chunk),
                                            dimension=0)

        # ---- src re-gather: z_e | a_src_e
        s_win0 = swm_ref[0, j]
        s_nwin = swm_ref[1, j]

        def sbody(w, acc):
            start = (s_win0 + w) * _BR
            oh = (src_ids == row_base + start).astype(t_dtype)
            return acc + jax.lax.dot_general(
                packed_ref[:, pl.ds(start, _BR)],
                oh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=gather_precision,
            )

        zacc = jax.lax.fori_loop(
            0, s_nwin, sbody, jnp.zeros((k_pad, chunk), jnp.float32),
            unroll=False,
        )
        a_src_e = zacc[kz : kz + 1, :]

        # ---- dst gather of the stat table (f32; one-hot select through
        # bf16x3 products is exact enough for gradients — the composed
        # path's broadcasts used the same DEFAULT-precision trade)
        d_win0 = dwm_ref[0, j]
        d_nwin = dwm_ref[1, j]

        def dgather(w, acc):
            start = (d_win0 + w) * _BR
            oh = (dst_ids == row_base + start).astype(jnp.float32)
            return acc + jax.lax.dot_general(
                gtab_ref[:, pl.ds(start, _BR)],
                oh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )

        G = jax.lax.fori_loop(
            0, d_nwin, dgather, jnp.zeros((kg_pad, chunk), jnp.float32),
            unroll=False,
        )  # rows [:kz]=g_e, kz=gout_e, kz+1=logden_e, kz+2=adst_e
        gout_e = G[kz : kz + 1, :]
        logden_e = G[kz + 1 : kz + 2, :]
        adst_e = G[kz + 2 : kz + 3, :]

        pre = adst_e + a_src_e
        act = jnp.where(pre > 0, pre, negative_slope * pre)
        att = jnp.exp(jnp.minimum(act - logden_e, 60.0))  # [1, C]

        krow = jax.lax.broadcasted_iota(jnp.int32, (k_pad, chunk), dimension=0)
        zmask = (krow < kz).astype(jnp.float32)
        datt = jnp.sum(
            G[:k_pad, :] * zacc * zmask, axis=0, keepdims=True
        )  # [1, C] = g_e · z_e (row kz of zacc is a_src — masked out)
        dalpha = att * (datt - gout_e)
        dpre = dalpha * jnp.where(pre > 0, 1.0, negative_slope)  # [1, C]

        ct = jnp.where(
            krow == kz, dpre, jnp.where(krow < kz, G[:k_pad, :] * att, 0.0)
        ).astype(ct_dtype)
        if fused_scatter:
            # second src-window walk: scatter ct into the col-major VMEM
            # accumulator through fresh one-hots (same walk bounds as the
            # re-gather above)
            sw0 = swm_ref[0, j]
            sn = swm_ref[1, j]

            def sscatter(w, _):
                start = (sw0 + w) * _BR
                oh = (src_ids == row_base + start).astype(ct_dtype)
                out0_ref[:, pl.ds(start, _BR)] += jax.lax.dot_general(
                    ct, oh,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=gather_precision,
                )  # [k_pad, _BR]
                return ()

            jax.lax.fori_loop(0, sn, sscatter, (), unroll=False)
        else:
            out0_ref[:] = ct

        def dscatter(w, _):
            start = (d_win0 + w) * _BR
            oh = (dst_ids == row_base + start).astype(jnp.float32)
            partial = jax.lax.dot_general(
                dpre, oh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )  # [1, _BR]
            dadst_ref[pl.ds(d_win0 + w, 1), :] += partial
            return ()

        jax.lax.fori_loop(0, d_nwin, dscatter, (), unroll=False)

    return _kernel


def _bwd_glue_impl(packed_t, gtab_t, src, dst, num_rows, kz, negative_slope,
                   interpret, transport, fused_scatter=False):
    """Composed mode returns (ct_t [k_pad, e_pad] ct_dtype — zero-padded,
    scatter-ready; da_dst [num_rows] f32); fused_scatter mode returns
    (dpk [k_pad, n_src_pad] f32 — the finished src-side cotangent table;
    da_dst).  gtab_t: [kg_pad, n_pad] f32 column-major."""
    from . import config as _cfg

    t_dtype = jnp.bfloat16 if transport == "bf16" else jnp.float32
    ct_dtype = (
        jnp.bfloat16 if _cfg.SEGSUM_TRANSPORT == "bf16" else jnp.float32
    )
    k, k_pad, n_src_pad = _layout(num_rows, kz)
    kg_pad = max(8, _cdiv(kz + 3, 8) * 8)
    n_pad = _cdiv(num_rows + 1, _BR) * _BR
    assert gtab_t.shape == (kg_pad, n_pad), (gtab_t.shape, (kg_pad, n_pad))
    fc = _fc_cm(k_pad)
    e = dst.shape[0]
    e_pad = _cdiv(e, fc) * fc
    n_chunks = e_pad // fc
    n_wins = n_pad // _BR

    if e_pad != e:
        src = jnp.pad(src, (0, e_pad - e), constant_values=num_rows)
        dst = jnp.pad(dst, (0, e_pad - e), constant_values=num_rows)
    src = src.astype(jnp.int32)
    dst = dst.astype(jnp.int32)

    src_meta = _chunk_window_meta(src, n_chunks, fc, num_rows)
    dst_meta = _chunk_window_meta(dst, n_chunks, fc, num_rows + 1)

    if fused_scatter:
        out0_spec = pl.BlockSpec(
            (k_pad, n_src_pad), lambda j, *_: (0, 0),
            memory_space=pltpu.VMEM,
        )
        out0_shape = jax.ShapeDtypeStruct((k_pad, n_src_pad), jnp.float32)
    else:
        out0_spec = pl.BlockSpec(
            (k_pad, fc), lambda j, *_: (0, j), memory_space=pltpu.VMEM
        )
        out0_shape = jax.ShapeDtypeStruct((k_pad, e_pad), ct_dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (kg_pad, n_pad), lambda j, *_: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (k_pad, n_src_pad), lambda j, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, fc), lambda j, *_: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fc), lambda j, *_: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            out0_spec,
            pl.BlockSpec(
                (n_wins, _BR), lambda j, *_: (0, 0), memory_space=pltpu.VMEM
            ),
        ),
    )
    t_item = 2 if t_dtype == jnp.bfloat16 else 4
    ct_item = 2 if ct_dtype == jnp.bfloat16 else 4
    out0, dadst_w = pl.pallas_call(
        _make_bwd_glue_kernel(fc, k_pad, kg_pad, kz, t_dtype, ct_dtype,
                              negative_slope, fused_scatter=fused_scatter),
        grid_spec=grid_spec,
        out_shape=(
            out0_shape,
            jax.ShapeDtypeStruct((n_wins, _BR), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * e_pad * (k_pad * _BR * (2 if fused_scatter else 1)
                               + kg_pad * 2 * _R + _BR),
            bytes_accessed=(
                e_pad * 8
                + k_pad * n_src_pad * t_item
                + kg_pad * n_pad * 4
                + (k_pad * n_src_pad * 4 if fused_scatter
                   else k_pad * e_pad * ct_item)
                + n_pad * 4
            ),
            transcendentals=e_pad,
        ),
    )(src_meta, dst_meta, gtab_t, packed_t.astype(t_dtype),
      src.reshape(1, -1), dst.reshape(1, -1))
    return out0, dadst_w.reshape(-1)[:num_rows]


def _make_flash_bwd_kernel(chunk, k_pad, kg_pad, kz, t_dtype, negative_slope):
    """Backward megakernel v2 (VMEM-table variant only): ONE window walk.

    Per dst block: the [g | g·out | logden | a_dst] row table arrives as a
    free block input; per chunk it is broadcast edge-wise through ONE
    one-hot dst matmul (``logden = m + log(s + 1e-16)`` folds the two
    softmax stats into one column, as the composed pipeline does).  The
    chunk's src windows are then walked ONCE: each window's one-hot src
    matrix is built a single time and feeds BOTH the packed-source gather
    and the cotangent scatter-add into the VMEM-resident ``dpacked_t``
    accumulator — v1 walked the windows twice and built every one-hot
    twice.  ``att``/``dpre`` are recomputed per window from that window's
    gathered sources; columns whose src lies outside the window read
    z_e = 0 and produce garbage cotangents, but their column of the
    one-hot scatter matrix is zero and their ``da_dst`` contribution is
    masked by the in-window predicate, so only the owning window's values
    land anywhere.  ``da_dst`` accumulates block-locally (one [R, 1]
    matmul per chunk) — no separate 1-column segment-sum pass.

    Straddle columns (dst outside this block) gather an all-zero stat row:
    ``datt`` and ``g·out`` are then exactly 0, so ``dpre = att·0 = 0`` and
    every cotangent vanishes — provided ``att`` stays finite, which the
    +60 exp-argument clamp guarantees (inf·0 would be NaN).
    """
    precision = (
        jax.lax.Precision.DEFAULT
        if t_dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )

    def _kernel(cb_ref, wm_ref, gtab_ref, packed_ref, src_hbm, dst_hbm,
                dpk_ref, dadst_ref, sid_buf, did_buf, sem_ids):
        i = pl.program_id(0)
        c_lo = cb_ref[0, i]
        c_hi = cb_ref[1, i]
        row0 = i * _R

        @pl.when(i == 0)
        def _():
            dpk_ref[:] = jnp.zeros_like(dpk_ref)

        dadst_ref[:] = jnp.zeros_like(dadst_ref)

        drow_ids = (
            jax.lax.broadcasted_iota(jnp.int32, (_R, chunk), dimension=0) + row0
        )
        krow = jax.lax.broadcasted_iota(jnp.int32, (k_pad, chunk), dimension=0)
        # stat table stays f32: the one-hot select through bf16x3 products
        # is exact, and dalpha = att·(g·z − g·out) is a near-cancellation
        # that bf16-rounded g would corrupt (round-1 kept these f32 too)
        gt = gtab_ref[:]  # [R, kg_pad] f32

        start_ids, wait_ids = _ids_pipeline(
            src_hbm, dst_hbm, sid_buf, did_buf, sem_ids, chunk
        )

        @pl.when(c_lo < c_hi)
        def _():
            start_ids(c_lo, 0)

        def body(c, _):
            slot = jax.lax.rem(c - c_lo, 2)

            @pl.when(c + 1 < c_hi)
            def _():
                start_ids(c + 1, jax.lax.rem(c + 1 - c_lo, 2))

            wait_ids(c, slot)
            src_ids = sid_buf[slot]  # [1, C]
            dst_ids = did_buf[slot]  # [1, C]

            win0 = wm_ref[0, c]
            n_win = wm_ref[1, c]

            oh_d = (dst_ids == drow_ids).astype(jnp.float32)  # [R, C]
            # row -> edge broadcast of the whole stat table, one matmul
            G = jax.lax.dot_general(
                gt, oh_d,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )  # [kg_pad, C]: rows [:kz]=g, kz=g·out, kz+1=logden, kz+2=adst
            gout_e = G[kz : kz + 1, :]
            logden_e = G[kz + 1 : kz + 2, :]
            adst_e = G[kz + 2 : kz + 3, :]

            def wbody(w, dpre_acc):
                start = (win0 + w) * _BR
                srow_ids = (
                    jax.lax.broadcasted_iota(
                        jnp.int32, (_BR, chunk), dimension=0
                    )
                    + start
                )
                oh = (src_ids == srow_ids).astype(t_dtype)  # [BR, C]
                zacc = jax.lax.dot_general(
                    packed_ref[:, pl.ds(start, _BR)],
                    oh,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision,
                )  # [k_pad, C]: rows [:kz] = z_e, row kz = a_src_e
                a_src_e = zacc[kz : kz + 1, :]

                pre = adst_e + a_src_e
                act = jnp.where(pre > 0, pre, negative_slope * pre)
                att = jnp.exp(jnp.minimum(act - logden_e, 60.0))  # [1, C]

                datt = jnp.sum(
                    G[:kz, :] * zacc[:kz, :], axis=0, keepdims=True
                )  # [1, C] = g_e · z_e (localizes to the owning window)
                dalpha = att * (datt - gout_e)
                dpre = dalpha * jnp.where(
                    pre > 0, 1.0, negative_slope
                )  # [1, C]

                # per-edge cotangent columns [att·g | dpre] (rows > kz zero)
                ct = jnp.where(
                    krow == kz, dpre,
                    jnp.where(krow < kz, G[:k_pad, :] * att, 0.0),
                ).astype(t_dtype)  # [k_pad, C]

                # sublane-dim slice update: lane-dim dynamic RMW is slow on
                # Mosaic, so the accumulator is row-major [n_pad, k_pad];
                # the SAME one-hot that gathered this window scatters it
                dpk_ref[pl.ds(start, _BR), :] += jax.lax.dot_general(
                    oh, ct,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision,
                )  # [_BR, k_pad]

                inw = jnp.logical_and(
                    src_ids >= start, src_ids < start + _BR
                ).astype(jnp.float32)  # [1, C]: this window owns the edge
                return dpre_acc + dpre * inw

            dpre_full = jax.lax.fori_loop(
                0, n_win, wbody, jnp.zeros((1, chunk), jnp.float32),
                unroll=False,
            )

            dadst_ref[:] += jax.lax.dot_general(
                oh_d, dpre_full,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )  # [R, 1]
            return ()

        jax.lax.fori_loop(c_lo, c_hi, body, (), unroll=False)

    return _kernel


def _flash_bwd_impl(packed_t, gtab, src, dst, num_rows, kz, negative_slope,
                    interpret, transport):
    """gtab: [n_out, kg_pad] f32 = [g | g·out | logden | a_dst] (zero-padded).
    Returns (dpacked_t [k_pad, n_src_pad] f32, da_dst [num_rows] f32)."""
    t_dtype = jnp.bfloat16 if transport == "bf16" else jnp.float32
    k, k_pad, n_src_pad = _layout(num_rows, kz)
    kg_pad = max(8, _cdiv(kz + 3, 8) * 8)
    e = dst.shape[0]
    e_pad = _cdiv(e, _FC_BWD) * _FC_BWD
    n_chunks = e_pad // _FC_BWD
    n_blocks = _cdiv(num_rows, _R)
    n_out = n_blocks * _R
    assert gtab.shape == (n_out, kg_pad), (gtab.shape, (n_out, kg_pad))

    packed_t = packed_t.astype(t_dtype)
    if e_pad != e:
        src = jnp.pad(src, (0, e_pad - e), constant_values=num_rows)
        dst = jnp.pad(dst, (0, e_pad - e), constant_values=num_rows)
    src = src.astype(jnp.int32)
    dst = dst.astype(jnp.int32)

    chunk_bounds = _block_chunk_bounds(dst, n_blocks, _FC_BWD)
    win_meta = _chunk_window_meta(src, n_chunks, _FC_BWD, num_rows)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (_R, kg_pad), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (k_pad, n_src_pad), lambda i, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # src ids
            pl.BlockSpec(memory_space=pl.ANY),  # dst ids
        ],
        out_specs=(
            pl.BlockSpec(
                (n_src_pad, k_pad), lambda i, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((_R, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 1, _FC_BWD), jnp.int32),
            pltpu.VMEM((2, 1, _FC_BWD), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    itemsize = 2 if t_dtype == jnp.bfloat16 else 4
    dpk, dadst = pl.pallas_call(
        _make_flash_bwd_kernel(_FC_BWD, k_pad, kg_pad, kz, t_dtype,
                               negative_slope),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_src_pad, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_out, 1), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * e_pad * (k_pad + kg_pad) * (_BR + _R) * 2,
            bytes_accessed=(
                e_pad * 8
                + n_out * kg_pad * 4
                + k_pad * n_src_pad * (itemsize + 4)
            ),
            transcendentals=e_pad,
        ),
    )(chunk_bounds, win_meta, gtab, packed_t,
      src.reshape(1, -1), dst.reshape(1, -1))
    return dpk.T, dadst[:num_rows, 0]


def _bwd_fits_vmem(num_rows, kz, transport):
    _, k_pad, n_src_pad = _layout(num_rows, kz)
    itemsize = 2 if transport == "bf16" else 4
    table = k_pad * n_src_pad * itemsize
    acc = k_pad * n_src_pad * 4
    return table + acc <= 2 * _TABLE_VMEM_BYTES and table <= _TABLE_VMEM_BYTES


# ------------------------------------------------------------------ custom_vjp


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def flash_gat_attention(packed_t, a_dst, src, dst, src_perm, src_sorted,
                        num_rows, kz, negative_slope=0.2, interpret=False,
                        transport="f32"):
    """out[i] = Σ_e softmax_dst(leaky_relu(a_dst[i] + a_src[j]))_e · z[j]
    for single-head GAT over a block-monotone edge list.

    packed_t: [k_pad, n_src_pad] column-major ``[z | a_src]`` table
    (pack_gat_table); a_dst: [num_rows] f32 destination logits; src/dst:
    int[E] with padding sentinel ``dst == num_rows``; src_perm/src_sorted:
    the StepGraph's src-sorted permutation (composed fallback in the
    backward when the node table exceeds VMEM).  Differentiable in packed_t
    and a_dst."""
    out, _, _ = _flash_forward_impl(
        packed_t, a_dst, src, dst, num_rows, kz, negative_slope, interpret,
        transport,
    )
    return out


def _flash_fwd(packed_t, a_dst, src, dst, src_perm, src_sorted, num_rows, kz,
               negative_slope, interpret, transport):
    out, m, s = _flash_forward_impl(
        packed_t, a_dst, src, dst, num_rows, kz, negative_slope, interpret,
        transport,
    )
    return out, (packed_t, a_dst, src, dst, src_perm, src_sorted, m, s, out)


def _flash_bwd(num_rows, kz, negative_slope, interpret, transport, res, g):
    packed_t, a_dst, src, dst, src_perm, src_sorted, m, s, out = res
    n = num_rows
    g = g.astype(jnp.float32)
    _, k_pad, n_src_pad = _layout(num_rows, kz)
    if dst.shape[0] == 0:
        return (jnp.zeros_like(packed_t), jnp.zeros_like(a_dst),
                None, None, None, None)

    # The one-pass megakernel is kept for interpret-mode validation and as
    # an option, but measured SLOWER than the composed kernel pipeline on
    # v5e at bench scale (5.1 vs 4.3 ms/step end-to-end: its serialized
    # double window walk + stat matmuls lose to the individually tuned
    # broadcast/gather/scatter kernels).  Composed is the TPU default.
    from . import config as _cfg_mod

    use_mega = getattr(_cfg_mod, "FLASH_BWD_MEGA", False) and (
        interpret or (_on_tpu() and _bwd_fits_vmem(num_rows, kz, transport))
    )
    if use_mega:
        kg_pad = max(8, _cdiv(kz + 3, 8) * 8)
        n_blocks = _cdiv(num_rows, _R)
        n_out = n_blocks * _R
        gtab = jnp.zeros((n_out, kg_pad), jnp.float32)
        gtab = gtab.at[:n, :kz].set(g)
        gtab = gtab.at[:n, kz].set(jnp.sum(g * out, axis=1))
        gtab = gtab.at[:n, kz + 1].set(m + jnp.log(s + 1e-16))
        # pre-round a_dst to the transport dtype so the recomputed logits
        # match the forward kernel's (which gathered a t_dtype a_dst) exactly
        t_dtype = jnp.bfloat16 if transport == "bf16" else jnp.float32
        gtab = gtab.at[:n, kz + 2].set(
            a_dst.astype(t_dtype).astype(jnp.float32)
        )
        dpk, da_dst = _flash_bwd_impl(
            packed_t, gtab, src, dst, num_rows, kz, negative_slope,
            interpret, transport,
        )
        return (dpk.astype(packed_t.dtype), da_dst.astype(a_dst.dtype),
                None, None, None, None)

    # Composed pipeline (the TPU default): dst stat broadcast, src re-gather,
    # localized scatter / perm-gather segsum, 1-col segsum.  The glue stays
    # COLUMN-major ([K, E]) end to end — the kernels are feature-major
    # inside, so row-major glue would pay four [E, K]-scale transposes per
    # step (broadcast out, gather out, scatter in, plus the packed view).
    from . import config as _cfg
    from .pallas_segment import (
        _broadcast_forward,
        localized_scatter_add_pallas,
        scatter_fits_vmem,
        segment_sum_auto,
    )

    t_dtype = jnp.bfloat16 if transport == "bf16" else jnp.float32
    k = kz + 1
    e = dst.shape[0]
    # Chunk-major glue kernel: replaces both broadcasts, the src re-gather,
    # the XLA glue AND the 1-col da_dst segment-sum with one streaming pass
    # (see _make_bwd_glue_kernel) — only the src scatter remains separate.
    kg_pad = max(8, _cdiv(kz + 3, 8) * 8)
    n_pad_g = _cdiv(num_rows + 1, _BR) * _BR
    t_item = 2 if t_dtype == jnp.bfloat16 else 4
    glue_fits = (
        k_pad * n_src_pad * t_item + kg_pad * n_pad_g * 4
        <= _cfg.SCATTER_SINGLE_TILE_LIMIT
    )
    use_glue = (
        getattr(_cfg, "FLASH_BWD_GLUE", True)
        and kz + 1 <= 128
        and glue_fits
        and e > 0  # e=0 -> zero-size grid, dadst never zero-inited
        and (interpret or _cfg.resolve(None, _on_tpu() and e >= 65536))
    )
    if use_glue:
        gtab_t = jnp.zeros((kg_pad, n_pad_g), jnp.float32)
        # g pre-rounded to the transport dtype: the composed path broadcast
        # g in t_dtype, so datt sees identical inputs on both paths
        gtab_t = gtab_t.at[:kz, :n].set(
            g.T.astype(t_dtype).astype(jnp.float32)
        )
        gtab_t = gtab_t.at[kz, :n].set(jnp.sum(g * out, axis=1))
        gtab_t = gtab_t.at[kz + 1, :n].set(m + jnp.log(s + 1e-16))
        gtab_t = gtab_t.at[kz + 2, :n].set(
            a_dst.astype(t_dtype).astype(jnp.float32)
        )
        # fully fused variant: the src scatter runs inside the glue kernel
        # against a col-major [k_pad, n_src_pad] f32 VMEM accumulator —
        # the [k, E] cotangent never touches HBM.  Gate on the THREE
        # grid-resident tables fitting scoped VMEM together.
        fused_bytes = (
            k_pad * n_src_pad * t_item
            + kg_pad * n_pad_g * 4
            + k_pad * n_src_pad * 4
        )
        use_fused = use_glue and fused_bytes <= 13 * 1024 * 1024
        if use_fused:
            dpk_f, da_dst = _bwd_glue_impl(
                packed_t, gtab_t, src, dst, num_rows, kz, negative_slope,
                interpret, transport, fused_scatter=True,
            )
            return (dpk_f.astype(packed_t.dtype), da_dst.astype(a_dst.dtype),
                    None, None, None, None)
        ct_t, da_dst = _bwd_glue_impl(
            packed_t, gtab_t, src, dst, num_rows, kz, negative_slope,
            interpret, transport,
        )
        from .pallas_segment import (
            localized_scatter_add_pallas as _scatter,
            scatter_fits_vmem as _sfits,
            segment_sum_auto as _ssum,
        )

        e_pad_g = ct_t.shape[1]
        src_p = src
        if e_pad_g != e:
            src_p = jnp.pad(src, (0, e_pad_g - e), constant_values=num_rows)
        if _cfg.resolve(
            None, _on_tpu() and k_pad <= 128 and _sfits(n, k_pad)
        ) and (k_pad <= 128 and _sfits(n, k_pad)):
            dpacked = _scatter(
                None, src_p, n, interpret=interpret,
                transport=_cfg.SEGSUM_TRANSPORT, ct_t=ct_t,
            )  # [n, k_pad] (pad cols are zero)
        else:
            dpacked = _ssum(
                ct_t.T[:e][src_perm], src_sorted, n
            )  # drop pad edges first: perm indexes the real edge list
        dpk = (
            jnp.zeros((k_pad, n_src_pad), jnp.float32)
            .at[:, :n].set(dpacked[:, :k_pad].T)
        )
        return (dpk.astype(packed_t.dtype), da_dst.astype(a_dst.dtype),
                None, None, None, None)

    # Two broadcasts instead of one wide f32 [kz+4, E] stat table: the g
    # cotangent rides the message-transport dtype ([kz, E] bf16 under bf16
    # transport — half the HBM bytes of the hottest backward tensor), while
    # the 3 stat columns stay f32.  m and s fold into one log-denominator
    # column (att = exp(act − m)/(s+eps) = exp(act − (m + log(s+eps)))), so
    # the f32 side is [gout | logden | a_dst] — 3 cols, padded to 8.
    g_tab = g.astype(t_dtype)
    stats = jnp.stack(
        [
            jnp.sum(g * out, axis=1),
            m + jnp.log(s + 1e-16),
            # pre-rounded so the recomputed logits match the forward
            # kernel's (which gathered a t_dtype a_dst) exactly
            a_dst.astype(t_dtype).astype(jnp.float32),
        ],
        axis=1,
    )  # [N, 3] f32
    # gate on k = kz + 1: the packed [z | a_src] broadcast below runs at
    # kz + 1 columns, which must stay within the kernels' 128-column cap
    # (round-2 ADVICE: kz in 125..128 would dispatch an untested >128-col
    # broadcast if gated on kz alone)
    use_kernels = _cfg.resolve(
        None, _on_tpu() and kz + 1 <= 128 and e >= 65536
    ) and kz + 1 <= 128
    if use_kernels:
        # stays in the transport dtype: consumers upcast elementwise in
        # registers (the values were bf16-rounded by the kernel regardless;
        # an eager .astype(f32) would just materialize a 2x copy)
        g_e = _broadcast_forward(
            g_tab, dst, n, interpret, exact=False, out_transposed=True
        )  # [kz, E] (transport dtype)
        st_e = _broadcast_forward(
            stats, dst, n, interpret, exact=False, out_transposed=True
        )  # [3, E] f32
        pk_t = _broadcast_forward(
            None, src, n, interpret, exact=False, out_transposed=True,
            v_t=packed_t, k=k,
        )  # [kz+1, E] (transport dtype)
    else:
        safe_dst = jnp.minimum(dst, n - 1)
        mask = (dst < n).astype(jnp.float32)
        g_e = g_tab.astype(jnp.float32).T[:, safe_dst] * mask[None]
        st_e = stats.T[:, safe_dst] * mask[None]
        safe_src = jnp.minimum(src, n - 1)
        pk_t = packed_t[:k, :][:, jnp.minimum(safe_src, n - 1)] * (
            (src < n).astype(packed_t.dtype)[None]
        )
    gout_e, logden_e, adst_e = st_e[0], st_e[1], st_e[2]
    z_e = pk_t[:kz].astype(jnp.float32)
    a_src_e = pk_t[kz].astype(jnp.float32)

    pre = adst_e + a_src_e
    act = jnp.where(pre > 0, pre, negative_slope * pre)
    att = jnp.where(dst < n, jnp.exp(act - logden_e), 0.0)

    datt = jnp.sum(g_e * z_e, axis=0)
    dalpha = att * (datt - gout_e)
    dpre = dalpha * jnp.where(pre > 0, 1.0, negative_slope)

    # ct_t feeds a custom call (no fusion INTO it), so it materializes in
    # HBM at whatever dtype it is built — build it directly in the scatter's
    # transport dtype instead of f32-then-cast: identical bits reach the
    # kernel (the product was rounded to bf16 either way), and the [k, E]
    # write+read — the single hottest backward tensor — halves.
    ct_dtype = t_dtype if _cfg.SEGSUM_TRANSPORT == "bf16" else jnp.float32
    ct_t = jnp.concatenate(
        [(att[None] * g_e).astype(ct_dtype), dpre[None].astype(ct_dtype)],
        axis=0,
    )  # [k, E]
    use_scatter = _cfg.resolve(
        None,
        _on_tpu() and k <= 128 and e >= 65536 and scatter_fits_vmem(n, k),
    ) and (k <= 128 and scatter_fits_vmem(n, k))
    if use_scatter:
        dpacked = localized_scatter_add_pallas(
            None, src, n, transport=_cfg.SEGSUM_TRANSPORT, ct_t=ct_t
        )
    else:
        dpacked = segment_sum_auto(ct_t.T[src_perm], src_sorted, n)
    da_dst = segment_sum_auto(dpre[:, None], dst, n)[:, 0]

    dpk = jnp.zeros((k_pad, n_src_pad), jnp.float32).at[:k, :n].set(dpacked.T)
    return (dpk.astype(packed_t.dtype), da_dst.astype(a_dst.dtype),
            None, None, None, None)


flash_gat_attention.defvjp(_flash_fwd, _flash_bwd)


def flash_gat_reference(packed_t, a_dst, src, dst, num_rows, kz,
                        negative_slope=0.2):
    """Pure-XLA oracle with identical semantics (tests + off-TPU path)."""
    from .segment import segment_softmax

    z = packed_t[:kz, :num_rows].T.astype(jnp.float32)
    a_src = packed_t[kz, :num_rows].astype(jnp.float32)
    safe_src = jnp.minimum(src, num_rows - 1)
    safe_dst = jnp.minimum(dst, num_rows - 1)
    real = dst < num_rows
    pre = jnp.where(real, a_dst[safe_dst] + a_src[safe_src], -jnp.inf)
    act = jnp.where(pre > 0, pre, negative_slope * pre)
    att = segment_softmax(act, dst, num_rows, indices_are_sorted=False)
    att = jnp.where(real, att, 0.0)
    msgs = att[:, None] * jnp.where(real[:, None], z[safe_src], 0.0)
    return jax.ops.segment_sum(msgs, dst, num_segments=num_rows)


def flash_gat_enabled(heads, dropout_active, num_edges, use_pallas=None,
                      src_span=0.0):
    """Dispatch predicate: no attention dropout, large edge list, TPU
    backend (or forced via ops.config.FORCE_PALLAS/use_pallas;
    ops.config.FLASH_GAT overrides just this kernel for scale sweeps).
    src_span = StepGraph.src_span — the megakernel's in-kernel one-hot
    gather loses to the XLA gather engine past ops.config.GATHER_SPAN_MAX
    (sparse graphs; see ops/stream_gat.py for the large-scale path).
    heads > 1 is handled by the caller as a per-head loop over the
    single-head megakernel (models/pea._fused_gat_step)."""
    from . import config as _cfg

    eligible = not dropout_active
    if _cfg.FLASH_GAT is False:
        return False
    if _cfg.FLASH_GAT is True:
        return eligible
    return (
        _cfg.resolve(
            use_pallas,
            _on_tpu() and num_edges >= 65536
            and src_span <= _cfg.GATHER_SPAN_MAX,
        )
        and eligible
    )
