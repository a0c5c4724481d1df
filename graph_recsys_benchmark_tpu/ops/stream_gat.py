"""Streaming GAT attention for sparse, large-scale graphs (ML-25M regime).

At bench scale the flash-GAT megakernels (ops/flash_gat.py) gather source
rows in-kernel with one-hot window matmuls — profitable only when the
(dst//128, src) block order makes edge chunks window-local
(StepGraph.src_span ~1.5-2).  At the reference's ML-25M scale the metapath
step graphs are sparse and cross-band (span ~18-57): in-kernel gathering
does tens of redundant window matmuls per chunk and loses to XLA's gather
engine ~8x (measured on v5e: 55 ms vs 7.2 ms for one [2.2M, 66] bf16
gather).  This module splits the conv by what each engine is best at:

  * the ONE random-access op per direction rides XLA's native row gather
    (transaction-bound: ~7 ms for [2.2M, 128] bf16 on v5e),
  * everything else — logits, bound-shift softmax, weighted aggregation,
    gradient glue — runs in THREE streaming Pallas kernels that consume
    the gathered edge stream SEQUENTIALLY (predictable double-buffered
    chunk DMAs, no random access) and touch node tables only through the
    grid's own 128-row block inputs:
      fwd     : dst-block grid — accumulates [p*z | p] per dst block
      bwd/dst : dst-block grid — da_dst via per-edge dpre recompute
      bwd/src : src-block grid over the SRC-SORTED stream — dpacked
                ([dz | da_src]); src_sorted is fully sorted, so every real
                edge's source row lies in the current block and the
                "gather" degenerates to one in-block one-hot matmul
  * self-loops are ANALYTIC: PyG 1.5 GATConv adds one self-loop per node,
    but materializing them as edges interleaves every node band into every
    dst block and wrecks src locality (measured span 32 -> 18 without
    them).  The loop term is a pure row-wise softmax contribution,
    computed in fused XLA (graph.build_gat_graph analytic_loops=True
    emits loop-free lists flagged `gat_loops`).

CHANNEL BATCHING: the reference's metapath channels reuse the SAME edge
list for several channels (ML-25M: 7 of the 13 second steps ride the
identical 2.13M-interaction graph).  The kernels are batched-native over
``n_ch`` channels sharing one edge list — each channel owns a 128-column
band of the packed stream, the per-chunk fixed costs (id DMAs, one-hot
build, loop machinery — the dominant term at ~8 us/chunk vs ~1 us/chunk
of inherent per-channel work) are paid ONCE, and the XLA gathers move
n_ch*256-byte rows instead of transaction-wasting 128-byte rows.
graph.build_metapath_graphs dedupes identical step graphs so callers can
group channels by object identity (models/pea.py).

Semantics per channel match PyG 1.5 GATConv single-head attention exactly
as ops/flash_gat.flash_gat_attention does (reference models/peagat.py:
14-21; scatter-softmax with the +1e-16 denominator guard), including the
implicit self-loop when ``self_loops=True``.  Multi-head callers loop
heads (nn/conv.gat_apply).

Numerics: z / a_src / a_dst and the per-node softmax stats ride the
transport dtype through the kernels' block tables and streams, rounded
ONCE at the top of forward — forward and both backward recomputations see
bitwise-identical logits by construction.  f32 transport keeps everything
f32 (HIGHEST-precision matmuls), preserving reference-parity numerics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_segment import _R, _block_chunk_bounds, _cdiv, _on_tpu

# Per-channel column band of the streamed row-major [E, n_ch*band]
# arrays.  Round 4 fixed this at 128; at kz=16 that wastes 7.5x of every
# stream byte (17 useful of 128 columns), so the band is now the SMALLEST
# 8-multiple holding the widest per-channel payload, [g | gout | logden |
# a_dst] = kz+3 (TPU HBM arrays are lane-tiled to 128, so the physical
# win is ceil(n_ch*band/128) tiles vs n_ch — e.g. the 7-channel kz=16
# group moves 2 lane-tiles instead of 7).  _KB remains the upper bound
# (kz <= 125).
_KB = 128


def _band_for(kz):
    return min(_KB, max(8, _cdiv(kz + 3, 8) * 8))

# Streaming engages at and above this edge count (below it the flash /
# composed kernels win on launch overhead even at poor locality).
STREAM_MIN_EDGES = 262144

# VMEM budget for the double-buffered stream chunks; sets the chunk size
# given the stream width (2048 at one bf16 channel — measured faster than
# 1024/4096 on v5e).  Kernel temporaries are per-band (<= ~1.5 MB), so the
# buffers + output block must fit the remaining ~10 MB of the v5e's 16 MiB
# scoped VMEM.
_STREAM_BUF_BYTES = 4 * 1024 * 1024


def _chunk_for(n_ch, itemsize, kb, bwd=False):
    # Backward kernels carry ~2x the per-band temporaries (Mosaic does not
    # reuse stack buffers across the unrolled band loop), so they run at
    # half the chunk budget — measured: ph1 at n_ch=7/chunk=1024 allocates
    # 16.11M scoped VMEM, 108KB over the v5e's 16M limit.
    budget = _STREAM_BUF_BYTES // (2 if bwd else 1)
    per_edge = 2 * n_ch * kb * itemsize  # two buffered slots
    c = budget // per_edge
    c = 1 << (int(c).bit_length() - 1)  # floor to a power of two
    # No floor above the budget-derived chunk: clamping UP would let the
    # double-buffered stream exceed the VMEM budget just derived (n_ch=8
    # f32 backward gives 256 — round-4 ADVICE #5).
    return int(max(256, min(2048, c)))


def _layout(num_rows, kz, n_ch):
    assert kz <= 125, "streaming GAT supports kz <= 125 feature columns"
    assert 1 <= n_ch <= 8, "streaming GAT batches at most 8 channels"
    kb = _band_for(kz)
    # stream width padded to a 128 multiple: Mosaic HBM memref slices
    # must be lane-tile (128) aligned, and TPU arrays are lane-padded to
    # 128 in HBM anyway — the pad columns are free-of-charge zeros.
    # Band math uses stride kb over the first n_ch*kb columns; junk
    # selector bands beyond n_ch produce finite values that land in pad
    # columns/rows and are sliced off.
    k_pad = _cdiv(n_ch * kb, 128) * 128
    n_blocks = max(1, _cdiv(num_rows, _R))
    return k_pad, n_blocks, n_blocks * _R


def _leaky(x, slope):
    return jnp.where(x > 0, x, slope * x)


def _precision(t_dtype):
    return (
        jax.lax.Precision.DEFAULT
        if t_dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )


def _stream_dma(e_hbm, ids_hbm, e_buf, ids_buf, sems, chunk):
    def start(c, slot):
        pltpu.make_async_copy(
            e_hbm.at[pl.ds(c * chunk, chunk), :], e_buf.at[slot],
            sems.at[slot, 0],
        ).start()
        pltpu.make_async_copy(
            ids_hbm.at[:, pl.ds(c * chunk, chunk)], ids_buf.at[slot],
            sems.at[slot, 1],
        ).start()

    def wait(c, slot):
        pltpu.make_async_copy(
            e_hbm.at[pl.ds(c * chunk, chunk), :], e_buf.at[slot],
            sems.at[slot, 0],
        ).wait()
        pltpu.make_async_copy(
            ids_hbm.at[:, pl.ds(c * chunk, chunk)], ids_buf.at[slot],
            sems.at[slot, 1],
        ).wait()

    return start, wait


def _chunk_loop(cb_ref, start, body_fn):
    """Run body_fn(c, slot) over this block's chunk range with the standard
    double-buffered prefetch pattern."""
    i = pl.program_id(0)
    c_lo = cb_ref[0, i]
    c_hi = cb_ref[1, i]

    @pl.when(c_lo < c_hi)
    def _():
        start(c_lo, 0)

    def body(c, _):
        slot = jax.lax.rem(c - c_lo, 2)

        @pl.when(c + 1 < c_hi)
        def _():
            start(c + 1, jax.lax.rem(c + 1 - c_lo, 2))

        body_fn(c, slot)
        return ()

    jax.lax.fori_loop(c_lo, c_hi, body, (), unroll=False)


def _selectors(kz, n_ch, k_pad, chunk, t_dtype):
    """Static one-hot selector matrices (built from iota at block entry;
    entries are 0/1, exact in any dtype) that turn ALL per-channel scalar
    math into single wide ops:

      sel_s  [k_pad, 8] : picks column kz of each 128-col band
                          (x @ sel_s -> per-channel a_src, one matmul)
      sel3   [k_pad, 24]: picks bands' cols kz/kz+1/kz+2 -> [gout |
                          logden | a_dst] as [chunk, 8]-wide groups
      ones_z [k_pad, 8] : bands' cols < kz -> per-band row reduction
                          ((g*z) @ ones_z = per-channel datt, one matmul)
      expand [8, k_pad] : broadcasts a per-channel [chunk, 8] column back
                          over its 128-col band (p_all @ expand)
      is_s   [1, k_pad] : column-kz mask;  lt_z [1, k_pad]: cols < kz
    """
    kb = _band_for(kz)
    col = jax.lax.broadcasted_iota(jnp.int32, (k_pad, 8), dimension=0)
    ch = jax.lax.broadcasted_iota(jnp.int32, (k_pad, 8), dimension=1)
    band, off = col // kb, col % kb
    in_band = band == ch
    sel_s = (in_band & (off == kz)).astype(t_dtype)
    ones_z = (in_band & (off < kz)).astype(t_dtype)
    col3 = jax.lax.broadcasted_iota(jnp.int32, (k_pad, 24), dimension=0)
    ch3 = jax.lax.broadcasted_iota(jnp.int32, (k_pad, 24), dimension=1)
    band3, off3 = col3 // kb, col3 % kb
    sel3 = (
        (band3 == (ch3 % 8)) & (off3 == kz + ch3 // 8)
    ).astype(jnp.float32)
    ech = jax.lax.broadcasted_iota(jnp.int32, (8, k_pad), dimension=0)
    ecol = jax.lax.broadcasted_iota(jnp.int32, (8, k_pad), dimension=1)
    expand = (ech == ecol // kb).astype(t_dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (chunk, k_pad), dimension=1)
    is_s = (lane % kb) == kz
    lt_z = (lane % kb) < kz
    return sel_s, sel3, ones_z, expand, is_s, lt_z


def _make_fwd_kernel(chunk, kz, n_ch, t_dtype, negative_slope):
    """Per dst block: stream edge chunks of the XLA-gathered per-channel
    [z | a_src] bands, recover [a_dst | m-hat] edge-wise through the
    block's one-hot (dst is block-monotone so the whole stat table is THIS
    block), form p_c = exp(act_c − m-hat_c) and accumulate [p*z | p] per
    channel (s rides column kz of each band).  All per-channel scalar math
    runs [chunk, 8]-wide via the static selectors — per-chunk cost is
    independent of n_ch (<= 8).  (Precomputing p in XLA instead measured
    SLOWER on v5e: the [E, k_pad] weighted-stream materialization does not
    fuse into the gather and costs more than the in-kernel math saves.)"""
    acc_precision = _precision(t_dtype)

    def _kernel(cb_ref, adst_ref, pe_hbm, dst_hbm, out_ref, pe_buf, id_buf,
                sems):
        i = pl.program_id(0)
        row0 = i * _R
        k_pad = _cdiv(n_ch * _band_for(kz), 128) * 128
        out_ref[:] = jnp.zeros_like(out_ref)
        drow = (
            jax.lax.broadcasted_iota(jnp.int32, (_R, chunk), dimension=0)
            + row0
        )
        sel_s, _, _, expand, is_s, _ = _selectors(kz, n_ch, k_pad, chunk,
                                                  t_dtype)
        # one cast per BLOCK; values arrive pre-rounded from _fwd_common,
        # so the t_dtype cast is exact.  [R, 16]: cols c = a_dst_c,
        # cols 8+c = m-hat_c.
        adst_blk = adst_ref[:].astype(t_dtype)

        start, wait = _stream_dma(pe_hbm, dst_hbm, pe_buf, id_buf, sems, chunk)

        def body(c, slot):
            wait(c, slot)
            zc = pe_buf[slot]  # [chunk, n_ch*KB] t_dtype
            oh = (id_buf[slot] == drow).astype(t_dtype)  # [R, chunk]
            A = jax.lax.dot_general(
                oh, adst_blk,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=acc_precision,
            )  # [chunk, 16] — exact row select (one nonzero per row)
            a_src_all = jax.lax.dot_general(
                zc, sel_s,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=acc_precision,
            )  # [chunk, 8]
            pre = A[:, :8] + a_src_all
            act = _leaky(pre, negative_slope)
            # m-hat bounds every real logit; the +60 clamp only guards
            # edges whose dst lies outside this block (their A row is 0 —
            # the one-hot zeroes them, but inf*0 would be NaN)
            p_all = jnp.exp(jnp.minimum(act - A[:, 8:16], 60.0))
            P = jax.lax.dot_general(
                p_all.astype(t_dtype), expand,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=acc_precision,
            ).astype(t_dtype)  # [chunk, k_pad] — p_c over band c
            wzp = jnp.where(is_s, P, zc * P)
            out_ref[:] += jax.lax.dot_general(
                oh, wzp,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=acc_precision,
            )  # [R, k_pad]

        _chunk_loop(cb_ref, start, body)

    return _kernel


def _make_bwd_dst_kernel(chunk, kz, n_ch, out_cols, t_dtype, negative_slope):
    """Per dst block: recompute att/dpre per edge per channel ([chunk, 8]
    wide via selectors) from the streamed [z | a_src] bands and the
    block's [g | gout | logden | a_dst] stat bands, reduce da_dst
    block-locally (one column per channel)."""
    acc_precision = _precision(t_dtype)

    def _kernel(cb_ref, gtab_ref, pe_hbm, dst_hbm, dadst_ref, pe_buf, id_buf,
                sems):
        i = pl.program_id(0)
        row0 = i * _R
        k_pad = _cdiv(n_ch * _band_for(kz), 128) * 128
        dadst_ref[:] = jnp.zeros_like(dadst_ref)
        drow = (
            jax.lax.broadcasted_iota(jnp.int32, (_R, chunk), dimension=0)
            + row0
        )
        sel_s, sel3, ones_z, _, _, _ = _selectors(kz, n_ch, k_pad, chunk,
                                                  t_dtype)
        gtab_blk = gtab_ref[:].astype(t_dtype)  # [R, n_ch*KB]

        start, wait = _stream_dma(pe_hbm, dst_hbm, pe_buf, id_buf, sems, chunk)

        def body(c, slot):
            wait(c, slot)
            zc = pe_buf[slot]  # [chunk, n_ch*KB] t_dtype
            oh = (id_buf[slot] == drow).astype(t_dtype)  # [R, chunk]
            G = jax.lax.dot_general(
                oh, gtab_blk,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=acc_precision,
            )  # [chunk, n_ch*KB] f32 — exact row select
            a_src_all = jax.lax.dot_general(
                zc, sel_s,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=acc_precision,
            )  # [chunk, 8]
            S3 = jax.lax.dot_general(
                G, sel3,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )  # [chunk, 24]: [gout | logden | a_dst] (bf16x3 select of f32
            # stats: ~2^-21 relative — gradient-path noise class)
            pre = S3[:, 16:24] + a_src_all
            act = _leaky(pre, negative_slope)
            att = jnp.exp(jnp.minimum(act - S3[:, 8:16], 60.0))
            datt = jax.lax.dot_general(
                (G * zc).astype(t_dtype), ones_z,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=acc_precision,
            )  # [chunk, 8] = per-channel g_e . z_e
            dalpha = att * (datt - S3[:, :8])
            dpre_all = dalpha * jnp.where(pre > 0, 1.0, negative_slope)
            # sentinel / out-of-block edges gather an all-zero stat row:
            # datt = gout = 0 => dpre = 0 before the mask
            dadst_ref[:] += jax.lax.dot_general(
                oh, dpre_all.astype(t_dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=acc_precision,
            )  # [R, 8] (cols >= n_ch reduce garbage of zero-selected
            # channels: a_src_all = 0, S3 = 0 => dpre = att*0 = 0)

        _chunk_loop(cb_ref, start, body)

    return _kernel


def _make_bwd_src_kernel(chunk, kz, n_ch, t_dtype, negative_slope):
    """Per src block over the SRC-SORTED stream: every real edge's source
    row lies in this block (full sort), so the [z | a_src] bands re-gather
    through ONE in-block one-hot; the dst-keyed stat bands arrive as the
    XLA-gathered stream.  Recomputes att/dpre ([chunk, 8] wide) and
    scatter-adds [att*g | dpre] per channel into the block's dpacked
    rows."""
    acc_precision = _precision(t_dtype)

    def _kernel(cb_ref, packed_ref, st_hbm, sid_hbm, dpk_ref, st_buf, id_buf,
                sems):
        i = pl.program_id(0)
        row0 = i * _R
        k_pad = _cdiv(n_ch * _band_for(kz), 128) * 128
        dpk_ref[:] = jnp.zeros_like(dpk_ref)
        srow = (
            jax.lax.broadcasted_iota(jnp.int32, (_R, chunk), dimension=0)
            + row0
        )
        sel_s, sel3, ones_z, expand, is_s, lt_z = _selectors(
            kz, n_ch, k_pad, chunk, t_dtype
        )
        packed_blk = packed_ref[:]  # [R, n_ch*KB] t_dtype

        start, wait = _stream_dma(st_hbm, sid_hbm, st_buf, id_buf, sems, chunk)

        def body(c, slot):
            wait(c, slot)
            stc = st_buf[slot]  # [chunk, n_ch*KB] t_dtype (rounded stats)
            oh_t = (id_buf[slot] == srow).astype(t_dtype)  # [R, chunk]
            zcat = jax.lax.dot_general(
                oh_t, packed_blk,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=acc_precision,
            )  # [chunk, n_ch*KB] f32 — boundary-chunk edges of the
            # adjacent block read zeros here; their ct columns are garbage
            # but the same one-hot zeroes their contribution below
            zcat_t = zcat.astype(t_dtype)
            a_src_all = jax.lax.dot_general(
                zcat_t, sel_s,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=acc_precision,
            )  # [chunk, 8]
            S3 = jax.lax.dot_general(
                stc, sel3.astype(t_dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=acc_precision,
            )  # [chunk, 24]: [gout | logden | a_dst]
            pre = S3[:, 16:24] + a_src_all
            act = _leaky(pre, negative_slope)
            att = jnp.exp(jnp.minimum(act - S3[:, 8:16], 60.0))
            datt = jax.lax.dot_general(
                (stc * zcat_t), ones_z,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=acc_precision,
            )  # [chunk, 8]
            dalpha = att * (datt - S3[:, :8])
            dpre_all = dalpha * jnp.where(pre > 0, 1.0, negative_slope)
            ATT = jax.lax.dot_general(
                att.astype(t_dtype), expand,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=acc_precision,
            ).astype(t_dtype)  # [chunk, k_pad]
            DPRE = jax.lax.dot_general(
                dpre_all.astype(t_dtype), expand,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=acc_precision,
            ).astype(t_dtype)
            ct = jnp.where(
                is_s, DPRE,
                jnp.where(lt_z, stc * ATT, jnp.zeros((), t_dtype)),
            )  # [chunk, k_pad] = [att*g | dpre]
            dpk_ref[:] += jax.lax.dot_general(
                oh_t, ct,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=acc_precision,
            )  # [R, k_pad]

        _chunk_loop(cb_ref, start, body)

    return _kernel


def _pad_stream(arr, ids, num_rows, chunk):
    """Pad the edge stream to a chunk multiple (ids pad with the sentinel,
    value rows with zeros)."""
    e = ids.shape[0]
    e_pad = max(chunk, _cdiv(e, chunk) * chunk)
    if e_pad != e:
        arr = jnp.pad(arr, ((0, e_pad - e), (0, 0)))
        ids = jnp.pad(ids, (0, e_pad - e), constant_values=num_rows)
    return arr, ids.astype(jnp.int32), e_pad


def _run_stream_kernel(kernel, chunk, cb, blk_tab, stream, ids, n_blocks,
                       out_cols, out_dtype, interpret, flops, bytes_):
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # edge stream (manual DMA)
        pl.BlockSpec(memory_space=pl.ANY),  # ids (manual DMA)
    ]
    args = (stream, ids)
    if blk_tab is not None:
        in_specs.insert(
            0,
            pl.BlockSpec(
                (_R, blk_tab.shape[1]), lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        args = (blk_tab,) + args
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (_R, out_cols), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, stream.shape[1]), stream.dtype),
            pltpu.VMEM((2, 1, chunk), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * _R, out_cols), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_, transcendentals=ids.shape[1],
        ),
    )(cb, *args)


def _stream_forward(packed_e, adst2, dst, num_rows, kz, n_ch,
                    negative_slope, interpret, t_dtype):
    """Returns the raw [n_out, n_ch*KB] f32 accumulator (per-channel s in
    band column kz, unnormalized, self-loop terms NOT included)."""
    k_pad, n_blocks, n_out = _layout(num_rows, kz, n_ch)
    itemsize = 2 if t_dtype == jnp.bfloat16 else 4
    chunk = _chunk_for(n_ch, itemsize, _band_for(kz))
    packed_e, dst, e_pad = _pad_stream(packed_e, dst, num_rows, chunk)
    cb = _block_chunk_bounds(dst, n_blocks, chunk)
    return _run_stream_kernel(
        _make_fwd_kernel(chunk, kz, n_ch, t_dtype, negative_slope),
        chunk, cb, adst2, packed_e, dst.reshape(1, -1), n_blocks, k_pad,
        jnp.float32, interpret,
        flops=2 * e_pad * k_pad * 2 * _R,
        bytes_=e_pad * (k_pad * itemsize + 4) + n_out * k_pad * 12,
    )


def _stream_bwd_dst(gtab_blocks, packed_e, dst, num_rows, kz, n_ch,
                    negative_slope, interpret, t_dtype):
    k_pad, n_blocks, n_out = _layout(num_rows, kz, n_ch)
    itemsize = 2 if t_dtype == jnp.bfloat16 else 4
    chunk = _chunk_for(n_ch, itemsize, _band_for(kz), bwd=True)
    packed_e, dst, e_pad = _pad_stream(packed_e, dst, num_rows, chunk)
    cb = _block_chunk_bounds(dst, n_blocks, chunk)
    out_cols = max(8, _cdiv(n_ch, 8) * 8)
    out = _run_stream_kernel(
        _make_bwd_dst_kernel(chunk, kz, n_ch, out_cols, t_dtype,
                             negative_slope),
        chunk, cb, gtab_blocks, packed_e, dst.reshape(1, -1), n_blocks,
        out_cols, jnp.float32, interpret,
        flops=2 * e_pad * k_pad * 2 * _R,
        bytes_=e_pad * (k_pad * itemsize + 4) + n_out * k_pad * 8,
    )
    return out[:num_rows, :n_ch]  # [N, n_ch]


def _stream_bwd_src(packed_blocks, st_e, src_sorted, num_rows, kz, n_ch,
                    negative_slope, interpret, t_dtype):
    k_pad, n_blocks, n_out = _layout(num_rows, kz, n_ch)
    itemsize = 2 if t_dtype == jnp.bfloat16 else 4
    chunk = _chunk_for(n_ch, itemsize, _band_for(kz), bwd=True)
    st_e, sid, e_pad = _pad_stream(st_e, src_sorted, num_rows, chunk)
    cb = _block_chunk_bounds(sid, n_blocks, chunk)
    return _run_stream_kernel(
        _make_bwd_src_kernel(chunk, kz, n_ch, t_dtype, negative_slope),
        chunk, cb, packed_blocks, st_e, sid.reshape(1, -1), n_blocks, k_pad,
        jnp.float32, interpret,
        flops=2 * e_pad * k_pad * 4 * _R,
        bytes_=e_pad * (k_pad * itemsize + 4) + n_out * k_pad * 12,
    )


def _loop_terms(packed, a_dst_r, mhat, num_rows, kz, n_ch, negative_slope):
    """Per-row analytic self-loop quantities, per channel: rounded z
    [n_ch, N, kz], loop logit pre-activation [n_ch, N] and
    p = exp(act − m-hat) [n_ch, N]."""
    kb = _band_for(kz)
    bands = packed[:num_rows, : n_ch * kb].reshape(num_rows, n_ch, kb)
    z_r = jnp.transpose(bands[:, :, :kz], (1, 0, 2)).astype(jnp.float32)
    asr = bands[:, :, kz].T.astype(jnp.float32)  # [n_ch, N]
    pre = a_dst_r + asr
    act = _leaky(pre, negative_slope)
    p = jnp.exp(jnp.minimum(act - mhat, 60.0))
    return z_r, pre, p


def _edge_terms(packed_e, a_dst_r, mhat, dst, num_rows, kz, n_ch,
                negative_slope):
    """Per-edge p / z (XLA): shared by the fallback forward and backward.
    Returns (p [E, n_ch], z_e [E, n_ch, kz], sd [E])."""
    e = dst.shape[0]
    sd = jnp.minimum(dst, num_rows - 1)
    real = (dst < num_rows)[:, None]
    kb = _band_for(kz)
    bands = packed_e[:, : n_ch * kb].reshape(e, n_ch, kb).astype(jnp.float32)
    a_src_e = bands[:, :, kz]  # [E, n_ch]
    pre = a_dst_r.T[sd] + a_src_e
    act = _leaky(pre, negative_slope)
    p = jnp.where(real, jnp.exp(jnp.minimum(act - mhat.T[sd], 60.0)), 0.0)
    return p, bands[:, :, :kz], sd, pre, real


def _use_stream_kernels(interpret):
    from . import config as _cfg

    return interpret or _cfg.resolve(None, _on_tpu())


def _fwd_common(z, a_src, a_dst, src, dst, num_rows, kz, n_ch, self_loops,
                negative_slope, interpret, transport, psum_axis=None):
    """z: [n_ch, N, kz]; a_src/a_dst: [n_ch, N].

    psum_axis: when set, src/dst are ONE SHARD of an edge-parallel split
    (parallel/edge_parallel.py) and the [N]-keyed numerator / softmax
    denominator partials are psum'd over that mesh axis before
    normalization; the analytic self-loop term is added AFTER the psum
    (replicated node-level math, counted exactly once).  The bound shift
    m-hat depends only on replicated node tables, so every shard uses the
    identical shift and partial sums combine exactly."""
    t_dtype = jnp.bfloat16 if transport == "bf16" else jnp.float32
    k_pad, n_blocks, n_out = _layout(num_rows, kz, n_ch)
    kb = _band_for(kz)
    bands = jnp.zeros((num_rows, n_ch, kb), t_dtype)
    bands = bands.at[:, :, :kz].set(
        jnp.transpose(z, (1, 0, 2)).astype(t_dtype)
    )
    bands = bands.at[:, :, kz].set(a_src.T.astype(t_dtype))
    packed = jnp.zeros((n_out, k_pad), t_dtype).at[
        :num_rows, : n_ch * kb
    ].set(bands.reshape(num_rows, n_ch * kb))
    # a_dst rides the transport dtype through the kernels' block tables, so
    # it is rounded ONCE here and the same value reaches forward and both
    # backward recomputations (the flash kernels' pre-rounding contract)
    a_dst_r = a_dst.astype(t_dtype).astype(jnp.float32)  # [n_ch, N]
    asr = bands[:, :, kz].T.astype(jnp.float32)  # [n_ch, N]
    smax = jnp.max(asr, axis=1, keepdims=True) if num_rows > 0 else 0.0
    mhat = _leaky(a_dst_r + smax, negative_slope)
    mhat = mhat.astype(t_dtype).astype(jnp.float32)
    packed_e = packed[src]  # XLA row gather — the one random-access op
    if dst.shape[0] == 0:
        num = jnp.zeros((n_ch, num_rows, kz), jnp.float32)
        s = jnp.zeros((n_ch, num_rows), jnp.float32)
    elif _use_stream_kernels(interpret):
        # [n_out, 16]: cols c = a_dst of channel c, cols 8 + c = m-hat
        adst2 = (
            jnp.zeros((n_out, 16), jnp.float32)
            .at[:num_rows, :n_ch].set(a_dst_r.T)
            .at[:num_rows, 8 : 8 + n_ch].set(mhat.T)
        )
        acc = _stream_forward(
            packed_e, adst2, dst, num_rows, kz, n_ch, negative_slope,
            interpret, t_dtype,
        )
        acc_b = acc[:num_rows, : n_ch * kb].reshape(num_rows, n_ch, kb)
        num = jnp.transpose(acc_b[:, :, :kz], (1, 0, 2))  # [n_ch, N, kz]
        s = acc_b[:, :, kz].T  # [n_ch, N]
    else:
        # XLA fallback (off-TPU meshes / FORCE_PALLAS=False): identical
        # math over the rounded packed stream
        p, z_e, sd, _, _ = _edge_terms(
            packed_e, a_dst_r, mhat, dst, num_rows, kz, n_ch, negative_slope
        )
        num = jnp.transpose(
            jax.ops.segment_sum(p[:, :, None] * z_e, sd,
                                num_segments=num_rows),
            (1, 0, 2),
        )
        s = jax.ops.segment_sum(p, sd, num_segments=num_rows).T
    if psum_axis is not None:
        num = jax.lax.psum(num, psum_axis)
        s = jax.lax.psum(s, psum_axis)
    if self_loops:
        z_r, _, p_l = _loop_terms(packed, a_dst_r, mhat, num_rows, kz, n_ch,
                                  negative_slope)
        num = num + p_l[:, :, None] * z_r
        s = s + p_l
    out = num / (s[:, :, None] + 1e-16)
    return out, packed, packed_e, a_dst_r, mhat, s, t_dtype


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(7, 8, 9, 10, 11, 12, 13))
def stream_gat_attention_batched(z, a_src, a_dst, src, dst, src_perm,
                                 src_sorted, num_rows, self_loops=True,
                                 negative_slope=0.2, interpret=False,
                                 transport="f32", psum_axis=None,
                                 psum_scale=1.0):
    """Batched single-head GAT attention for n_ch channels sharing ONE
    loop-free, block-monotone edge list, with the PyG implicit self-loop
    added analytically per channel when ``self_loops``.

    z: [n_ch, num_rows, kz]; a_src/a_dst: [n_ch, num_rows] f32; src/dst:
    int[E] (padding sentinel dst == num_rows); src_perm/src_sorted: the
    StepGraph's stable src sort.  Returns [n_ch, num_rows, kz].
    Differentiable in z, a_src, a_dst.

    psum_axis: edge-parallel mode — src/dst are this device's shard of
    the edge list; node-keyed partials (numerator, denominator, and in
    the backward dz/da_src/da_dst) psum over the named mesh axis, the
    analytic loop term is applied once on replicated math, and the
    off-TPU mesh falls back to an identical-math XLA path.

    psum_scale: 1/dp in edge-parallel mode.  The backward psums the
    incoming cotangent (the trainer's loss tail is batch-sharded, so it
    arrives as a per-device partial) and the edge partials, making the
    outputs replicated TOTALS; scaling them by 1/dp hands each device an
    equal share so the trainer's single final grads-psum restores exact
    totals for every parameter.  The same rule is consistent at every
    conv depth (an upstream step's cotangent arrives (1/dp)-scaled and
    replicated; the psum multiplies it back to the total)."""
    out, *_ = _fwd_common(
        z, a_src, a_dst, src, dst, num_rows, z.shape[2], z.shape[0],
        self_loops, negative_slope, interpret, transport, psum_axis,
    )
    return out


def _stream_fwd(z, a_src, a_dst, src, dst, src_perm, src_sorted, num_rows,
                self_loops, negative_slope, interpret, transport,
                psum_axis=None, psum_scale=1.0):
    out, packed, packed_e, a_dst_r, mhat, s, _ = _fwd_common(
        z, a_src, a_dst, src, dst, num_rows, z.shape[2], z.shape[0],
        self_loops, negative_slope, interpret, transport, psum_axis,
    )
    return out, (z, a_src, a_dst, src, dst, src_perm, src_sorted,
                 packed, packed_e, a_dst_r, mhat, s, out)


def _stream_bwd(num_rows, self_loops, negative_slope, interpret, transport,
                psum_axis, psum_scale, res, g):
    (z, a_src, a_dst, src, dst, src_perm, src_sorted,
     packed, packed_e, a_dst_r, mhat, s, out) = res
    n_ch, _, kz = z.shape
    t_dtype = jnp.bfloat16 if transport == "bf16" else jnp.float32
    k_pad, n_blocks, n_out = _layout(num_rows, kz, n_ch)
    g = g.astype(jnp.float32)  # [n_ch, N, kz]
    if psum_axis is not None:
        # the incoming cotangent may be a per-device PARTIAL (the edge
        # trainer's loss tail is batch-sharded); every edge must see the
        # TOTAL cotangent, so sum it first.  The outputs below then become
        # replicated totals, which psum_scale (1/dp at EVERY step) turns
        # into exactly the per-device share the trainer's single final
        # grads-psum restores.  (For steps whose cotangent was already the
        # (1/dp)-scaled replicated value from the step above, this psum
        # multiplies by dp — recovering the total — so the same rule is
        # consistent at every depth.)
        g = jax.lax.psum(g, psum_axis)
    logden = mhat + jnp.log(s + 1e-16)  # [n_ch, N]
    gout = jnp.sum(g * out, axis=2)  # [n_ch, N]

    n_tab = max(n_out, num_rows + 1)
    kb = _band_for(kz)
    gbands = jnp.zeros((n_tab, n_ch, kb), jnp.float32)
    gbands = gbands.at[:num_rows, :, :kz].set(jnp.transpose(g, (1, 0, 2)))
    gbands = gbands.at[:num_rows, :, kz].set(gout.T)
    gbands = gbands.at[:num_rows, :, kz + 1].set(logden.T)
    gbands = gbands.at[:num_rows, :, kz + 2].set(a_dst_r.T)
    gtab = jnp.zeros((n_tab, k_pad), jnp.float32).at[:, : n_ch * kb].set(
        gbands.reshape(n_tab, n_ch * kb)
    )

    if dst.shape[0] == 0:
        da_dst = jnp.zeros((n_ch, num_rows), jnp.float32)
        dz = jnp.zeros((n_ch, num_rows, kz), jnp.float32)
        da_src = jnp.zeros((n_ch, num_rows), jnp.float32)
    elif _use_stream_kernels(interpret):
        da_dst = _stream_bwd_dst(
            gtab[:n_out], packed_e, dst, num_rows, kz, n_ch, negative_slope,
            interpret, t_dtype,
        ).T  # [n_ch, N]
        # dst-keyed stats in src-sorted edge order — the backward's one
        # random-access op (sentinel dst reads the zero row num_rows).
        # Gathered from the transport-dtype view: halves the stream and
        # matches the rounding the dst-phase kernel's block cast applies.
        st_e = gtab.astype(t_dtype)[dst[src_perm]]
        dpk = _stream_bwd_src(
            packed, st_e, src_sorted, num_rows, kz, n_ch, negative_slope,
            interpret, t_dtype,
        )
        dpk_b = dpk[:num_rows, : n_ch * kb].reshape(num_rows, n_ch, kb)
        dz = jnp.transpose(dpk_b[:, :, :kz], (1, 0, 2))
        da_src = dpk_b[:, :, kz].T
    else:
        # XLA fallback: att/dpre recompute from the rounded stream +
        # segment reductions (mirrors the two kernel phases)
        p, z_e, sd, pre, real = _edge_terms(
            packed_e, a_dst_r, mhat, dst, num_rows, kz, n_ch, negative_slope
        )
        st = gtab.astype(t_dtype).astype(jnp.float32)[
            jnp.minimum(dst, num_rows)
        ][:, : n_ch * kb].reshape(dst.shape[0], n_ch, kb)
        g_e = st[:, :, :kz]
        gout_e = st[:, :, kz]
        logden_e = st[:, :, kz + 1]
        act = _leaky(pre, negative_slope)
        att = jnp.where(
            real, jnp.exp(jnp.minimum(act - logden_e, 60.0)), 0.0
        )  # [E, n_ch]
        datt = jnp.sum(g_e * z_e, axis=2)
        dalpha = att * (datt - gout_e)
        dpre_e = dalpha * jnp.where(pre > 0, 1.0, negative_slope)
        ss = jnp.minimum(src, num_rows - 1)
        src_ok = (src < num_rows)[:, None]
        dpre_e = jnp.where(src_ok, dpre_e, 0.0)
        dz = jnp.transpose(
            jax.ops.segment_sum(
                jnp.where(src_ok[:, :, None], att[:, :, None] * g_e, 0.0),
                ss, num_segments=num_rows,
            ),
            (1, 0, 2),
        )
        da_src = jax.ops.segment_sum(dpre_e, ss, num_segments=num_rows).T
        da_dst = jax.ops.segment_sum(dpre_e, sd, num_segments=num_rows).T

    if psum_axis is not None:
        # sum the edge partials over shards -> replicated totals
        dz = jax.lax.psum(dz, psum_axis)
        da_src = jax.lax.psum(da_src, psum_axis)
        da_dst = jax.lax.psum(da_dst, psum_axis)

    if self_loops:
        z_r, pre_l, p_l = _loop_terms(packed, a_dst_r, mhat, num_rows, kz,
                                      n_ch, negative_slope)
        att_l = jnp.exp(
            jnp.minimum(_leaky(pre_l, negative_slope) - logden, 60.0)
        )
        datt_l = jnp.sum(g * z_r, axis=2)
        dalpha_l = att_l * (datt_l - gout)
        dpre_l = dalpha_l * jnp.where(pre_l > 0, 1.0, negative_slope)
        da_dst = da_dst + dpre_l
        da_src = da_src + dpre_l
        dz = dz + att_l[:, :, None] * g

    if psum_axis is not None and psum_scale != 1.0:
        dz = dz * psum_scale
        da_src = da_src * psum_scale
        da_dst = da_dst * psum_scale
    return (dz.astype(z.dtype), da_src.astype(a_src.dtype),
            da_dst.astype(a_dst.dtype), None, None, None, None)


stream_gat_attention_batched.defvjp(_stream_fwd, _stream_bwd)


def stream_gat_attention(z, a_src, a_dst, src, dst, src_perm, src_sorted,
                         num_rows, self_loops=True, negative_slope=0.2,
                         interpret=False, transport="f32"):
    """Single-channel wrapper over the batched kernel (n_ch = 1).
    z: [num_rows, kz]; a_src/a_dst: [num_rows]."""
    out = stream_gat_attention_batched(
        z[None], a_src[None], a_dst[None], src, dst, src_perm, src_sorted,
        num_rows, self_loops, negative_slope, interpret, transport,
    )
    return out[0]


def stream_gat_reference(z, a_src, a_dst, src, dst, num_rows,
                         self_loops=True, negative_slope=0.2,
                         edge_keep=None, loop_keep=None, dropout=0.0):
    """Pure-XLA oracle with identical semantics (tests + the off-TPU /
    dropout fallback for `gat_loops` graphs).  edge_keep [E] / loop_keep
    [N] are optional attention-dropout keep masks (PyG drops each alpha
    independently; with materialized loop edges the loop alphas were
    dropped too, so the analytic loop gets its own mask)."""
    real = dst < num_rows
    safe_src = jnp.minimum(src, num_rows - 1)
    safe_dst = jnp.minimum(dst, num_rows - 1)
    pre = a_dst[safe_dst] + a_src[safe_src]
    act = jnp.where(real, _leaky(pre, negative_slope), -jnp.inf)
    m = jax.ops.segment_max(act, safe_dst, num_segments=num_rows)
    if self_loops:
        act_l = _leaky(a_dst + a_src, negative_slope)
        m = jnp.maximum(m, act_l)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.where(real, jnp.exp(act - m_safe[safe_dst]), 0.0)
    if self_loops:
        p_l = jnp.exp(act_l - m_safe)
    # softmax FIRST (denominator over the un-dropped p, incl. the loop
    # term), THEN drop normalized alphas without renormalizing — PyG 1.5
    # GATConv order (softmax -> F.dropout on alpha), matching the
    # loop-edge gat_apply path (round-4 ADVICE #1)
    s = jax.ops.segment_sum(p, safe_dst, num_segments=num_rows)
    if self_loops:
        s = s + p_l
    att = p / (s + 1e-16)[safe_dst]
    if dropout > 0.0 and edge_keep is not None:
        att = jnp.where(edge_keep, att / (1.0 - dropout), 0.0)
    msgs = att[:, None] * jnp.where(real[:, None], z[safe_src], 0.0)
    out = jax.ops.segment_sum(msgs, safe_dst, num_segments=num_rows)
    if self_loops:
        att_l = p_l / (s + 1e-16)
        if dropout > 0.0 and loop_keep is not None:
            att_l = jnp.where(loop_keep, att_l / (1.0 - dropout), 0.0)
        out = out + att_l[:, None] * z
    return out


def stream_gat_enabled(num_edges, dropout_active, use_pallas=None, kz=None,
                       n_ch=1):
    """Dispatch predicate for the streaming path: TPU backend, large edge
    list, no attention dropout (dropout routes to the XLA reference —
    correct at any scale; no published large-scale recipe trains GAT with
    attention dropout).  kz/n_ch, when given, enforce the kernels' hard
    layout limits (kz <= 125 feature columns per 128-col band, <= 8
    channels per batch — _layout asserts; round-4 ADVICE #2) so
    out-of-range configs fall back instead of crashing."""
    from . import config as _cfg

    eligible = not dropout_active
    if kz is not None and kz > 125:
        return False
    if n_ch > 8:
        return False
    return (
        _cfg.resolve(use_pallas, _on_tpu() and num_edges >= STREAM_MIN_EDGES)
        and eligible
    )
