"""Batched flash-GAT for channel groups sharing ONE edge list (small-N).

The reference's metapath table reuses a single edge list across several
channels (ML-small: 7 of the 9 second steps ride the identical
item->user interaction graph — utils/general_utils.py:300-313; the conv
math per channel is PyG 1.5 GATConv, models/peagat.py:14-21).  The fused
union path (graph.fuse_step_graphs + ops/flash_gat.py) replays those
shared edges once PER CHANNEL over a C*N virtual node space — at bench
scale that makes the second PEA step process ~9x more edge-channel pairs
than distinct edges exist, and the per-chunk one-hot builds (the dominant
VPU cost of every gather/scatter kernel) are paid per copy.

This module processes each shared edge list ONCE for up to 8 channels:

  * the per-channel ``[z | a_src]`` tables ride one packed column-major
    table of ``n_ch`` bands (band stride kz+1; the backward's [g | gout]
    bands reuse the same stride so g*z stays band-aligned, and its
    logden / a_dst stats ride a separate [16, N] side table),
  * the grid is chunk-major over edge chunks with the packed table, the
    [16, N] ``[a_dst | m-hat]`` table and the output accumulator
    VMEM-RESIDENT for the whole grid (this is the small-N regime:
    everything fits, HBM traffic is just the edge ids),
  * source rows are gathered with one-hot window matmuls built ONCE per
    chunk and shared by every channel; all per-channel scalar math runs
    [8, chunk]-wide through static selector matmuls (the
    ops/stream_gat.py trick, transposed to this module's column-major
    edge layout),
  * backward is ONE kernel: dst-stat gather, att/dpre recompute, the
    src-side cotangent scatter into a VMEM accumulator AND the da_dst
    reduction — no [E, *] HBM intermediates at all.

Semantics per channel are exactly ops/flash_gat.flash_gat_attention
(bound-shift softmax, +1e-16 denominator guard) over a loop-MATERIALIZED
block-monotone edge list — the small-scale graph layout
(graph.build_gat_graph analytic_loops=False).  Dispatch:
models/pea.build_hybrid_gat_plan groups channels by StepGraph identity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_segment import _BR, _cdiv, _chunk_window_meta, _on_tpu

# Edge-chunk size for the chunk-major grid.  1024 measured fastest on
# v5e at bench shapes (2048 within 3%).
_FC = 1024

# Total VMEM budget for the grid-resident tables + accumulators (leave
# room for the double-buffered id blocks and kernel temporaries in the
# v5e's ~16 MiB scoped VMEM).
_VMEM_BUDGET = 10 * 1024 * 1024


def _band(kz):
    """Per-channel band stride: [z (kz) | a_src] forward, [g | gout]
    backward — kz+1 columns, so 7 channels at kz=16 stay within ONE
    128-lane tile (a kz+3 stride measured ~1.5x slower per edge: every
    [k_pad, chunk] elementwise op pays physical lanes in 128-tiles).
    The backward's remaining per-channel stats (logden, a_dst) ride a
    separate [16, N] table gathered through the same dst one-hots."""
    return kz + 1


def _layout(num_rows, kz, n_ch):
    bz = _band(kz)
    k_pad = n_ch * bz
    # src windows may start at any _BR-aligned row <= the sentinel and
    # read _BR rows; pad so every window slice stays in bounds
    n_src_pad = _cdiv(num_rows + 1, _BR) * _BR + _BR
    n_pad = _cdiv(num_rows + 1, _BR) * _BR
    return bz, k_pad, n_src_pad, n_pad


def _phys_lanes(k):
    return _cdiv(k, 128) * 128


def _vmem_bytes(num_rows, kz, n_ch, itemsize):
    """Worst-case (backward) grid-resident VMEM estimate in physical bytes."""
    bz, k_pad, n_src_pad, n_pad = _layout(num_rows, kz, n_ch)
    packed = _cdiv(k_pad, 8) * 8 * n_src_pad * itemsize
    gtab = _cdiv(k_pad, 8) * 8 * n_pad * 4  # f32 [g | gout] bands
    stats = 16 * n_pad * 4  # [logden | a_dst] side table
    dpk = n_pad * _phys_lanes(k_pad) * 4
    dadst = n_pad * 128 * 4
    bufs = 2 * (2 * _FC * 4)  # double-buffered id blocks (src+dst)
    return packed + gtab + stats + dpk + dadst + bufs


def batch_gat_enabled(num_rows, kz, n_ch, dropout_active, use_pallas=None):
    """Dispatch predicate: 2..8 channels sharing one loop-materialized
    edge list, no attention dropout, every grid-resident table within the
    VMEM budget, TPU backend (or forced via ops.config)."""
    from . import config as _cfg

    if dropout_active or not (2 <= n_ch <= 8):
        return False
    if getattr(_cfg, "BATCH_GAT", None) is False:
        return False
    itemsize = 2 if _cfg.SEGSUM_TRANSPORT == "bf16" else 4
    if _vmem_bytes(num_rows, kz, n_ch, itemsize) > _VMEM_BUDGET:
        return False
    if getattr(_cfg, "BATCH_GAT", None) is True:
        return True
    return _cfg.resolve(use_pallas, _on_tpu())


def _precision(t_dtype):
    return (
        jax.lax.Precision.DEFAULT
        if t_dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )


def _selectors(kz, n_ch, k_pad, t_dtype):
    """Static selector matrices over the band layout (built from iota at
    block entry; 0/1 entries are exact in any dtype):

      sel_s  [8, k_pad]: row c picks band c's column kz (a_src fwd /
                         gout in the backward's [g | gout] bands)
      ones_z [8, k_pad]: row c = 1 over band c's columns < kz
      expand [k_pad, 8]: column c broadcasts over band c's rows
    """
    bz = _band(kz)
    ch8 = jax.lax.broadcasted_iota(jnp.int32, (8, k_pad), dimension=0)
    col = jax.lax.broadcasted_iota(jnp.int32, (8, k_pad), dimension=1)
    band, off = col // bz, col % bz
    in_band = band == ch8
    sel_s = (in_band & (off == kz)).astype(t_dtype)
    ones_z = (in_band & (off < kz)).astype(t_dtype)
    expand = jnp.transpose((in_band).astype(t_dtype))  # [k_pad, 8]
    return sel_s, ones_z, expand


def _row_masks(kz, k_pad, chunk):
    bz = _band(kz)
    krow = jax.lax.broadcasted_iota(jnp.int32, (k_pad, chunk), dimension=0)
    off = krow % bz
    return off == kz, off < kz  # is_s, lt_z


def _row_base(chunk):
    """Shared window-row base for the one-hot compares (the scalar +start
    fuses into the iota; a (ids - start) == base form measured slower)."""
    return jax.lax.broadcasted_iota(jnp.int32, (_BR, chunk), dimension=0)


def _gather_windows(table_ref, ids, win0, n_win, k_rows, chunk, oh_dtype,
                    precision, base):
    """Accumulate table[:, ids] over the chunk's 128-row windows with
    one-hot MXU matmuls (exact row select)."""

    def body(w, acc):
        start = (win0 + w) * _BR
        oh = (ids == base + start).astype(oh_dtype)  # [BR, C]
        return acc + jax.lax.dot_general(
            table_ref[:, pl.ds(start, _BR)],
            oh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    return jax.lax.fori_loop(
        0, n_win, body, jnp.zeros((k_rows, chunk), jnp.float32), unroll=False
    )


def _make_fwd_kernel(chunk, kz, n_ch, k_pad, t_dtype, negative_slope):
    """Chunk-major batched forward.  Per chunk: gather the packed source
    bands through the chunk's src windows (one one-hot per window shared
    by all channels), then per dst window: gather [a_dst | m-hat], form
    p_c = exp(act_c − m-hat_c) [8, C]-wide, and scatter [p*z | p] per band
    into the VMEM-resident accumulator through the SAME dst one-hot.
    s_c rides band column kz; normalization happens outside."""
    prec = _precision(t_dtype)

    def _kernel(swm_ref, dwm_ref, adst_ref, packed_ref, sid_ref, did_ref,
                out_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        src_ids = sid_ref[:]  # [1, C]
        dst_ids = did_ref[:]  # [1, C]
        sel_s, _, expand = _selectors(kz, n_ch, k_pad, t_dtype)
        is_s, _ = _row_masks(kz, k_pad, chunk)
        base = _row_base(chunk)

        zacc = _gather_windows(
            packed_ref, src_ids, swm_ref[0, j], swm_ref[1, j], k_pad, chunk,
            t_dtype, prec, base,
        )  # [k_pad, C] f32: bands [z_c | a_src_c | 0 | 0]
        a_src_all = jax.lax.dot_general(
            sel_s.astype(jnp.float32), zacc,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [8, C] — exact select (one nonzero per row)
        zacc_t = zacc.astype(t_dtype)

        d_win0 = dwm_ref[0, j]
        d_nwin = dwm_ref[1, j]

        def dbody(w, _):
            start = (d_win0 + w) * _BR
            oh = (dst_ids == base + start).astype(t_dtype)  # [BR, C]
            A = jax.lax.dot_general(
                adst_ref[:, pl.ds(start, _BR)], oh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )  # [16, C]: rows 0..7 a_dst_c, rows 8..15 m-hat_c
            pre = A[0:8, :] + a_src_all
            act = jnp.where(pre > 0, pre, negative_slope * pre)
            # m-hat bounds every real logit; the clamp guards edges whose
            # dst lies OUTSIDE this window (their A row is 0 — the one-hot
            # zeroes their contribution, but inf*0 would be NaN)
            p_all = jnp.exp(jnp.minimum(act - A[8:16, :], 60.0))  # [8, C]
            P = jax.lax.dot_general(
                expand, p_all.astype(t_dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            ).astype(t_dtype)  # [k_pad, C]: p_c over band c
            wzp = jnp.where(is_s, P, zacc_t * P)  # [p*z | p | p*0 | p*0]
            out_ref[pl.ds(start, _BR), :] += jax.lax.dot_general(
                oh, wzp,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )  # [BR, k_pad]
            return ()

        jax.lax.fori_loop(0, d_nwin, dbody, (), unroll=False)

    return _kernel


def _make_bwd_kernel(chunk, kz, n_ch, k_pad, t_dtype, negative_slope):
    """Chunk-major batched backward, fully fused: dst-stat gather,
    att/dpre recompute, the per-band cotangent assembly, the src-side
    scatter into the VMEM dpk accumulator AND the da_dst reduction."""
    prec = _precision(t_dtype)

    def _kernel(swm_ref, dwm_ref, gtab_ref, stats_ref, packed_ref, sid_ref,
                did_ref, dpk_ref, dadst_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            dpk_ref[:] = jnp.zeros_like(dpk_ref)
            dadst_ref[:] = jnp.zeros_like(dadst_ref)

        src_ids = sid_ref[:]
        dst_ids = did_ref[:]
        sel_s, ones_z, expand = _selectors(kz, n_ch, k_pad, t_dtype)
        is_s, lt_z = _row_masks(kz, k_pad, chunk)
        base = _row_base(chunk)

        # ONE dst-window walk gathers the [g | gout] bands AND the
        # [logden | a_dst] side table through the same one-hot
        d_win0 = dwm_ref[0, j]
        d_nwin = dwm_ref[1, j]

        def dgather(w, carry):
            G_acc, S_acc = carry
            start = (d_win0 + w) * _BR
            oh = (dst_ids == base + start).astype(jnp.float32)
            G_acc = G_acc + jax.lax.dot_general(
                gtab_ref[:, pl.ds(start, _BR)], oh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            S_acc = S_acc + jax.lax.dot_general(
                stats_ref[:, pl.ds(start, _BR)], oh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            return G_acc, S_acc

        G, S = jax.lax.fori_loop(
            0, d_nwin, dgather,
            (jnp.zeros((k_pad, chunk), jnp.float32),
             jnp.zeros((16, chunk), jnp.float32)),
            unroll=False,
        )  # G [k_pad, C]: [g | gout] bands; S [16, C]: logden_c / adst_c
        # src re-gather of the packed bands [z | a_src]
        zacc = _gather_windows(
            packed_ref, src_ids, swm_ref[0, j], swm_ref[1, j], k_pad, chunk,
            t_dtype, prec, base,
        )

        sf32 = jax.lax.Precision.HIGHEST
        a_src_all = jax.lax.dot_general(
            sel_s.astype(jnp.float32), zacc,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=sf32,
        )  # [8, C]
        gout_all = jax.lax.dot_general(
            sel_s.astype(jnp.float32), G,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=sf32,
        )
        logden_all = S[0:8, :]
        adst_all = S[8:16, :]

        pre = adst_all + a_src_all
        act = jnp.where(pre > 0, pre, negative_slope * pre)
        # sentinel / straddle edges gather all-zero stat bands: datt and
        # gout are 0 => dpre = att*0 = 0, provided att stays finite (+60)
        att = jnp.exp(jnp.minimum(act - logden_all, 60.0))  # [8, C]
        gz = (G * zacc.astype(jnp.float32)).astype(t_dtype)
        datt = jax.lax.dot_general(
            ones_z, gz,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # [8, C] = per-channel g_e . z_e
        dalpha = att * (datt - gout_all)
        dpre_all = dalpha * jnp.where(pre > 0, 1.0, negative_slope)  # [8, C]

        ATT = jax.lax.dot_general(
            expand, att.astype(t_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(t_dtype)  # [k_pad, C]
        DPRE = jax.lax.dot_general(
            expand, dpre_all.astype(t_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(t_dtype)
        ct = jnp.where(
            is_s, DPRE,
            jnp.where(lt_z, G.astype(t_dtype) * ATT, jnp.zeros((), t_dtype)),
        )  # [k_pad, C] = per band [att*g | dpre | 0 | 0]

        # src scatter: dpk[win, :] += oh_s @ ct^T  (fresh one-hots; window
        # walk count ~ src_span per chunk)
        s_win0 = swm_ref[0, j]
        s_nwin = swm_ref[1, j]

        def sbody(w, _):
            start = (s_win0 + w) * _BR
            oh = (src_ids == base + start).astype(t_dtype)
            dpk_ref[pl.ds(start, _BR), :] += jax.lax.dot_general(
                oh, ct,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )  # [BR, k_pad]
            return ()

        jax.lax.fori_loop(0, s_nwin, sbody, (), unroll=False)

        # da_dst: [BR, 8] blocks through the dst windows
        d_win0 = dwm_ref[0, j]
        d_nwin = dwm_ref[1, j]
        dpre_t = dpre_all.astype(t_dtype)

        def dbody(w, _):
            start = (d_win0 + w) * _BR
            oh = (dst_ids == base + start).astype(t_dtype)
            dadst_ref[pl.ds(start, _BR), :] += jax.lax.dot_general(
                oh, dpre_t,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )  # [BR, 8]
            return ()

        jax.lax.fori_loop(0, d_nwin, dbody, (), unroll=False)

    return _kernel


def _prep_edges(src, dst, num_rows, chunk):
    e = dst.shape[0]
    e_pad = max(chunk, _cdiv(e, chunk) * chunk)
    if e_pad != e:
        src = jnp.pad(src, (0, e_pad - e), constant_values=num_rows)
        dst = jnp.pad(dst, (0, e_pad - e), constant_values=num_rows)
    src = src.astype(jnp.int32)
    dst = dst.astype(jnp.int32)
    n_chunks = e_pad // chunk
    src_meta = _chunk_window_meta(src, n_chunks, chunk, num_rows)
    # dst spans include the sentinel row so pad-edge contributions land in
    # row num_rows (sliced off) instead of vanishing mid-kernel
    dst_meta = _chunk_window_meta(dst, n_chunks, chunk, num_rows + 1)
    return src, dst, e_pad, n_chunks, src_meta, dst_meta


def _pack_tables(z, a_src, a_dst, num_rows, kz, n_ch, negative_slope,
                 t_dtype):
    """packed_t [k_pad, n_src_pad] t_dtype (bands [z | a_src | 0 | 0]),
    adst_t [16, n_pad] f32 (rows 0..7 a_dst_c, 8..15 m-hat_c, both
    pre-rounded through the transport dtype), plus the rounded
    a_dst / m-hat [n_ch, N] f32 for the backward recompute."""
    bz, k_pad, n_src_pad, n_pad = _layout(num_rows, kz, n_ch)
    z_t = jnp.transpose(z, (0, 2, 1)).astype(t_dtype)  # [n_ch, kz, N]
    band = jnp.concatenate(
        [z_t, a_src[:, None, :].astype(t_dtype)], axis=1
    )  # [n_ch, bz, N]
    packed_t = jnp.pad(
        band.reshape(k_pad, num_rows), ((0, 0), (0, n_src_pad - num_rows))
    )
    a_dst_r = a_dst.astype(t_dtype).astype(jnp.float32)  # [n_ch, N]
    a_src_r = band[:, kz, :].astype(jnp.float32)  # rounded a_src
    smax = jnp.max(a_src_r, axis=1, keepdims=True)
    pre_b = a_dst_r + smax
    mhat = jnp.where(pre_b > 0, pre_b, negative_slope * pre_b)
    mhat = mhat.astype(t_dtype).astype(jnp.float32)
    adst_t = (
        jnp.zeros((16, n_pad), jnp.float32)
        .at[:n_ch, :num_rows].set(a_dst_r)
        .at[8 : 8 + n_ch, :num_rows].set(mhat)
    )
    return packed_t, adst_t, a_dst_r, mhat


def _fwd_impl(z, a_src, a_dst, src, dst, num_rows, kz, n_ch, negative_slope,
              interpret, transport):
    t_dtype = jnp.bfloat16 if transport == "bf16" else jnp.float32
    bz, k_pad, n_src_pad, n_pad = _layout(num_rows, kz, n_ch)
    packed_t, adst_t, a_dst_r, mhat = _pack_tables(
        z, a_src, a_dst, num_rows, kz, n_ch, negative_slope, t_dtype
    )
    if dst.shape[0] == 0:
        # zero-size grids leave the accumulator uninitialized; the result
        # is exact zeros with an empty softmax everywhere
        zero = jnp.zeros((n_ch, num_rows, kz), jnp.float32)
        return (zero, packed_t, a_dst_r, mhat,
                jnp.zeros((n_ch, num_rows), jnp.float32))
    src_p, dst_p, e_pad, n_chunks, src_meta, dst_meta = _prep_edges(
        src, dst, num_rows, _FC
    )
    itemsize = 2 if t_dtype == jnp.bfloat16 else 4
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (16, n_pad), lambda j, *_: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (k_pad, n_src_pad), lambda j, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, _FC), lambda j, *_: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _FC), lambda j, *_: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (n_pad, k_pad), lambda j, *_: (0, 0), memory_space=pltpu.VMEM
        ),
    )
    acc = pl.pallas_call(
        _make_fwd_kernel(_FC, kz, n_ch, k_pad, t_dtype, negative_slope),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, k_pad), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * e_pad * k_pad * (2 * _BR + 16),
            bytes_accessed=(
                e_pad * 8
                + k_pad * n_src_pad * itemsize
                + n_pad * (k_pad + 16) * 4
            ),
            transcendentals=e_pad * 8,
        ),
    )(src_meta, dst_meta, adst_t, packed_t,
      src_p.reshape(1, -1), dst_p.reshape(1, -1))
    acc_b = acc[:num_rows].reshape(num_rows, n_ch, bz)
    s = jnp.transpose(acc_b[:, :, kz])  # [n_ch, N]
    out = jnp.transpose(acc_b[:, :, :kz], (1, 0, 2)) / (
        s[:, :, None] + 1e-16
    )
    return out, packed_t, a_dst_r, mhat, s


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def batch_gat_attention(z, a_src, a_dst, src, dst, num_rows,
                        negative_slope=0.2, interpret=False,
                        transport="f32"):
    """Single-head GAT attention for n_ch channels sharing ONE
    loop-materialized, block-monotone edge list (padding sentinel
    ``dst == num_rows``).

    z: [n_ch, num_rows, kz]; a_src/a_dst: [n_ch, num_rows] f32.
    Per-channel semantics = ops/flash_gat.flash_gat_attention (PyG 1.5
    GATConv scatter-softmax with the +1e-16 guard, reference
    models/peagat.py:14-21).  Returns [n_ch, num_rows, kz].
    Differentiable in z, a_src, a_dst."""
    out, *_ = _fwd_impl(
        z, a_src, a_dst, src, dst, num_rows, z.shape[2], z.shape[0],
        negative_slope, interpret, transport,
    )
    return out


def _batch_fwd(z, a_src, a_dst, src, dst, num_rows, negative_slope,
               interpret, transport):
    out, packed_t, a_dst_r, mhat, s = _fwd_impl(
        z, a_src, a_dst, src, dst, num_rows, z.shape[2], z.shape[0],
        negative_slope, interpret, transport,
    )
    return out, (z, src, dst, packed_t, a_dst_r, mhat, s, out)


def _batch_bwd(num_rows, negative_slope, interpret, transport, res, g):
    z, src, dst, packed_t, a_dst_r, mhat, s, out = res
    n_ch, _, kz = z.shape
    t_dtype = jnp.bfloat16 if transport == "bf16" else jnp.float32
    bz, k_pad, n_src_pad, n_pad = _layout(num_rows, kz, n_ch)
    g = g.astype(jnp.float32)
    if dst.shape[0] == 0:
        zero = jnp.zeros((n_ch, num_rows), jnp.float32)
        return (jnp.zeros_like(z), zero.astype(jnp.float32),
                zero.astype(jnp.float32), None, None)

    logden = mhat + jnp.log(s + 1e-16)  # [n_ch, N]
    gout = jnp.sum(g * out, axis=2)  # [n_ch, N]
    # stat bands mirror the packed band stride: [g | gout], with g
    # pre-rounded to the transport dtype (the forward gathered a t_dtype
    # z, so datt sees identically rounded operands on both sides);
    # logden / a_dst ride the [16, n_pad] side table
    gband = jnp.concatenate(
        [
            jnp.transpose(g, (0, 2, 1)).astype(t_dtype).astype(jnp.float32),
            gout[:, None, :],
        ],
        axis=1,
    )  # [n_ch, bz, N]
    gtab = jnp.pad(
        gband.reshape(k_pad, num_rows), ((0, 0), (0, n_pad - num_rows))
    )
    stats = (
        jnp.zeros((16, n_pad), jnp.float32)
        .at[:n_ch, :num_rows].set(logden)
        .at[8 : 8 + n_ch, :num_rows].set(a_dst_r)
    )

    src_p, dst_p, e_pad, n_chunks, src_meta, dst_meta = _prep_edges(
        src, dst, num_rows, _FC
    )
    itemsize = 2 if t_dtype == jnp.bfloat16 else 4
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (k_pad, n_pad), lambda j, *_: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (16, n_pad), lambda j, *_: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (k_pad, n_src_pad), lambda j, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, _FC), lambda j, *_: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _FC), lambda j, *_: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (n_src_pad, k_pad), lambda j, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n_pad, 8), lambda j, *_: (0, 0), memory_space=pltpu.VMEM
            ),
        ),
    )
    dpk, dadst = pl.pallas_call(
        _make_bwd_kernel(_FC, kz, n_ch, k_pad, t_dtype, negative_slope),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_src_pad, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 8), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * e_pad * k_pad * (4 * _BR + 48),
            bytes_accessed=(
                e_pad * 8
                + k_pad * (n_src_pad * itemsize + n_pad * 4)
                + n_src_pad * k_pad * 4
                + n_pad * 32
            ),
            transcendentals=e_pad * 8,
        ),
    )(src_meta, dst_meta, gtab, stats, packed_t,
      src_p.reshape(1, -1), dst_p.reshape(1, -1))

    dpk_b = dpk[:num_rows].reshape(num_rows, n_ch, bz)
    dz = jnp.transpose(dpk_b[:, :, :kz], (1, 0, 2))  # [n_ch, N, kz]
    da_src = jnp.transpose(dpk_b[:, :, kz])  # [n_ch, N]
    da_dst = jnp.transpose(dadst[:num_rows, :n_ch])  # [n_ch, N]
    return (dz.astype(z.dtype), da_src, da_dst, None, None)


batch_gat_attention.defvjp(_batch_fwd, _batch_bwd)


def batch_gat_reference(z, a_src, a_dst, src, dst, num_rows,
                        negative_slope=0.2):
    """Pure-XLA oracle: per-channel flash_gat semantics over the shared
    (loop-materialized) edge list (tests + off-TPU fallback)."""
    from .segment import segment_softmax

    real = dst < num_rows
    safe_src = jnp.minimum(src, num_rows - 1)
    safe_dst = jnp.minimum(dst, num_rows - 1)

    def one(z_c, a_src_c, a_dst_c):
        pre = jnp.where(real, a_dst_c[safe_dst] + a_src_c[safe_src],
                        -jnp.inf)
        act = jnp.where(pre > 0, pre, negative_slope * pre)
        att = segment_softmax(act, dst, num_rows, indices_are_sorted=False)
        att = jnp.where(real, att, 0.0)
        msgs = att[:, None] * jnp.where(real[:, None], z_c[safe_src], 0.0)
        return jax.ops.segment_sum(msgs, dst, num_segments=num_rows)

    return jax.vmap(one)(z, a_src, a_dst)
