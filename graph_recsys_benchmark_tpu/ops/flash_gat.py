"""Fused flash-style GAT attention megakernel (single head).

Replaces the five-op edge pipeline of models/pea._fused_gat_step —
  packed src gather -> dst logit gather -> softmax stats -> stats
  broadcast -> weighted segment-sum
— with ONE Pallas pass that never materializes an [E, *] intermediate in
HBM.  This is the graph analog of flash attention: the grid walks 128-row
destination blocks, each block streams its edge chunks, gathers the packed
``[z | a_src]`` source rows with one-hot MXU matmuls (exact row selection,
ops/pallas_segment.py), forms the masked logits against the block's
``a_dst`` column, and maintains an online softmax — running max ``m``,
rescaled sum-of-exp ``s`` AND the rescaled weighted accumulator
``acc += exp(alpha - m) @ z_e^T`` — finalizing ``out = acc / s``.

The reference computes the same math as PyG 1.5 GATConv's
scatter-softmax + scatter-add (torch-scatter CUDA; SURVEY.md §2.4) —
semantics per graph_recsys_benchmark/models/peagat.py:14-21 and the +1e-16
denominator guard of PyG softmax.

Backward is composed from the existing kernels with flash-style
recompute (no [E] residuals except what they rebuild): one dst broadcast
of ``[g, g·out, m, s, a_dst]``, one src re-gather of ``[z | a_src]``,
per-edge ``datt/dalpha`` elementwise, one src scatter-add of
``[att·g | dpre]`` and one dst segment-sum for ``da_dst``.

Edge-order contract: ``dst`` must be block-monotone (``dst // 128``
non-decreasing — true for graph.py's (dst//128, src) block order and for
fully dst-sorted lists); ``src`` may be anything (window metadata is
per-chunk min/max — locality only buys speed).  Padding edges carry
``src == dst == num_rows`` and contribute exactly nothing.
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
    localized_scatter_add_pallas,
    scatter_fits_vmem,
    segment_sum_auto,
    sorted_broadcast_auto,
)

# Edge-chunk size: the fused kernel pays both the gather's window matmuls
# and a [R, C] exp per chunk, so it sits between the gather (2048) and
# stats (512) sweet spots.  1024 measured fastest on v5e at bench scale.
_FC = 1024


def _make_flash_kernel(chunk, k_pad, kz, t_dtype, negative_slope):
    gather_precision = (
        jax.lax.Precision.DEFAULT
        if t_dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    acc_precision = gather_precision

    def _kernel(cb_ref, wm_ref, adst_ref, packed_hbm, src_hbm, dst_hbm,
                out_ref, m_ref, s_ref, win_buf, sid_buf, did_buf, sem_win,
                sem_ids):
        i = pl.program_id(0)
        c_lo = cb_ref[i, 0]
        c_hi = cb_ref[i, 1]
        row0 = i * _R

        out_ref[:] = jnp.zeros_like(out_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        s_ref[:] = jnp.zeros_like(s_ref)

        drow_ids = (
            jax.lax.broadcasted_iota(jnp.int32, (_R, chunk), dimension=0) + row0
        )

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

            win0 = wm_ref[c, 0]
            n_win = wm_ref[c, 1]

            def start_win(w, wslot):
                pltpu.make_async_copy(
                    packed_hbm.at[:, pl.ds((win0 + w) * _BR, _BR)],
                    win_buf.at[wslot],
                    sem_win.at[wslot],
                ).start()

            def wait_win(w, wslot):
                pltpu.make_async_copy(
                    packed_hbm.at[:, pl.ds((win0 + w) * _BR, _BR)],
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
                    jax.lax.broadcasted_iota(jnp.int32, (_BR, chunk), dimension=0)
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

            a_src_e = zacc[kz : kz + 1, :]  # [1, C] f32
            pre = adst_ref[:, 0:1] + a_src_e  # [R, C]
            act = jnp.where(pre > 0, pre, negative_slope * pre)
            match = dst_ids == drow_ids  # [R, C]
            vals = jnp.where(match, act, -jnp.inf)
            cmax = jnp.max(vals, axis=1, keepdims=True)  # [R, 1]
            m_old = m_ref[:]
            m_new = jnp.maximum(m_old, cmax)
            f_old = jnp.where(jnp.isfinite(m_old), jnp.exp(m_old - m_new), 0.0)
            p = jnp.where(jnp.isfinite(vals), jnp.exp(vals - m_new), 0.0)
            m_ref[:] = m_new
            s_ref[:] = s_ref[:] * f_old + jnp.sum(p, axis=1, keepdims=True)
            out_ref[:] = out_ref[:] * f_old + jax.lax.dot_general(
                p.astype(t_dtype),
                zacc.astype(t_dtype),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=acc_precision,
            )
            return ()

        jax.lax.fori_loop(c_lo, c_hi, body, (), unroll=False)

        s_fin = s_ref[:]
        out_ref[:] = out_ref[:] / (s_fin + 1e-16)
        m_ref[:] = jnp.where(jnp.isfinite(m_ref[:]), m_ref[:], 0.0)

    return _kernel


def _flash_forward_impl(packed, a_dst, src, dst, num_rows, kz,
                        negative_slope, interpret, transport):
    """Returns (out[num_rows, kz], m[num_rows], s[num_rows])."""
    n, k = packed.shape
    assert k == kz + 1, "packed must be [z | a_src] with a single head"
    t_dtype = jnp.bfloat16 if transport == "bf16" else jnp.float32
    k_pad = max(8, _cdiv(k, 8) * 8)
    e = dst.shape[0]
    e_pad = _cdiv(e, _FC) * _FC
    n_chunks = e_pad // _FC
    n_blocks = _cdiv(num_rows, _R)
    n_out = n_blocks * _R
    # src windows may start at any _BR-aligned row <= the sentinel and read
    # _BR rows; pad the packed table so every window stays in bounds
    n_src_pad = _cdiv(num_rows + 1, _BR) * _BR + _BR

    packed_t = jnp.zeros((k_pad, n_src_pad), t_dtype).at[:k, :n].set(
        packed.astype(t_dtype).T
    )
    adst_col = jnp.zeros((n_out, 1), jnp.float32).at[:n, 0].set(
        a_dst.astype(jnp.float32)
    )
    if e_pad != e:
        src = jnp.pad(src, (0, e_pad - e), constant_values=num_rows)
        dst = jnp.pad(dst, (0, e_pad - e), constant_values=num_rows)
    src = src.astype(jnp.int32)
    dst = dst.astype(jnp.int32)

    chunk_bounds = _block_chunk_bounds(dst, n_blocks, _FC)
    win_meta = _chunk_window_meta(src, n_chunks, _FC, num_rows)

    itemsize = 2 if t_dtype == jnp.bfloat16 else 4
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((_R, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # packed_t stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # src ids
            pl.BlockSpec(memory_space=pl.ANY),  # dst ids
        ],
        out_specs=(
            pl.BlockSpec((_R, k_pad), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_R, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_R, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, k_pad, _BR), t_dtype),
            pltpu.VMEM((2, 1, _FC), jnp.int32),
            pltpu.VMEM((2, 1, _FC), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out, m, s = pl.pallas_call(
        _make_flash_kernel(_FC, k_pad, kz, t_dtype, negative_slope),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_out, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_out, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_out, 1), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            # windows stream once per chunk + the two accumulator matmuls
            flops=2 * e_pad * k_pad * (_BR + _R),
            bytes_accessed=(
                e_pad * 8
                + e_pad // _FC * 2 * _BR * k_pad * itemsize
                + n_out * (k_pad + 3) * 4
            ),
            transcendentals=e_pad * _R,
        ),
    )(chunk_bounds, win_meta, adst_col, packed_t,
      src.reshape(1, -1), dst.reshape(1, -1))
    return out[:num_rows, :kz], m[:num_rows, 0], s[:num_rows, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def flash_gat_attention(packed, a_dst, src, dst, src_perm, src_sorted,
                        num_rows, kz, negative_slope=0.2, interpret=False,
                        transport="f32"):
    """out[i] = Σ_e softmax_dst(leaky_relu(a_dst[i] + a_src[j]))_e · z[j]
    for single-head GAT over a block-monotone edge list.

    packed: [N, kz+1] = ``[z | a_src]`` (transport dtype or f32);
    a_dst: [N] f32 destination logits; src/dst: int[E] with padding
    sentinel ``num_rows``; src_perm/src_sorted: the StepGraph's src-sorted
    permutation (scatter fallback in the backward when the node table
    exceeds VMEM).  Differentiable in packed and a_dst."""
    out, _, _ = _flash_forward_impl(
        packed, a_dst, src, dst, num_rows, kz, negative_slope, interpret,
        transport,
    )
    return out


def _flash_fwd(packed, a_dst, src, dst, src_perm, src_sorted, num_rows, kz,
               negative_slope, interpret, transport):
    out, m, s = _flash_forward_impl(
        packed, a_dst, src, dst, num_rows, kz, negative_slope, interpret,
        transport,
    )
    return out, (packed, a_dst, src, dst, src_perm, src_sorted, m, s, out)


def _flash_bwd(num_rows, kz, negative_slope, interpret, transport, res, g):
    from . import config as _cfg

    packed, a_dst, src, dst, src_perm, src_sorted, m, s, out = res
    n = num_rows
    g = g.astype(jnp.float32)

    # one dst broadcast: per-edge [g_i, (g·out)_i, m_i, s_i, a_dst_i]
    table = jnp.concatenate(
        [
            g,
            jnp.sum(g * out, axis=1, keepdims=True),
            m[:, None],
            s[:, None],
            a_dst.astype(jnp.float32)[:, None],
        ],
        axis=1,
    )
    te = sorted_broadcast_auto(table, dst, n, exact=False)
    g_e, gout_e = te[:, :kz], te[:, kz]
    m_e, s_e, adst_e = te[:, kz + 1], te[:, kz + 2], te[:, kz + 3]

    # one src re-gather of the packed table (flash recompute)
    from .gather import gather_rows

    pk_e = gather_rows(packed, src, src_perm, src_sorted, n)
    z_e = pk_e[:, :kz].astype(jnp.float32)
    a_src_e = pk_e[:, kz].astype(jnp.float32)

    pre = adst_e + a_src_e
    act = jnp.where(pre > 0, pre, negative_slope * pre)
    att = jnp.where(dst < n, jnp.exp(act - m_e) / (s_e + 1e-16), 0.0)

    datt = jnp.sum(g_e * z_e, axis=1)
    dalpha = att * (datt - gout_e)
    dpre = dalpha * jnp.where(pre > 0, 1.0, negative_slope)

    # grads into source rows: dz_j = att·g_i, da_src_j = dpre — one scatter
    ct_src = jnp.concatenate([att[:, None] * g_e, dpre[:, None]], axis=1)
    k = kz + 1
    use_scatter = _cfg.resolve(
        None,
        _on_tpu() and k <= 128 and ct_src.shape[0] >= 65536
        and scatter_fits_vmem(n, k),
    ) and (k <= 128 and scatter_fits_vmem(n, k))
    if use_scatter:
        dpacked = localized_scatter_add_pallas(
            ct_src, src, n, transport=_cfg.SEGSUM_TRANSPORT
        )
    else:
        dpacked = segment_sum_auto(ct_src[src_perm], src_sorted, n)
    da_dst = segment_sum_auto(dpre[:, None], dst, n)[:, 0]

    return (dpacked.astype(packed.dtype), da_dst.astype(a_dst.dtype),
            None, None, None, None)


flash_gat_attention.defvjp(_flash_fwd, _flash_bwd)


def flash_gat_reference(packed, a_dst, src, dst, num_rows, kz,
                        negative_slope=0.2):
    """Pure-XLA oracle with identical semantics (tests + off-TPU path)."""
    from .segment import segment_softmax

    z = packed[:, :kz].astype(jnp.float32)
    a_src = packed[:, kz].astype(jnp.float32)
    safe_src = jnp.minimum(src, num_rows - 1)
    safe_dst = jnp.minimum(dst, num_rows - 1)
    real = dst < num_rows
    pre = jnp.where(real, a_dst[safe_dst] + a_src[safe_src], -jnp.inf)
    act = jnp.where(pre > 0, pre, negative_slope * pre)
    att = segment_softmax(act, dst, num_rows, indices_are_sorted=False)
    att = jnp.where(real, att, 0.0)
    msgs = att[:, None] * jnp.where(real[:, None], z[safe_src], 0.0)
    return jax.ops.segment_sum(msgs, dst, num_segments=num_rows)


def flash_gat_enabled(heads, dropout_active, num_edges, use_pallas=None):
    """Dispatch predicate: single head, no attention dropout, large edge
    list, TPU backend (or forced via ops.config.FORCE_PALLAS/use_pallas)."""
    from . import config as _cfg

    eligible = heads == 1 and not dropout_active
    return (
        _cfg.resolve(use_pallas, _on_tpu() and num_edges >= 65536) and eligible
    )
