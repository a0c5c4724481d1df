"""Edge gathers with MXU-kernel forward and scatter-kernel backward.

`x[src]` is the other half of message passing (the reference leaves it to
torch's CUDA gather inside every PyG propagate).  On TPU, XLA lowers narrow
row gathers to a serial scalar loop (~1.4-8.5 GB/s measured), and the
autodiff transpose of a gather is an unsorted scatter-add that previously
required an E->E permutation gather (`ct[src_perm]`) — the single hottest
op of the fused PEAGAT step (tools/profile_step.py).

Both directions now ride one-hot MXU kernels (ops/pallas_segment.py):

  forward : localized-gather kernel — streams edge chunks, resolves each
            against its 128-row windows of x (graph.py's (dst//128, src)
            block order makes src window-local; correctness never depends
            on locality)
  backward: localized scatter-add — VMEM-resident accumulator, no
            permutation; falls back to `segment_sum(ct[src_perm],
            src_sorted)` (sorted -> MXU segment kernel) when the node table
            is too large for VMEM.

Padding edges carry zero cotangent (their forward messages are zeroed by
w==0 / dropped by out-of-bounds destination scatters), so their src=0
placement contributes nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .pallas_segment import (
    _broadcast_forward,
    _on_tpu,
    localized_scatter_add_pallas,
    scatter_fits_vmem,
    segment_sum_auto,
    sorted_broadcast_pallas,
)


def _gather_forward(x, idx, n, span=0.0):
    from . import config as _cfg

    k = x.shape[-1] if x.ndim == 2 else 0
    use_pallas = _cfg.resolve(
        None,
        _on_tpu() and x.ndim == 2 and k <= 128 and idx.shape[0] >= 65536
        and span <= _cfg.GATHER_SPAN_MAX,
    ) and (x.ndim == 2 and 0 < k <= 128)
    if use_pallas:
        return _broadcast_forward(x, idx, n, False)
    return x[idx]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def gather_rows(x, idx, perm, idx_sorted, n, span=0.0):
    """x[idx] with a kernel-dispatched forward and scatter-add backward.
    n = x.shape[0] (static); span = StepGraph.src_span locality metric —
    past ops.config.GATHER_SPAN_MAX the forward uses the XLA gather engine
    instead of the localized one-hot kernel (sparse graphs, ML-25M scale)."""
    return _gather_forward(x, idx, n, span)


def _fwd(x, idx, perm, idx_sorted, n, span):
    return _gather_forward(x, idx, n, span), (idx, perm, idx_sorted, jnp.zeros((0,), x.dtype))


def _bwd(n, span, res, ct):
    from . import config as _cfg

    idx, perm, idx_sorted, dtype_probe = res
    shape = ct.shape
    ct2 = ct.reshape(shape[0], -1)
    k = ct2.shape[1]
    use_scatter = _cfg.resolve(
        None,
        _on_tpu() and k <= 128 and ct2.shape[0] >= 65536 and scatter_fits_vmem(n, k),
    ) and (k <= 128 and scatter_fits_vmem(n, k))
    if use_scatter:
        gx = localized_scatter_add_pallas(
            ct2, idx, n, transport=_cfg.SEGSUM_TRANSPORT
        )
    else:
        gx = segment_sum_auto(ct2[perm], idx_sorted, n)
    # accumulation is f32; the cotangent must match the primal dtype
    # (bf16 under the bf16 message-transport config)
    gx = gx.reshape((n,) + shape[1:]).astype(dtype_probe.dtype)
    return (gx, None, None, None)


gather_rows.defvjp(_fwd, _bwd)


def gather_src(x, g):
    """Gather per-edge source rows with the kernel-dispatched paths."""
    return gather_rows(
        x, g.src, g.src_perm, g.src_sorted, x.shape[0],
        getattr(g, "src_span", 0.0),
    )


def gather_dst(x, g):
    """Gather per-edge destination rows; dst is block-monotone, so both the
    localized-gather forward and the scatter/segment backward apply.  Narrow
    x (<= 8 columns) routes to the broadcast kernel wrapper (whose VJP is a
    dst-keyed segment-sum with no permutation at all)."""
    from . import config as _cfg

    k = 1 if x.ndim == 1 else x.shape[-1]
    use_pallas = _cfg.resolve(
        None, _on_tpu() and x.ndim <= 2 and k <= 8 and g.dst.shape[0] >= 65536
    ) and (x.ndim <= 2 and k <= 8)
    if use_pallas:
        return sorted_broadcast_pallas(x, g.dst, x.shape[0])
    ar = jnp.arange(g.dst.shape[0], dtype=jnp.int32)
    return gather_rows(x, g.dst, ar, g.dst, x.shape[0])
