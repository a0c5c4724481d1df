"""Edge gathers whose backward is a SORTED segment reduction.

`x[src]` is the other half of message passing; its autodiff transpose is a
scatter-add keyed by `src` — unsorted, since edge lists are sorted by
destination.  On TPU that unsorted scatter costs ~3x the sorted Pallas
reduction (tools/bench_segsum.py).  StepGraph precomputes the stable sort
of `src`; `gather_rows` rewrites the backward as

    grad_x = segment_sum(ct[src_perm], src_sorted)   # sorted -> MXU kernel

Padding edges carry zero cotangent (their forward messages are zeroed by
w==0 / dropped by out-of-bounds destination scatters), so their src=0
placement contributes nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .pallas_segment import segment_sum_auto


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def gather_rows(x, idx, perm, idx_sorted, n):
    """x[idx] with a sorted-segment-sum backward.  n = x.shape[0] (static)."""
    return x[idx]


def _fwd(x, idx, perm, idx_sorted, n):
    return x[idx], (idx, perm, idx_sorted)


def _bwd(n, res, ct):
    idx, perm, idx_sorted = res
    shape = ct.shape
    ct2 = ct.reshape(shape[0], -1)[perm]
    gx = segment_sum_auto(ct2, idx_sorted, n)
    # accumulation is f32; the cotangent must match the primal dtype
    # (bf16 under the bf16 message-transport config)
    gx = gx.reshape((n,) + shape[1:]).astype(ct.dtype)
    return (gx, None, None, None)


gather_rows.defvjp(_fwd, _bwd)


def gather_src(x, g):
    """Gather per-edge source rows with the sorted backward."""
    return gather_rows(x, g.src, g.src_perm, g.src_sorted, x.shape[0])


def gather_dst(x, g):
    """Gather per-edge destination rows; dst is already sorted, so the
    backward segment-sum needs no permutation.  Narrow x (<= 8 columns)
    routes to the Pallas sorted-broadcast kernel on TPU — XLA lowers
    narrow-row gathers to a serial scalar loop there (tools/profile_step.py:
    1.4 GB/s vs 73 GB/s for wide rows)."""
    from . import config as _cfg
    from .pallas_segment import _on_tpu, sorted_broadcast_pallas

    k = 1 if x.ndim == 1 else x.shape[-1]
    use_pallas = _cfg.resolve(
        None, _on_tpu() and x.ndim <= 2 and k <= 8 and g.dst.shape[0] >= 65536
    ) and (x.ndim <= 2 and k <= 8)
    if use_pallas:
        return sorted_broadcast_pallas(x, g.dst, x.shape[0])
    ar = jnp.arange(g.dst.shape[0], dtype=jnp.int32)
    return gather_rows(x, g.dst, ar, g.dst, x.shape[0])
