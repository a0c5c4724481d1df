"""Row-sharded embedding lookups with all-to-all ID exchange.

The reference keeps one dense ``Parameter(num_nodes, emb_dim)`` per model on
a single GPU (reference: graph_recsys_benchmark/models/base.py:156).  The
TPU-native scale-out row-shards that table across the mesh — and this module
supplies the missing piece: gathering arbitrary global rows from the sharded
table WITHOUT the GSPMD fallback of all-gathering the entire table every
step (SURVEY.md section 7.3 "Row-sharded embedding + all-to-all").

Two variants, both running inside ``shard_map`` over one mesh axis that
row-shards the table contiguously (device p owns rows [p*S, (p+1)*S)):

  sharded_lookup (dynamic ids — batch u/pos/neg/entity rows):
      sort ids -> dedupe -> bucket by owner -> all_to_all the deduped ID
      buckets -> each owner gathers its local rows -> reverse all_to_all ->
      un-permute.  The VJP is the exact transpose: bucket the cotangents by
      (owner, slot) with duplicate accumulation, all_to_all them back, and
      scatter-add into the local shard.  Two collectives move O(unique ids)
      rows instead of O(table) rows.

  static_lookup (static ids — the per-step edge src/dst sets):
      the dedupe/bucketing/exchange *plan* is computed host-side once at
      graph-build time (build_static_plan), so at run time ZERO ids cross
      the wire: one all_to_all moves only the requested rows.

Both drop out-of-capacity requests (JAX scatter 'drop' semantics); pass
``capacity >= min(num_ids, rows_per_shard)`` for guaranteed correctness or
use the measured plan capacity for static sets.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------- dynamic


def _dedupe_buckets(idx, S, num_shards, capacity):
    """Sort + dedupe ids, bucket by owner (= id // S).

    Returns (own, pos, order, send) where for sorted position k the id lives
    in bucket (own[k], pos[k]), `order` is the sorting permutation, and
    `send[p, :]` holds the deduped local slots requested from owner p.
    """
    order = jnp.argsort(idx)
    s = idx[order]
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (s[1:] != s[:-1]).astype(jnp.int32)]
    )
    uniq_rank = jnp.cumsum(first) - 1  # rank among uniques (dups share it)
    own = s // S
    slot = s - own * S
    per_owner = jax.ops.segment_sum(first, own, num_segments=num_shards)
    start = jnp.cumsum(per_owner) - per_owner
    pos = uniq_rank - start[own]
    send = jnp.zeros((num_shards, capacity), jnp.int32).at[own, pos].set(
        slot, mode="drop"
    )
    return own, pos, order, send


def _lookup_fwd_impl(table, idx, axis_name, num_shards, capacity):
    S = table.shape[0]
    own, pos, order, send = _dedupe_buckets(idx, S, num_shards, capacity)
    # exchange the deduped ID buckets: req[p] = slots peer p asks of me
    req = jax.lax.all_to_all(send, axis_name, 0, 0)
    rows = table[req.reshape(-1)].reshape(num_shards, capacity, table.shape[1])
    got = jax.lax.all_to_all(rows, axis_name, 0, 0)
    out_sorted = got[own, pos]
    inv = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0], dtype=order.dtype)
    )
    return out_sorted[inv], (own, pos, order, req)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def sharded_lookup(table, idx, axis_name, num_shards, capacity):
    """Gather global rows `idx` from the contiguously row-sharded `table`.

    table: float[S, D] — this device's shard (device p owns [p*S, (p+1)*S)).
    idx:   int32[B] global row ids in [0, num_shards*S).
    Returns float[B, D].  Must be called inside shard_map over `axis_name`.
    """
    out, _ = _lookup_fwd_impl(table, idx, axis_name, num_shards, capacity)
    return out


def _lookup_fwd(table, idx, axis_name, num_shards, capacity):
    out, res = _lookup_fwd_impl(table, idx, axis_name, num_shards, capacity)
    own, pos, order, req = res
    probe = jnp.zeros((0,), table.dtype)
    return out, (own, pos, order, req, table.shape[0], probe)


def _lookup_bwd(axis_name, num_shards, capacity, res, g):
    own, pos, order, req, S, probe = res
    d = g.shape[-1]
    g_sorted = g[order].astype(jnp.float32)
    # transpose of the un-permute + bucket-gather: accumulate duplicate ids
    buckets = jnp.zeros((num_shards, capacity, d), jnp.float32).at[own, pos].add(
        g_sorted, mode="drop"
    )
    back = jax.lax.all_to_all(buckets, axis_name, 0, 0)
    # unrequested bucket slots carry exactly 0 (never written), so the
    # scatter-add of their slot-0 placeholder rows is a no-op
    dtable = (
        jnp.zeros((S, d), jnp.float32)
        .at[req.reshape(-1)]
        .add(back.reshape(-1, d))
        .astype(probe.dtype)
    )
    return (dtable, None)


sharded_lookup.defvjp(_lookup_fwd, _lookup_bwd)


def lookup_overflowed(idx, S, num_shards, capacity):
    """Diagnostic: True iff some owner bucket exceeds `capacity` (requests
    beyond it are silently dropped)."""
    own = jnp.sort(idx) // S
    s = jnp.sort(idx)
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (s[1:] != s[:-1]).astype(jnp.int32)]
    )
    per_owner = jax.ops.segment_sum(first, own, num_segments=num_shards)
    return jnp.max(per_owner) > capacity


# ---------------------------------------------------------------- static


def build_static_plan(idx, S, num_shards, align=8):
    """Host-side exchange plan for a STATIC id set (per-step edge src/dst).

    idx: int[num_shards, E] — device d's global row requests (row d).
    Returns a dict of numpy arrays, each with leading device axis
    (shard over the mesh axis with PartitionSpec(axis, None, ...)):

      own  [P, E]       owner device of each request
      pos  [P, E]       slot of the request inside its (device, owner) bucket
      serve[P, P, cap]  serve[p, d] = local slots device p gathers for d
    plus the static ints capacity & S (python, not arrays).
    """
    idx = np.asarray(idx)
    P, E = idx.shape
    assert P == num_shards, (P, num_shards)
    own_e = np.empty((P, E), np.int32)
    pos_e = np.empty((P, E), np.int32)
    uniq = []
    cap = 1
    for d in range(P):
        u, inv = np.unique(idx[d], return_inverse=True)
        uo = u // S
        counts = np.bincount(uo, minlength=P)
        start = np.concatenate([[0], np.cumsum(counts)[:-1]])
        posu = np.arange(len(u)) - start[uo]
        own_e[d] = uo[inv]
        pos_e[d] = posu[inv]
        uniq.append((u, uo, posu))
        cap = max(cap, int(counts.max()) if len(counts) else 1)
    cap = -(-cap // align) * align
    serve = np.zeros((P, P, cap), np.int32)
    for d, (u, uo, posu) in enumerate(uniq):
        serve[uo, d, posu] = (u - uo.astype(np.int64) * S).astype(np.int32)
    return {
        "own": own_e,
        "pos": pos_e,
        "serve": serve,
        "capacity": int(cap),
        "S": int(S),
    }


def plan_arrays(plan):
    """The device-sharded arrays of a plan (pass through shard_map with
    spec P(axis, None...)); static ints stay python-side."""
    return {
        "own": jnp.asarray(plan["own"]),
        "pos": jnp.asarray(plan["pos"]),
        "serve": jnp.asarray(plan["serve"]),
    }


def _static_fwd_impl(table, own, pos, serve, axis_name, num_shards, capacity):
    rows = table[serve.reshape(-1)].reshape(num_shards, capacity, table.shape[1])
    got = jax.lax.all_to_all(rows, axis_name, 0, 0)
    return got[own, pos]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def static_lookup(table, own, pos, serve, axis_name, num_shards, capacity):
    """Gather rows of the sharded `table` for a static id set: `own`/`pos`
    address the receive buffer per request, `serve` lists the local slots
    this device ships to each peer.  One all_to_all of rows; no id traffic.

    Call inside shard_map with this device's slices of a build_static_plan.
    """
    return _static_fwd_impl(table, own, pos, serve, axis_name, num_shards, capacity)


def _static_fwd(table, own, pos, serve, axis_name, num_shards, capacity):
    out = _static_fwd_impl(table, own, pos, serve, axis_name, num_shards, capacity)
    probe = jnp.zeros((0,), table.dtype)
    return out, (own, pos, serve, table.shape[0], probe)


def _static_bwd(axis_name, num_shards, capacity, res, g):
    own, pos, serve, S, probe = res
    d = g.shape[-1]
    buckets = jnp.zeros((num_shards, capacity, d), jnp.float32).at[own, pos].add(
        g.astype(jnp.float32)
    )
    back = jax.lax.all_to_all(buckets, axis_name, 0, 0)
    dtable = (
        jnp.zeros((S, d), jnp.float32)
        .at[serve.reshape(-1)]
        .add(back.reshape(-1, d))
        .astype(probe.dtype)
    )
    return (dtable, None, None, None)


static_lookup.defvjp(_static_fwd, _static_bwd)
