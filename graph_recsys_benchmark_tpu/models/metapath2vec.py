"""MetaPath2Vec: device-side metapath random walks + skip-gram loss.

TPU-native replacement for the reference's `torch_sparse.SparseTensor.sample`
walker and skip-gram model (models/metapath2vec.py):

  * per-relation CSR (rowptr/col over *typed local* indices) built once on
    host; a walk step is `col[rowptr[n] + floor(u * deg[n])]` — exactly
    torch_sparse's uniform neighbor draw, including its behavior on
    zero-degree rows (it reads col[rowptr[n]], metapath2vec.py:101-121 via
    torch_sparse sample()),
  * walks add per-position type offsets so the embedding covers the global
    node-id space (metapath2vec.py:76-121),
  * skip-gram loss with EPS=1e-15 over sliding context windows
    (metapath2vec.py:147-172); window pairs are reduced offset-by-offset so
    the [windows, context, dim] tensor is never materialized,
  * negative walks draw every position uniformly within the step's node
    type (metapath2vec.py:123-140).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class RelationCSR:
    """CSR of one typed relation over local (per-type) indices."""

    rowptr: jnp.ndarray  # int32[N_src + 1]
    col: jnp.ndarray  # int32[max(E, 1)]
    deg: jnp.ndarray  # int32[N_src]
    dst_offset: int  # global nid offset of the destination type
    dst_count: int  # nodes in the destination type (for negative walks)


jax.tree_util.register_pytree_node(
    RelationCSR,
    lambda r: ((r.rowptr, r.col, r.deg), (r.dst_offset, r.dst_count)),
    lambda aux, c: RelationCSR(c[0], c[1], c[2], aux[0], aux[1]),
)


def build_relation_csr(src_local, dst_local, num_src, dst_offset, dst_count) -> RelationCSR:
    src_local = np.asarray(src_local, dtype=np.int64)
    dst_local = np.asarray(dst_local, dtype=np.int64)
    order = np.argsort(src_local, kind="stable")
    src_s, dst_s = src_local[order], dst_local[order]
    deg = np.bincount(src_s, minlength=num_src)
    rowptr = np.zeros(num_src + 1, dtype=np.int64)
    np.cumsum(deg, out=rowptr[1:])
    col = dst_s if len(dst_s) else np.zeros(1, dtype=np.int64)
    return RelationCSR(
        rowptr=jnp.asarray(rowptr, dtype=jnp.int32),
        col=jnp.asarray(col, dtype=jnp.int32),
        deg=jnp.asarray(deg, dtype=jnp.int32),
        dst_offset=int(dst_offset),
        dst_count=int(dst_count),
    )


@dataclasses.dataclass(frozen=True)
class MP2VConfig:
    embedding_dim: int = 64
    walk_length: int = 100
    context_size: int = 7
    walks_per_node: int = 1000
    num_negative_samples: int = 5
    start_offset: int = 0  # global nid offset of the metapath's start type
    num_start: int = 0  # nodes of the start type
    num_nodes: int = 0  # total embedding rows (whole typed node space)

EPS = 1e-15


def mp2v_init(key, cfg: MP2VConfig):
    # torch.nn.Embedding default init: N(0, 1)
    return {"emb": jax.random.normal(key, (cfg.num_nodes, cfg.embedding_dim))}


def _walk_offsets(metapath: List[RelationCSR], cfg: MP2VConfig):
    """Global-id offset of each walk position (metapath2vec.py:80-85)."""
    offs = [cfg.start_offset]
    k = len(metapath)
    for i in range(cfg.walk_length):
        offs.append(metapath[i % k].dst_offset)
    return jnp.asarray(offs, dtype=jnp.int32)


def sample_pos_walks(key, start_local, metapath: List[RelationCSR], cfg: MP2VConfig):
    """start_local: int32[B] local start-type ids -> int32[B*wpn, L+1] global."""
    batch = jnp.tile(start_local, cfg.walks_per_node)
    cur = batch
    rows = [cur]
    k = len(metapath)
    keys = jax.random.split(key, cfg.walk_length)
    for i in range(cfg.walk_length):
        rel = metapath[i % k]
        u = jax.random.uniform(keys[i], cur.shape)
        deg = rel.deg[cur]
        step = jnp.floor(u * deg.astype(jnp.float32)).astype(jnp.int32)
        step = jnp.minimum(step, jnp.maximum(deg - 1, 0))
        cur = rel.col[rel.rowptr[cur] + step]
        rows.append(cur)
    rw = jnp.stack(rows, axis=1)
    return rw + _walk_offsets(metapath, cfg)[None, :]


def sample_neg_walks(key, start_local, metapath: List[RelationCSR], cfg: MP2VConfig):
    """Every position uniform within its type (metapath2vec.py:123-140)."""
    batch = jnp.tile(start_local, cfg.walks_per_node * cfg.num_negative_samples)
    rows = [batch]
    k = len(metapath)
    keys = jax.random.split(key, cfg.walk_length)
    for i in range(cfg.walk_length):
        rel = metapath[i % k]
        rows.append(jax.random.randint(keys[i], batch.shape, 0, rel.dst_count))
    rw = jnp.stack(rows, axis=1)
    return rw + _walk_offsets(metapath, cfg)[None, :]


def _window_loss(emb, rw, cfg: MP2VConfig, positive: bool):
    """Mean skip-gram loss over sliding windows without materializing the
    [B, windows, context, D] tensor: reduce per context offset."""
    num_windows = cfg.walk_length + 2 - cfg.context_size
    starts = rw[:, :num_windows]  # [B, W]
    h_start = emb[starts]  # [B, W, D]
    total = 0.0
    for k in range(1, cfg.context_size):
        rest = jax.lax.dynamic_slice_in_dim(rw, k, num_windows, axis=1)
        dots = jnp.sum(h_start * emb[rest], axis=-1)  # [B, W]
        # reference: -log(sigmoid(x)+EPS) / -log(1-sigmoid(x)+EPS) with
        # EPS=1e-15 — below fp32 resolution, so the exact-stable softplus
        # forms are numerically identical; the naive forms get reassociated
        # to log(0) by XLA's algebraic simplifier under jit.
        if positive:
            total = total + jnp.sum(jax.nn.softplus(-dots))
        else:
            total = total + jnp.sum(jax.nn.softplus(dots))
    n_pairs = rw.shape[0] * num_windows * (cfg.context_size - 1)
    return total / n_pairs


def mp2v_loss(params, pos_rw, neg_rw, cfg: MP2VConfig):
    emb = params["emb"]
    return _window_loss(emb, pos_rw, cfg, True) + _window_loss(emb, neg_rw, cfg, False)


def metapath_from_hin(hin, relation_steps: List[Tuple[str, bool]]):
    """Build RelationCSR steps from HIN relations.

    relation_steps: [(relation_name, reversed?)] — e.g. the reference ml
    metapath uid->iid->genre->iid->uid (metapath2vec_solver_bpr.py:147-160)
    is [('user2item', False), ('genre2item', True), ('genre2item', False),
    ('user2item', True)].
    Returns (steps, start_type).
    """
    # relation name 'a2b' has src type a (by edge build), dst type b; we
    # recover types from node-id ranges.
    def type_of(nid):
        for t in reversed(hin.types):
            if nid >= hin.type_accs[t]:
                return t
        return hin.types[0]

    steps = []
    for name, rev in relation_steps:
        e = hin.edge_index[name]
        src, dst = (e[1], e[0]) if rev else (e[0], e[1])
        src_t = type_of(int(src[0])) if src.shape[0] else hin.types[0]
        dst_t = type_of(int(dst[0])) if dst.shape[0] else hin.types[0]
        steps.append(
            build_relation_csr(
                src - hin.type_accs[src_t],
                dst - hin.type_accs[dst_t],
                hin.num_nodes_dict[src_t],
                hin.type_accs[dst_t],
                hin.num_nodes_dict[dst_t],
            )
        )
    return steps
