"""Static graph tensors: padded, block-sorted edge lists per metapath step.

The reference feeds raw ``edge_index`` int64 tensors straight into PyG convs
(reference: utils/general_utils.py:280-395 builds per-metapath step lists;
each conv then recomputes degrees / adds self-loops on the fly).  On TPU,
everything under ``jit`` must be shape-static, so this module moves all of
that per-step preprocessing to graph-build time:

  * edges are sorted by (dst // 128, src) — "block order": `dst // 128` is
    non-decreasing, so the Pallas MXU segment/softmax kernels can bound each
    128-row output block's edge chunks, while `src` ascending *within* each
    block makes every edge chunk's sources span only a few 128-row windows
    of the node table — the locality contract of the localized gather /
    scatter kernels (ops/pallas_segment.py) that replace XLA's serial-loop
    edge gathers.  All kernels match ids by VALUE, so any order is correct;
    block order is purely the speed contract.  dst is NOT fully sorted, so
    XLA fallback paths must not claim `indices_are_sorted`,
  * self-loops (where the conv semantics require them) are materialized as
    real edges,
  * normalization coefficients (GCN symmetric norm, SAGE 1/indeg mean
    weights, NGCF 1/sqrt(deg_i deg_j)) are precomputed into a per-edge
    weight vector `w` (w == 0 marks padding ⇒ padded messages are exactly 0),
  * arrays are padded to a multiple of `pad_to` (the Pallas edge-chunk size)
    with destination sentinel == num_nodes, which out-of-bounds scatter
    semantics drop.

Conv-specific math is documented in nn/conv.py; the builders here replicate:
  GCN  : PyG 1.5 gcn_conv.norm — deg over *source* row of A+I, then
         1/sqrt(deg_src) * 1/sqrt(deg_dst) per edge.
  GAT  : remove self-loops, then add one self-loop per node (PyG 1.5
         GATConv.forward); attention computed at run time.
  SAGE : mean aggregation — w = 1/indeg(dst), no self-loops.
  NGCF : reference nn/ngcf_conv.py:35-44 — deg_i = floor(count(i in either
         row)/2) (integer division, matching torch 1.5 LongTensor '/'),
         coff = 1/sqrt(deg_i * deg_j), self-loops removed.
  KG   : (KGAT/KGCN) raw typed edges + signed relation ids, attention map
         supplied externally (experiments/kgat_solver_bpr.py:311-320).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import numpy as np
import jax.numpy as jnp

PAD_TO = 512  # must match ops.pallas_segment._C


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class StepGraph:
    """One message-passing step: E_pad edges over `num_nodes` nodes.

    src/dst: int32[E_pad], sorted by (dst // 128, src) — see module docstring;
             padding has dst == num_nodes, src=0.
    w:       float32[E_pad] per-edge coefficient; 0 on padding edges.
    rel:     int32[E_pad] signed relation ids (0 when unused).
    src_perm/src_sorted: the stable sort of `src` — lets the backward of
             per-edge gathers run as a SORTED segment-sum (ops/gather.py)
             instead of XLA's unsorted scatter-add.
    """

    src: jnp.ndarray
    dst: jnp.ndarray
    w: jnp.ndarray
    rel: jnp.ndarray
    src_perm: jnp.ndarray
    src_sorted: jnp.ndarray
    num_nodes: int
    num_edges: int  # valid (non-padding) edges
    # Mean src-window span (128-row windows per 512-edge chunk), measured at
    # build time.  The localized one-hot gather/flash kernels do work
    # proportional to this span; past ops.config.GATHER_SPAN_MAX the XLA
    # row-gather engine wins and the dispatchers fall back to it (measured
    # on v5e at ML-25M scale: span~32 -> kernel 55 ms vs XLA 7.2 ms for a
    # [2.2M, 66] bf16 gather; span~1.5-2 at bench scale -> kernel wins 8x).
    src_span: float = 0.0
    # True = PyG GAT self-loops are IMPLICIT (not materialized as edges):
    # loop edges interleave every node band into every dst block and wreck
    # src locality at sparse scale, so large GAT graphs carry loop-free
    # lists and consumers add the analytic per-row loop term
    # (ops/stream_gat.py).  Only nn/conv.gat_apply understands this flag;
    # the fused/union builders reject such graphs.
    gat_loops: bool = False

    def tree_flatten(self):
        return (
            (self.src, self.dst, self.w, self.rel, self.src_perm, self.src_sorted),
            (self.num_nodes, self.num_edges, self.src_span, self.gat_loops),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


BLOCK = 128  # must match ops.pallas_segment._R / _BR


def _sort_pad(src, dst, w, rel, num_nodes, pad_to=PAD_TO, gat_loops=False):
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    from .native import sort_edges_block  # O(E+N) native counting sort

    order = sort_edges_block(src, dst, num_nodes, BLOCK)
    src, dst, w, rel = src[order], dst[order], w[order], rel[order]
    e = src.shape[0]
    e_pad = max(pad_to, -(-e // pad_to) * pad_to)
    pad = e_pad - e
    src = np.concatenate([src, np.zeros(pad, dtype=np.int64)])
    dst = np.concatenate([dst, np.full(pad, num_nodes, dtype=np.int64)])
    w = np.concatenate([w, np.zeros(pad, dtype=np.float32)])
    rel = np.concatenate([rel, np.zeros(pad, dtype=np.int64)])
    src_perm = np.argsort(src, kind="stable")
    return StepGraph(
        src=jnp.asarray(src, dtype=jnp.int32),
        dst=jnp.asarray(dst, dtype=jnp.int32),
        w=jnp.asarray(w.astype(np.float32)),
        rel=jnp.asarray(rel, dtype=jnp.int32),
        src_perm=jnp.asarray(src_perm, dtype=jnp.int32),
        src_sorted=jnp.asarray(src[src_perm], dtype=jnp.int32),
        num_nodes=int(num_nodes),
        num_edges=int(e),
        src_span=_mean_src_span(src, dst, num_nodes),
        gat_loops=bool(gat_loops),
    )


def _mean_src_span(src, dst, num_nodes, chunk=512):
    """Mean 128-row src-window span per `chunk`-edge chunk (pad lanes
    excluded) — the localized-kernel work factor stored on StepGraph."""
    nch = src.shape[0] // chunk
    if nch == 0:
        return 0.0
    by = src[: nch * chunk].reshape(nch, chunk)
    real = dst[: nch * chunk].reshape(nch, chunk) < num_nodes
    lo = np.where(real, by, num_nodes).min(axis=1)
    hi = np.where(real, by, lo[:, None]).max(axis=1)
    has = real.any(axis=1)
    if not has.any():
        return 0.0
    spans = (hi // BLOCK - lo // BLOCK + 1)[has]
    return float(spans.mean())


def _with_self_loops(src, dst, num_nodes, remove_existing=True):
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    if remove_existing:
        keep = src != dst
        src, dst = src[keep], dst[keep]
    loops = np.arange(num_nodes, dtype=np.int64)
    return np.concatenate([src, loops]), np.concatenate([dst, loops])


def build_gcn_graph(src, dst, num_nodes, pad_to=PAD_TO) -> StepGraph:
    """PyG 1.5 GCNConv norm: add self-loops for every node, deg over the
    source row, w_e = deg^-1/2[src] * deg^-1/2[dst]."""
    # add_remaining_self_loops keeps existing loops and only adds missing
    # ones; appending unconditionally would double-count loops, so dedupe.
    has_loop = np.zeros(num_nodes, dtype=bool)
    orig_src = np.asarray(src, dtype=np.int64)
    orig_dst = np.asarray(dst, dtype=np.int64)
    loop_mask = orig_src == orig_dst
    has_loop[orig_src[loop_mask]] = True
    loops = np.arange(num_nodes, dtype=np.int64)[~has_loop]
    src2 = np.concatenate([orig_src, loops])
    dst2 = np.concatenate([orig_dst, loops])

    deg = np.bincount(src2, minlength=num_nodes).astype(np.float64)
    dinv = np.zeros_like(deg)
    nz = deg > 0
    dinv[nz] = deg[nz] ** -0.5
    w = (dinv[src2] * dinv[dst2]).astype(np.float32)
    rel = np.zeros_like(src2)
    return _sort_pad(src2, dst2, w, rel, num_nodes, pad_to)


def build_gat_graph(src, dst, num_nodes, pad_to=PAD_TO,
                    analytic_loops=False) -> StepGraph:
    """PyG 1.5 GATConv: remove self-loops, add one per node; w=1 (attention
    replaces it at run time).

    analytic_loops: True keeps the list LOOP-FREE and flags the graph
    `gat_loops` — consumers add the per-node self-loop softmax term
    analytically (ops/stream_gat.py), which preserves src locality at
    sparse scale (ML-25M: loop edges stretch the mean chunk span 18 -> 32).
    None = auto: analytic past ops.stream_gat.STREAM_MIN_EDGES."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    if analytic_loops is None:
        from .ops.stream_gat import STREAM_MIN_EDGES

        analytic_loops = src.shape[0] >= STREAM_MIN_EDGES
    if analytic_loops:
        w = np.ones(src.shape[0], dtype=np.float32)
        # align to the streaming kernels' largest edge chunk so their
        # stream padding is a no-op (a misaligned pad copies the whole
        # [E, 128] stream — 2.9 ms measured at ML-25M scale)
        return _sort_pad(src, dst, w, np.zeros_like(src), num_nodes,
                         max(pad_to, 2048), gat_loops=True)
    loops = np.arange(num_nodes, dtype=np.int64)
    src2 = np.concatenate([src, loops])
    dst2 = np.concatenate([dst, loops])
    w = np.ones(src2.shape[0], dtype=np.float32)
    rel = np.zeros_like(src2)
    return _sort_pad(src2, dst2, w, rel, num_nodes, pad_to)


def build_sage_graph(src, dst, num_nodes, pad_to=PAD_TO) -> StepGraph:
    """PyG 1.5 SAGEConv mean aggregation: w_e = 1/indeg(dst), no self-loops."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    indeg = np.bincount(dst, minlength=num_nodes).astype(np.float64)
    w = (1.0 / np.maximum(indeg, 1.0))[dst].astype(np.float32)
    rel = np.zeros_like(src)
    return _sort_pad(src, dst, w, rel, num_nodes, pad_to)


def build_ngcf_graph(src, dst, num_nodes, pad_to=PAD_TO) -> StepGraph:
    """Reference NGCFConv degree scheme (nn/ngcf_conv.py:35-44): deg_i =
    (occurrences of i in either edge row) // 2 — integer division exactly as
    torch 1.5 LongTensor '/' — and coff_e = 1/sqrt(deg_dst * deg_src)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    keep = src != dst  # reference removes self loops before propagate
    src, dst = src[keep], dst[keep]
    count = np.bincount(src, minlength=num_nodes) + np.bincount(dst, minlength=num_nodes)
    deg = (count // 2).astype(np.float64)
    prod = deg[src] * deg[dst]
    w = np.zeros(src.shape[0], dtype=np.float64)
    nz = prod > 0
    w[nz] = 1.0 / np.sqrt(prod[nz])
    rel = np.zeros_like(src)
    return _sort_pad(src, dst, w.astype(np.float32), rel, num_nodes, pad_to)


def build_kg_graph(src, dst, rel, num_nodes, pad_to=PAD_TO) -> StepGraph:
    """KGAT/KGCN typed graph: raw edges with signed relation ids; the
    attention map is computed per epoch over `(src, dst, rel)` in this fixed
    sorted order.  Self-loops removed (reference KGATConv/KGCNConv forward)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    rel = np.asarray(rel, dtype=np.int64)
    keep = src != dst
    src, dst, rel = src[keep], dst[keep], rel[keep]
    w = np.ones(src.shape[0], dtype=np.float32)
    return _sort_pad(src, dst, w, rel, num_nodes, pad_to)


_BUILDERS = {
    "gcn": build_gcn_graph,
    "gat": build_gat_graph,
    "sage": build_sage_graph,
    "ngcf": build_ngcf_graph,
}


def build_metapath_graphs(
    metapath_steps, num_nodes, conv: str, pad_to=PAD_TO,
    analytic_gat_loops=False,
) -> Tuple[Tuple[StepGraph, ...], ...]:
    """Compile a metapath list (list of lists of (src, dst) numpy edge pairs,
    mirroring utils/general_utils.py:update_pea_graph_input) into per-step
    StepGraphs for the given conv type.

    analytic_gat_loops (GAT only): see build_gat_graph — None auto-selects
    implicit self-loops for large sparse step graphs (the streaming path's
    regime); must stay False for graphs that will be fused/unioned."""
    build = _BUILDERS[conv]
    if conv == "gat":
        import functools as _ft

        build = _ft.partial(build_gat_graph,
                            analytic_loops=analytic_gat_loops)

    # Identical (src, dst) step lists return the SAME StepGraph object:
    # the reference's metapath tables reuse one edge list across several
    # channels (ML-25M: 7 of 13 second steps ride the interaction graph),
    # so dedup shares device arrays AND lets models/pea.py batch those
    # channels through one streaming kernel pass (object identity is the
    # grouping key).
    import hashlib

    cache = {}

    def cached_build(s, d):
        sa = np.ascontiguousarray(np.asarray(s, dtype=np.int64))
        da = np.ascontiguousarray(np.asarray(d, dtype=np.int64))
        key = (
            hashlib.md5(sa.tobytes()).digest(),
            hashlib.md5(da.tobytes()).digest(),
            sa.shape[0],
        )
        if key not in cache:
            cache[key] = build(s, d, num_nodes, pad_to)
        return cache[key]

    out = []
    for steps in metapath_steps:
        out.append(tuple(cached_build(s, d) for (s, d) in steps))
    return tuple(out)


def fuse_step_graphs(step_graphs, num_nodes, pad_to=PAD_TO) -> StepGraph:
    """Union the same-position step of every metapath channel into ONE graph
    over a virtual node space of C*num_nodes (channel c's node n maps to
    c*num_nodes + n).

    One segment-sum over the union then computes all C channels' aggregation
    at once — C large kernels per PEA forward instead of C*steps small ones,
    which is what the TPU wants (fewer, bigger launches; better MXU/DMA
    utilization in the Pallas kernel).
    """
    srcs, dsts, ws, rels = [], [], [], []
    for c, g in enumerate(step_graphs):
        if g.gat_loops:
            raise ValueError(
                "cannot fuse gat_loops (implicit self-loop) graphs — build "
                "per-channel graphs with analytic_gat_loops=False for the "
                "fused path"
            )
        e = g.num_edges
        srcs.append(np.asarray(g.src)[:e].astype(np.int64) + c * num_nodes)
        dsts.append(np.asarray(g.dst)[:e].astype(np.int64) + c * num_nodes)
        ws.append(np.asarray(g.w)[:e])
        rels.append(np.asarray(g.rel)[:e].astype(np.int64))
    return _sort_pad(
        np.concatenate(srcs),
        np.concatenate(dsts),
        np.concatenate(ws).astype(np.float32),
        np.concatenate(rels),
        num_nodes * len(step_graphs),
        pad_to,
    )


def fuse_step_graphs_interleaved(step_graphs, emb_rows, pad_to=PAD_TO) -> StepGraph:
    """Node-major fused union: channel c's node n maps to virtual id
    ``n * C + c`` over ``emb_rows`` (the 128-padded table height).

    Whereas fuse_step_graphs is channel-major (c*N + n), this layout makes
    row OWNERSHIP contiguous under a P-way row sharding of the embedding
    table: virtual row v belongs to shard ``v // (C * emb_rows / P)`` — the
    same shard that owns node ``v // C`` of the table.  That alignment is
    what lets the all-to-all sharded-embedding path (parallel/a2a.py)
    psum_scatter per-step aggregates straight into table-aligned shards
    with no re-layout collective.  Math per channel is identical.
    """
    C = len(step_graphs)
    srcs, dsts, ws, rels = [], [], [], []
    for c, g in enumerate(step_graphs):
        if g.gat_loops:
            raise ValueError(
                "cannot fuse gat_loops (implicit self-loop) graphs — build "
                "per-channel graphs with analytic_gat_loops=False for the "
                "fused path"
            )
        e = g.num_edges
        srcs.append(np.asarray(g.src)[:e].astype(np.int64) * C + c)
        dsts.append(np.asarray(g.dst)[:e].astype(np.int64) * C + c)
        ws.append(np.asarray(g.w)[:e])
        rels.append(np.asarray(g.rel)[:e].astype(np.int64))
    return _sort_pad(
        np.concatenate(srcs),
        np.concatenate(dsts),
        np.concatenate(ws).astype(np.float32),
        np.concatenate(rels),
        emb_rows * C,
        pad_to,
    )


def build_fused_metapath_graphs_interleaved(
    metapath_steps, num_nodes, emb_rows, conv: str, pad_to=PAD_TO
) -> Tuple[StepGraph, ...]:
    """Interleaved variant of build_fused_metapath_graphs (see
    fuse_step_graphs_interleaved) for the sharded-embedding training path."""
    per_channel = build_metapath_graphs(metapath_steps, num_nodes, conv, pad_to)
    n_steps = {len(ch) for ch in per_channel}
    if len(n_steps) != 1:
        raise ValueError(
            "fused metapath graphs require every metapath to have the same "
            f"number of steps; got step counts {sorted(n_steps)}. Use the "
            "per-channel path (PEAConfig fused=False / --parallel dp) for "
            "mixed-depth metapaths."
        )
    return tuple(
        fuse_step_graphs_interleaved([ch[k] for ch in per_channel], emb_rows, pad_to)
        for k in range(n_steps.pop())
    )


def build_fused_metapath_graphs(
    metapath_steps, num_nodes, conv: str, pad_to=PAD_TO
) -> Tuple[StepGraph, ...]:
    """Fused variant of build_metapath_graphs: requires every metapath to
    have the same number of steps (true for all reference configs — 2 steps
    per metapath, experiments/pea*_solver_bpr.py:33).  Returns one fused
    StepGraph per step position."""
    per_channel = build_metapath_graphs(metapath_steps, num_nodes, conv, pad_to)
    n_steps = {len(ch) for ch in per_channel}
    if len(n_steps) != 1:
        raise ValueError(
            "fused metapath graphs require every metapath to have the same "
            f"number of steps; got step counts {sorted(n_steps)}. Use the "
            "per-channel path (PEAConfig fused=False / --parallel dp) for "
            "mixed-depth metapaths."
        )
    return tuple(
        fuse_step_graphs([ch[k] for ch in per_channel], num_nodes, pad_to)
        for k in range(n_steps.pop())
    )
