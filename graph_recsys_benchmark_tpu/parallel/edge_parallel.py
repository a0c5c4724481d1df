"""Edge-parallel message passing: the graph-world analog of sequence
parallelism (SURVEY.md sections 2.5/5.7).

The reference pays for a FULL-graph forward on every optimizer step
(reference: graph_recsys_benchmark/models/base.py:44-45) on one GPU.  Here
the edge set of each fused metapath step is partitioned across the mesh's
`dp` axis: every device gathers/transforms only its contiguous slice of the
destination-sorted edge list, computes a partial per-node aggregate with the
local segment kernel, and the partials combine with one `psum` over ICI.
Per-device edge work drops by the axis size; the collective moves one
[num_nodes, D] array — independent of edge count.

For GAT the per-destination softmax needs global statistics, so the sharded
softmax runs the classic two-pass exchange: local segment max / rescaled
sum-of-exp, `pmax`/`psum` of the [N] stats vectors, then a purely local
normalization (the edge-sharded analog of an online-softmax merge).

Shards are built host-side by `shard_step_graph`: a contiguous split keeps
every shard destination-sorted (so the Pallas MXU segment kernel still
applies locally), and per-shard `src_perm`/`src_sorted` keep gather
backwards running as sorted reductions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph import PAD_TO, StepGraph
from ..ops.segment import segment_max, segment_sum


def shard_step_graph(g: StepGraph, n_shards: int) -> StepGraph:
    """Split a padded, block-ordered StepGraph (graph.py's (dst//128, src)
    order — dst//128 monotone) into `n_shards` contiguous, equal-length
    shards (stacked on a leading axis).  Each shard inherits the block
    order and is PAD_TO-aligned; filler edges use the same padding
    convention (dst == num_nodes, w == 0)."""
    e_pad = g.src.shape[0]
    per = -(-e_pad // (n_shards * PAD_TO)) * PAD_TO
    total = per * n_shards
    pad = total - e_pad

    def pad_to(a, fill):
        a = np.asarray(a)
        return np.concatenate([a, np.full(pad, fill, dtype=a.dtype)])

    src = pad_to(g.src, 0).reshape(n_shards, per)
    dst = pad_to(g.dst, g.num_nodes).reshape(n_shards, per)
    w = pad_to(g.w, 0.0).reshape(n_shards, per)
    rel = pad_to(g.rel, 0).reshape(n_shards, per)
    perms = np.stack([np.argsort(src[s], kind="stable") for s in range(n_shards)])
    src_sorted = np.take_along_axis(src, perms, axis=1)
    return StepGraph(
        src=jnp.asarray(src),
        dst=jnp.asarray(dst),
        w=jnp.asarray(w),
        rel=jnp.asarray(rel),
        src_perm=jnp.asarray(perms.astype(np.int32)),
        src_sorted=jnp.asarray(src_sorted),
        num_nodes=g.num_nodes,
        num_edges=g.num_edges,
        src_span=g.src_span,
        gat_loops=g.gat_loops,
    )


def _local_view(g: StepGraph) -> StepGraph:
    """Strip the leading shard axis inside shard_map ([1, E_loc] -> [E_loc])."""
    sq = lambda a: a.reshape(a.shape[-1])
    return StepGraph(
        src=sq(g.src), dst=sq(g.dst), w=sq(g.w), rel=sq(g.rel),
        src_perm=sq(g.src_perm), src_sorted=sq(g.src_sorted),
        num_nodes=g.num_nodes, num_edges=g.num_edges,
        src_span=g.src_span, gat_loops=g.gat_loops,
    )


def make_psum_aggregate(axis: str):
    """Segment-reduce local edge messages, then combine partials over ICI."""

    def aggregate(msgs, g, use_pallas=None):
        from ..nn.conv import _aggregate

        return jax.lax.psum(_aggregate(msgs, g, use_pallas), axis)

    return aggregate


def make_sharded_softmax(axis: str):
    """Per-destination softmax over edges sharded across `axis`: exchange
    [N] (max, rescaled sum-of-exp) stats, normalize locally.  Matches the
    single-device segment_softmax (incl. PyG's +1e-16 guard) exactly."""

    def softmax(alpha, dst, num_rows, indices_are_sorted=True, use_pallas=None):
        # softmax is shift-invariant, so the max stat carries no gradient
        # (pmax has no AD rule anyway)
        # shard dst is block-monotone, not sorted — never claim sortedness
        lmax = segment_max(jax.lax.stop_gradient(alpha), dst, num_rows)
        gmax = jax.lax.pmax(lmax, axis)
        gmax_safe = jnp.where(jnp.isfinite(gmax), gmax, 0.0)
        shifted = alpha - gmax_safe[jnp.minimum(dst, num_rows - 1)]
        expd = jnp.exp(shifted)
        gsum = jax.lax.psum(segment_sum(expd, dst, num_rows), axis)
        return expd / (gsum[jnp.minimum(dst, num_rows - 1)] + 1e-16)

    return softmax


def shard_fused_graphs(fused_graphs, n_shards: int):
    return tuple(shard_step_graph(g, n_shards) for g in fused_graphs)


def plan_channel_shards(per_channel_graphs, n_shards: int):
    """Shard PER-CHANNEL metapath graphs for the streaming edge trainer.

    graph.build_metapath_graphs dedupes identical step edge lists by
    object identity; pytrees cannot carry that sharing through shard_map,
    so the grouping is precomputed here: returns
      (groups, dist) where
      groups[k] = tuple[(chans tuple, dist_idx)] — channels sharing one
                  edge list at step k, split into shares of <= 8
                  (ops/stream_gat batches at most 8 channels),
      dist[k]   = tuple[StepGraph] — the distinct step-k graphs, each
                  sharded contiguously ([n_shards, E_loc] leaves).
    """
    n_chan = len(per_channel_graphs)
    num_steps = len(per_channel_graphs[0])
    groups_all, dist_all = [], []
    for k in range(num_steps):
        by_id: dict = {}
        for c in range(n_chan):
            by_id.setdefault(id(per_channel_graphs[c][k]), []).append(c)
        groups, dist = [], []
        for chans in by_id.values():
            g = per_channel_graphs[chans[0]][k]
            gi = len(dist)
            dist.append(shard_step_graph(g, n_shards))
            for i in range(0, len(chans), 8):
                groups.append((tuple(chans[i : i + 8]), gi))
        groups_all.append(tuple(groups))
        dist_all.append(tuple(dist))
    return tuple(groups_all), tuple(dist_all)


def _pea_loss_tail(cfg, params, h, batch, row_mask):
    """Channel fusion + BPR + entity regularizer on a [N, C, R] forward
    output — the shared local-loss tail of both edge-sharded trainers."""
    from ..models.pea import pea_predict, entity_reg_loss, _log_sigmoid

    if cfg.channel_aggr == "concat":
        cached = h.reshape(h.shape[0], -1)
    elif cfg.channel_aggr == "mean":
        cached = h.mean(axis=1)
    else:
        atts = jax.nn.softmax(jnp.sum(h * params["att"], axis=-1), axis=-1)
        cached = jnp.sum(h * atts[..., None], axis=1)
    pos = pea_predict(params, cached, batch[:, 0], batch[:, 1])
    neg = pea_predict(params, cached, batch[:, 0], batch[:, 2])
    loss = jnp.sum(-_log_sigmoid(pos - neg) * row_mask)
    if cfg.entity_aware and batch.shape[1] > 3:
        loss = loss + cfg.entity_aware_coff * entity_reg_loss(
            params["x"], batch, row_mask
        )
    return loss


def stream_grouped_forward_local(params, cfg, groups, dist_local, axis,
                                 n_shards):
    """Per-device PEA GAT forward over per-channel SHARDED graphs: every
    channel group runs the batched streaming attention on the local edge
    shard with node-keyed partials psum'd over `axis`
    (ops/stream_gat.stream_gat_attention_batched psum_axis).  Analytic
    self-loop graphs (`gat_loops`) get the loop term once on replicated
    math; loop-materialized graphs pass self_loops=False.  Math per
    channel equals the single-device grouped path."""
    from ..models.pea import _channel_layer_dims
    from ..ops import config as _ops_cfg
    from ..ops.stream_gat import stream_gat_attention_batched

    n = cfg.num_nodes
    num_steps = cfg.meta_path_steps[0]
    dims = _channel_layer_dims(cfg, num_steps)
    n_chan = cfg.num_channels
    hs = [None] * n_chan
    for k in range(num_steps):
        _, dout, heads, _ = dims[k]
        assert heads == 1, "streaming edge trainer supports single-head GAT"
        new_hs: list = [None] * n_chan
        for chans, gi in groups[k]:
            g = _local_view(dist_local[k][gi])
            lp = [params["channels"][c][k] for c in chans]
            W = jnp.stack([p["w"] for p in lp])  # [Cg, din, dout]
            att = jnp.stack([p["att"][0, 0] for p in lp])  # [Cg, 2c]
            b = jnp.stack([p["b"] for p in lp])
            if k == 0:
                z = jnp.einsum("nd,cde->cne", params["x"][:n], W)
            else:
                hstack = jnp.stack([hs[c] for c in chans])
                z = jnp.einsum("cnd,cde->cne", hstack, W)
            a_dst = jnp.einsum("cne,ce->cn", z, att[:, :dout])
            a_src = jnp.einsum("cne,ce->cn", z, att[:, dout:])
            # grad-scale contract (stream_gat psum_scale): the vjp psums
            # the incoming cotangent and the edge partials, then scales by
            # 1/dp so the trainer's single final grads-psum restores
            # exact totals for every parameter at every conv depth
            scale = 1.0 / n_shards
            outb = stream_gat_attention_batched(
                z, a_src, a_dst, g.src, g.dst, g.src_perm, g.src_sorted,
                n, bool(g.gat_loops), 0.2, False,
                _ops_cfg.SEGSUM_TRANSPORT, axis, scale,
            )
            outb = outb + b[:, None, :]
            for i, c in enumerate(chans):
                new_hs[c] = outb[i]
        if k < num_steps - 1:
            new_hs = [jax.nn.relu(x) for x in new_hs]
        hs = new_hs
    return jnp.stack(hs, axis=1)  # [N, C, R]


def make_stream_edge_sharded_train_step(cfg, groups, dist, optimizer,
                                        mesh: Mesh):
    """Edge-sharded PEA training step on the STREAMING kernel path: the
    per-channel (deduped) metapath graphs are split contiguously over the
    mesh's dp axis, each device runs the batched stream-GAT kernels on
    its shard (node partials psum over ICI — the 1.52x winner at ML-25M
    scale, BENCH_25m.json), and grads psum once per step.  Drop-in for
    make_edge_sharded_train_step (round-4 verdict #2: the sharded
    trainers previously forced the edge-materialized union paths)."""
    axis = "dp"
    n_shards = int(mesh.shape[axis])

    def local_loss(params, dist_local, batch, row_mask, key):
        h = stream_grouped_forward_local(params, cfg, groups, dist_local,
                                         axis, n_shards)
        return _pea_loss_tail(cfg, params, h, batch, row_mask)

    def sharded_grads(params, dist_local, batch, row_mask, key):
        loss, grads = jax.value_and_grad(local_loss)(
            params, dist_local, batch, row_mask, key
        )
        # node partials already psum inside the attention vjp; only the
        # batch-sharded loss/param grads cross here
        return jax.lax.psum(loss, axis), jax.lax.psum(grads, axis)

    dist_spec = jax.tree_util.tree_map(lambda _: P(axis, None), dist)

    smapped = jax.shard_map(
        sharded_grads,
        mesh=mesh,
        in_specs=(P(), dist_spec, P(axis, None), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    def step(params, opt_state, batch, row_mask, key):
        loss, grads = smapped(params, dist, batch, row_mask, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def place(batch, row_mask):
        dp = NamedSharding(mesh, P(axis, None))
        dp1 = NamedSharding(mesh, P(axis))
        return jax.device_put(batch, dp), jax.device_put(row_mask, dp1)

    return jax.jit(step), place


def make_edge_sharded_train_step(cfg, sharded_graphs, optimizer, mesh: Mesh):
    """Full PEA training step with edges AND batch sharded over the mesh's
    `dp` axis (embedding/dense params replicated; grads psum over ICI).

    Returns (jitted_step, place) where
      jitted_step(params, opt_state, batch, row_mask, key)
        -> (params, opt_state, loss)
      place(arrays...) device_puts batch inputs with the dp sharding.

    Every device computes 1/dp of the edge messages of every conv step and
    1/dp of the batch's BPR/entity terms; node aggregates and gradients
    each cross ICI once per use.
    """
    from ..models.pea import pea_forward_fused, pea_predict, entity_reg_loss, _log_sigmoid

    axis = "dp"
    aggregate = make_psum_aggregate(axis)
    softmax = make_sharded_softmax(axis)

    def local_loss(params, graphs_local, batch, row_mask, key):
        graphs_local = tuple(_local_view(g) for g in graphs_local)
        h = pea_forward_fused(
            params, graphs_local, cfg, training=True,
            dropout_key=None, aggregate=aggregate, softmax=softmax,
        )
        if cfg.channel_aggr == "concat":
            cached = h.reshape(h.shape[0], -1)
        elif cfg.channel_aggr == "mean":
            cached = h.mean(axis=1)
        else:
            atts = jax.nn.softmax(jnp.sum(h * params["att"], axis=-1), axis=-1)
            cached = jnp.sum(h * atts[..., None], axis=1)
        pos = pea_predict(params, cached, batch[:, 0], batch[:, 1])
        neg = pea_predict(params, cached, batch[:, 0], batch[:, 2])
        loss = jnp.sum(-_log_sigmoid(pos - neg) * row_mask)
        if cfg.entity_aware and batch.shape[1] > 3:
            loss = loss + cfg.entity_aware_coff * entity_reg_loss(
                params["x"], batch, row_mask
            )
        return loss

    def sharded_grads(params, graphs, batch, row_mask, key):
        loss, grads = jax.value_and_grad(local_loss)(
            params, graphs, batch, row_mask, key
        )
        return jax.lax.psum(loss, axis), jax.lax.psum(grads, axis)

    # every StepGraph leaf is [n_shards, E_loc] — shard the leading axis
    graph_spec_tree = jax.tree_util.tree_map(lambda _: P(axis, None), sharded_graphs)

    smapped = jax.shard_map(
        sharded_grads,
        mesh=mesh,
        in_specs=(P(), graph_spec_tree, P(axis, None), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    def step(params, opt_state, batch, row_mask, key):
        loss, grads = smapped(params, sharded_graphs, batch, row_mask, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def place(batch, row_mask):
        dp = NamedSharding(mesh, P(axis, None))
        dp1 = NamedSharding(mesh, P(axis))
        return jax.device_put(batch, dp), jax.device_put(row_mask, dp1)

    return jax.jit(step), place
