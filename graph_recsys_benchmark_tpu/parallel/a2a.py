"""Fully sharded PEA training: row-sharded embedding + all-to-all lookups.

This is the north-star distributed path (SURVEY.md section 7.3, BASELINE.json):
nothing table-shaped is ever replicated or all-gathered —

  params['x']      [emb_rows/P, emb]   row shard per device
  per-step z / h   [emb_rows*C/P, d]   psum_scatter'd aggregates, shard-aligned
  cached_repr      [emb_rows/P, F]     fused channels, shard rows
  grads of x       [emb_rows/P, emb]   accumulated via lookup transposes
  Adam moments     sharded like x      (spmd._opt_shardings)

Per conv step, each device transforms ONLY its own table rows, ships the
rows its peers' edge shards need through ONE all_to_all (the exchange plan
is precomputed host-side from the static edge sets — zero runtime id
traffic, parallel/sharded_embedding.build_static_plan), segment-reduces its
local edge shard, and psum_scatters the partial aggregate straight into the
next step's table-aligned shard (the node-major fused layout
graph.fuse_step_graphs_interleaved makes the scatter blocks line up with
row ownership).  Batch (u, pos, neg, entity) rows use the dynamic
dedupe -> all_to_all id exchange -> gather -> reverse all_to_all lookup.

Compare parallel/spmd.py's `gspmd` mode, which lets XLA all-gather the full
[N, emb] table every step — correct, but the all-gather erases the point of
sharding the table (VERDICT round 1).  The replicated-path math is
preserved exactly (parity-tested); only reduction orders differ.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph import build_fused_metapath_graphs_interleaved
from ..models.pea import PEAConfig, _log_sigmoid, _stacked_step_params, _channel_layer_dims
from ..nn.init import linear
from ..ops.pallas_segment import segment_sum_auto
from .edge_parallel import _local_view, make_sharded_softmax, shard_fused_graphs
from .sharded_embedding import (
    build_static_plan,
    plan_arrays,
    sharded_lookup,
    static_lookup,
)


def _specs_like(tree, axis):
    """P(axis, None, ...) for every array leaf (leading device axis)."""
    return jax.tree_util.tree_map(
        lambda a: P(axis, *([None] * (a.ndim - 1))), tree
    )


def build_a2a_setup(cfg: PEAConfig, metapath_edges, mesh: Mesh, axis: str = "dp"):
    """Host-side preprocessing: interleaved fused graphs, contiguous edge
    shards, and one static exchange plan per lookup site."""
    n_shards = int(mesh.shape[axis])
    emb_rows = cfg.emb_rows
    assert emb_rows % n_shards == 0, (emb_rows, n_shards)
    C = cfg.num_channels
    r_loc = emb_rows // n_shards
    s_virt = r_loc * C
    fused = build_fused_metapath_graphs_interleaved(
        metapath_edges, cfg.num_nodes, emb_rows, cfg.conv
    )
    sharded = shard_fused_graphs(fused, n_shards)
    v_total = emb_rows * C

    src_plans, dst_plans = [], []
    for k, g in enumerate(sharded):
        src = np.asarray(g.src)  # [P, E_loc]; padding src=0 (real row, w=0)
        if cfg.conv == "sage" and k == 0:
            # SAGE step 1 gathers raw x rows — node-space ids dedupe the
            # C-fold channel duplication away for free
            src_plans.append(build_static_plan(src // C, r_loc, n_shards))
        else:
            src_plans.append(build_static_plan(src, s_virt, n_shards))
        if cfg.conv == "gat":
            dst = np.asarray(g.dst)
            dst = np.where(dst >= v_total, 0, dst)  # sentinel -> row 0 (unused)
            dst_plans.append(build_static_plan(dst, s_virt, n_shards))
        else:
            dst_plans.append(None)
    return {
        "sharded_graphs": sharded,
        "src_plans": src_plans,
        "dst_plans": dst_plans,
        "n_shards": n_shards,
        "r_loc": r_loc,
        "s_virt": s_virt,
        "v_total": v_total,
    }


def _a2a_forward(cfg: PEAConfig, setup, axis, params, x_shard, graphs, splans,
                 dplans, dropout_key=None):
    """Sharded fused forward -> cached channel reps [r_loc, C, repr].

    dropout_key enables attention dropout (GAT): each device folds its
    axis_index into the key so its edge shard draws an independent mask —
    statistically the same regularizer as the single-device bernoulli over
    the full edge list (exact RNG-stream parity is impossible under edge
    sharding and not required: dropout is noise by construction)."""
    C = cfg.num_channels
    P_ = setup["n_shards"]
    r_loc, s_virt, v_total = setup["r_loc"], setup["s_virt"], setup["v_total"]
    num_steps = cfg.meta_path_steps[0]
    dims = _channel_layer_dims(cfg, num_steps)
    softmax = make_sharded_softmax(axis)
    chan_of_slot = jnp.arange(s_virt, dtype=jnp.int32) % C
    if dropout_key is not None:
        dropout_key = jax.random.fold_in(dropout_key, jax.lax.axis_index(axis))

    h = None  # [r_loc, C, d] from step 2 on
    for k in range(num_steps):
        sp = _stacked_step_params(params, k)
        g = _local_view(graphs[k])
        din, dout, heads, _ = dims[k]
        scap = setup["src_plans"][k]["capacity"]
        sown, spos, sserve = splans[k]["own"], splans[k]["pos"], splans[k]["serve"]

        if cfg.conv == "gcn":
            if k == 0:
                z = jnp.einsum("rd,cde->rce", x_shard, sp["w"])
            else:
                z = jnp.einsum("rcd,cde->rce", h, sp["w"])
            z2 = z.reshape(s_virt, dout)
            z_e = static_lookup(z2, sown, spos, sserve, axis, P_, scap)
            partial = segment_sum_auto(g.w[:, None] * z_e, g.dst, v_total)
            agg = jax.lax.psum_scatter(
                partial, axis, scatter_dimension=0, tiled=True
            )
            out = agg + sp["b"][chan_of_slot]
            h = out.reshape(r_loc, C, dout)
        elif cfg.conv == "sage":
            if k == 0:
                x_e = static_lookup(x_shard, sown, spos, sserve, axis, P_, scap)
                root = jnp.einsum("rd,cde->rce", x_shard, sp["w_root"])
            else:
                h2 = h.reshape(s_virt, din)
                x_e = static_lookup(h2, sown, spos, sserve, axis, P_, scap)
                root = jnp.einsum("rcd,cde->rce", h, sp["w_root"])
            partial = segment_sum_auto(g.w[:, None] * x_e, g.dst, v_total)
            mean_agg = jax.lax.psum_scatter(
                partial, axis, scatter_dimension=0, tiled=True
            ).reshape(r_loc, C, din)
            h = jnp.einsum("rcd,cde->rce", mean_agg, sp["w_rel"]) + sp["b_rel"][None] + root
        elif cfg.conv == "gat":
            if k == 0:
                z = jnp.einsum("rd,cde->rce", x_shard, sp["w"])
            else:
                z = jnp.einsum("rcd,cde->rce", h, sp["w"])
            c_dim = dout  # per-head width; z is [r_loc, C, H*c]
            zh = z.reshape(r_loc, C, heads, c_dim)
            att = sp["att"][:, 0]  # [C, H, 2c]
            att_dst, att_src = att[..., :c_dim], att[..., c_dim:]
            a_dst = jnp.sum(zh * att_dst[None], axis=-1).reshape(s_virt, heads)
            a_src = jnp.sum(zh * att_src[None], axis=-1).reshape(s_virt, heads)
            # one exchange ships [z | a_src]: H*c + H columns
            packed = jnp.concatenate(
                [z.reshape(s_virt, heads * c_dim), a_src], axis=1
            )
            packed_e = static_lookup(packed, sown, spos, sserve, axis, P_, scap)
            dcap = setup["dst_plans"][k]["capacity"]
            down, dpos, dserve = dplans[k]["own"], dplans[k]["pos"], dplans[k]["serve"]
            a_dst_e = static_lookup(
                a_dst, down, dpos, dserve, axis, P_, dcap
            )  # [E_loc, H]
            a_src_e = packed_e[:, heads * c_dim :]
            alpha = jax.nn.leaky_relu(a_dst_e + a_src_e, 0.2)  # [E_loc, H]
            att_e = softmax(alpha, g.dst, v_total)
            if dropout_key is not None and cfg.dropout > 0.0:
                keep = jax.random.bernoulli(
                    jax.random.fold_in(dropout_key, k), 1.0 - cfg.dropout,
                    att_e.shape,
                )
                att_e = jnp.where(keep, att_e / (1.0 - cfg.dropout), 0.0)
            z_e = packed_e[:, : heads * c_dim].reshape(-1, heads, c_dim)
            partial = segment_sum_auto(
                (z_e * att_e[:, :, None]).reshape(-1, heads * c_dim),
                g.dst, v_total,
            )
            agg = jax.lax.psum_scatter(
                partial, axis, scatter_dimension=0, tiled=True
            )
            # concat heads between steps, single head on the last layer
            # (PEAGATChannel semantics, models/peagat.py:14-21)
            out = agg + sp["b"][chan_of_slot]  # bias [C, H*c]
            h = out.reshape(r_loc, C, heads * c_dim)
        else:
            raise ValueError(cfg.conv)
        if k < num_steps - 1:
            h = jax.nn.relu(h)
    return h  # [r_loc, C, repr]


def _fuse_channels(cfg, params, h):
    if cfg.channel_aggr == "concat":
        return h.reshape(h.shape[0], -1)
    if cfg.channel_aggr == "mean":
        return h.mean(axis=1)
    atts = jax.nn.softmax(jnp.sum(h * params["att"], axis=-1), axis=-1)
    return jnp.sum(h * atts[..., None], axis=1)


def make_a2a_parts(
    cfg: PEAConfig, metapath_edges, optimizer, mesh: Mesh, axis: str = "dp",
):
    """The traceable building blocks of the a2a path, for callers that embed
    them in larger jitted programs (the sharded epoch engine,
    parallel/engine.py):

      step(params, opt_state, batch, row_mask, key) -> (params, opt_state, loss)
          one optimizer step; shard_map'd grads inside, optax outside.
      local_cached(params, channel_mask, graphs, splans, dplans) -> [r_loc, F]
          SHARD-LOCAL fused forward (call inside shard_map over `axis`);
          channel_mask ablates metapath channels exactly like
          pea_forward's mask (mask h before fusion).
      param_specs(params) / make_shardings(params, opt_state)
          PartitionSpec / NamedSharding pytrees for placement.
    plus the host-side arrays: setup, graphs, splans, dplans and their specs.
    """
    # Documented limitation, surfaced as a config error (round-3 VERDICT
    # #8): the a2a exchange plans are per-step-position over the fused
    # interleaved union, which requires every metapath to share one step
    # count.  Every reference recipe uses uniform 2-step paths
    # (/root/reference/utils/general_utils.py:300-392), so only hand-built
    # configs can hit this.
    if len(set(cfg.meta_path_steps)) != 1:
        raise ValueError(
            "--parallel a2a requires uniform meta_path_steps (the sharded "
            f"exchange plans are per step position); got {cfg.meta_path_steps}. "
            "Use --parallel dp/edge for mixed-depth metapaths."
        )
    assert cfg.fused
    setup = build_a2a_setup(cfg, metapath_edges, mesh, axis)
    P_ = setup["n_shards"]
    r_loc = setup["r_loc"]
    splans = [plan_arrays(p) for p in setup["src_plans"]]
    dplans = [plan_arrays(p) if p else None for p in setup["dst_plans"]]
    graphs = setup["sharded_graphs"]

    def local_cached(params, channel_mask, graphs, splans, dplans):
        """Shard-local cached representation (strip the leading device axis
        of plan/graph arrays first — shard_map hands them in as [1, ...])."""
        splans = jax.tree_util.tree_map(lambda a: a[0], splans)
        dplans = jax.tree_util.tree_map(lambda a: a[0], dplans)
        h = _a2a_forward(cfg, setup, axis, params, params["x"], graphs, splans, dplans)
        if channel_mask is not None:
            h = h * channel_mask[None, :, None]
        return _fuse_channels(cfg, params, h)  # [r_loc, F]

    def local_loss(params, batch, row_mask, key, graphs, splans, dplans):
        x_shard = params["x"]
        h = _a2a_forward(
            cfg, setup, axis, params, x_shard, graphs, splans, dplans,
            dropout_key=key if cfg.dropout > 0.0 else None,
        )
        cached = _fuse_channels(cfg, params, h)  # [r_loc, F]
        b_loc = batch.shape[0]
        ids3 = jnp.concatenate([batch[:, 0], batch[:, 1], batch[:, 2]])
        # capacity proof: an owner can be asked for at most
        # min(#ids requested, #rows it owns) DISTINCT rows — ids3 holds
        # 3*b_loc requests and every owner holds r_loc rows, so
        # min(3*b_loc, r_loc) can never overflow a bucket (adversarial-skew
        # test: tests/test_sharded_embedding.py::test_capacity_bound_skew)
        cap3 = min(3 * b_loc, r_loc)
        rows = sharded_lookup(cached, ids3, axis, P_, cap3)
        u_r, p_r, n_r = rows[:b_loc], rows[b_loc : 2 * b_loc], rows[2 * b_loc :]

        def score(u, i):
            zcat = jnp.concatenate([u, i], axis=-1)
            return linear(params["fc2"], jax.nn.relu(linear(params["fc1"], zcat)))[..., 0]

        loss = jnp.sum(-_log_sigmoid(score(u_r, p_r) - score(u_r, n_r)) * row_mask)

        if cfg.entity_aware and batch.shape[1] > 3:
            cols = jnp.array([0, 1, 3, 4, 6, 7], dtype=jnp.int32)
            ids6 = batch[:, cols].T.reshape(-1)
            cap6 = min(6 * b_loc, r_loc)  # same min(#ids, r_loc) bound as cap3
            xr = sharded_lookup(x_shard, ids6, axis, P_, cap6).reshape(
                6, b_loc, -1
            )
            u, pos_i, p_ie, n_ie, p_ue, n_ue = (xr[i] for i in range(6))
            sq = lambda a, b: jnp.sum((a - b) ** 2, axis=-1)
            item_term = -_log_sigmoid(
                (sq(pos_i, p_ie) - sq(pos_i, n_ie)) * batch[:, 5]
            )
            user_term = -_log_sigmoid(
                (sq(u, p_ue) - sq(u, n_ue)) * batch[:, 8]
            )
            loss = loss + cfg.entity_aware_coff * jnp.sum(
                (item_term + user_term) * row_mask
            )
        return loss

    def sharded_grads(params, batch, row_mask, key, graphs, splans, dplans):
        # plan arrays arrive with a leading size-1 device axis — strip it
        splans = jax.tree_util.tree_map(lambda a: a[0], splans)
        dplans = jax.tree_util.tree_map(lambda a: a[0], dplans)
        loss, grads = jax.value_and_grad(local_loss)(
            params, batch, row_mask, key, graphs, splans, dplans
        )
        # x's gradient is already globally complete (every device's request
        # cotangents arrived via the lookup transposes' reverse all_to_all);
        # every other grad is a per-device partial over its batch/edge shard
        gx = grads["x"]
        rest = {k: v for k, v in grads.items() if k != "x"}
        rest = jax.lax.psum(rest, axis)
        return jax.lax.psum(loss, axis), {**rest, "x": gx}

    graph_specs = jax.tree_util.tree_map(lambda _: P(axis, None), graphs)
    splan_specs = _specs_like(splans, axis)
    dplan_specs = _specs_like(dplans, axis)

    def param_specs(params):
        # pytree-prefix specs: one P per top-level param entry
        return {k: (P(axis, None) if k == "x" else P()) for k in params}

    def smapped(params):
        pspec = param_specs(params)
        return jax.shard_map(
            sharded_grads,
            mesh=mesh,
            in_specs=(pspec, P(axis, None), P(axis), P(), graph_specs, splan_specs, dplan_specs),
            out_specs=(P(), pspec),
            check_vma=False,
        )

    def step(params, opt_state, batch, row_mask, key):
        loss, grads = smapped(params)(
            params, batch, row_mask, key, graphs, splans, dplans
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def make_shardings(params, opt_state):
        from .spmd import _opt_shardings

        p_shard = {
            k: (
                NamedSharding(mesh, P(axis, None))
                if k == "x"
                else jax.tree_util.tree_map(
                    lambda _: NamedSharding(mesh, P()), params[k]
                )
            )
            for k in params
        }
        o_shard = _opt_shardings(opt_state, p_shard, mesh)
        return p_shard, o_shard

    return {
        "step": step,
        "local_cached": local_cached,
        "local_loss": local_loss,
        "make_shardings": make_shardings,
        "param_specs": param_specs,
        "setup": setup,
        "graphs": graphs,
        "splans": splans,
        "dplans": dplans,
        "graph_specs": graph_specs,
        "splan_specs": splan_specs,
        "dplan_specs": dplan_specs,
        "r_loc": r_loc,
        "n_shards": P_,
    }


def make_a2a_train_step(
    cfg: PEAConfig, metapath_edges, optimizer, mesh: Mesh, axis: str = "dp",
    batch_size: int | None = None,
):
    """Returns (place, setup).  `place(params, opt_state)` device_puts a
    freshly initialized state onto the mesh and returns
    (jitted_step, params, opt_state) where

      jitted_step(params, opt_state, batch, row_mask, key)
          -> (params, opt_state, loss)

    params['x'] and its optimizer moments live/stay sharded P(axis, None);
    batch rows are sharded P(axis, None).
    """
    parts = make_a2a_parts(cfg, metapath_edges, optimizer, mesh, axis)

    def place(params, opt_state):
        p_shard, o_shard = parts["make_shardings"](params, opt_state)
        params = jax.device_put(params, p_shard)
        opt_state = jax.device_put(opt_state, o_shard)
        dp2 = NamedSharding(mesh, P(axis, None))
        dp1 = NamedSharding(mesh, P(axis))
        rep = NamedSharding(mesh, P())
        jitted = jax.jit(
            parts["step"],
            in_shardings=(p_shard, o_shard, dp2, dp1, rep),
            out_shardings=(p_shard, o_shard, rep),
        )
        return jitted, params, opt_state

    return place, parts["setup"]
