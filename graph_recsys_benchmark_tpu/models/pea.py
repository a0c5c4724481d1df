"""PEA (metapath- and entity-aware) GNN recommenders: PEAGCN/PEAGAT/PEASage.

Replicates the math of the reference model family
(models/base.py:129-214 + models/peagcn.py / peagat.py / peasage.py) as pure
functions over an explicit parameter pytree:

  * one learned embedding row per HIN node, glorot-initialized over the whole
    table (base.py:156,183),
  * one GNN channel per metapath — a stack of `num_steps` convs with ReLU
    between steps and none after the last (base.py:134-140),
  * channel fusion: 'att' (learned per-channel attention, base.py:201-203),
    'mean', or 'concat',
  * pair scorer: 2-layer MLP over [u_repr, i_repr] (base.py:208-214),
  * loss: BPR −Σ log σ(pos−neg) plus the entity-aware contrastive
    regularizer written exactly as the reference computes it
    (base.py:43-80 — including its sign convention),

but TPU-first: the whole forward is one jitted graph program over static
padded StepGraphs; channel ablation is a multiplicative mask (no python
branching), so the metapath-ablation eval (solvers.py:224-244) jits once.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..graph import StepGraph
from ..nn import conv as C
from ..nn.init import glorot, torch_linear_params, linear


@dataclasses.dataclass(frozen=True)
class PEAConfig:
    conv: str  # 'gcn' | 'gat' | 'sage'
    num_nodes: int
    meta_path_steps: Tuple[int, ...]
    emb_dim: int = 64
    hidden_size: int = 64
    repr_dim: int = 16
    num_heads: int = 1  # GAT only
    channel_aggr: str = "att"  # 'att' | 'mean' | 'concat'
    dropout: float = 0.0
    entity_aware: bool = False
    entity_aware_coff: float = 0.1
    fused: bool = True  # fuse all channels into union-graph kernels (TPU win)

    @property
    def num_channels(self):
        return len(self.meta_path_steps)

    @property
    def emb_rows(self):
        """Embedding-table rows padded to 128 so the table row-shards over
        any mesh axis and tiles cleanly on TPU; rows >= num_nodes are never
        gathered."""
        return -(-self.num_nodes // 128) * 128


def _channel_layer_dims(cfg: PEAConfig, num_steps: int):
    """Per-step (in, out, heads, concat) mirroring peagcn/peagat/peasage.py:14-21."""
    dims = []
    if num_steps == 1:
        dims.append((cfg.emb_dim, cfg.repr_dim, 1, True))
        return dims
    h = cfg.num_heads if cfg.conv == "gat" else 1
    dims.append((cfg.emb_dim, cfg.hidden_size, h, True))
    for _ in range(num_steps - 2):
        dims.append((cfg.hidden_size * h, cfg.hidden_size, h, True))
    dims.append((cfg.hidden_size * h, cfg.repr_dim, 1, True))
    return dims


_INITS = {"gcn": C.gcn_init, "gat": C.gat_init, "sage": C.sage_init}


def pea_init(key, cfg: PEAConfig):
    kx, kc, ka, k1, k2 = jax.random.split(key, 5)
    # glorot bound computed from the TRUE node count (base.py:156,183 does
    # glorot over (num_nodes, emb_dim)); rows are padded for sharding only.
    import math

    bound = math.sqrt(6.0 / (cfg.num_nodes + cfg.emb_dim))
    params = {
        "x": jax.random.uniform(
            kx, (cfg.emb_rows, cfg.emb_dim), minval=-bound, maxval=bound
        )
    }

    channels = []
    ckeys = jax.random.split(kc, cfg.num_channels)
    for ck, num_steps in zip(ckeys, cfg.meta_path_steps):
        layer_keys = jax.random.split(ck, num_steps)
        layers = []
        for lk, (din, dout, heads, _) in zip(layer_keys, _channel_layer_dims(cfg, num_steps)):
            if cfg.conv == "gat":
                layers.append(C.gat_init(lk, din, dout, heads=heads))
            else:
                layers.append(_INITS[cfg.conv](lk, din, dout))
        channels.append(tuple(layers))
    params["channels"] = tuple(channels)

    if cfg.channel_aggr == "att":
        params["att"] = glorot(ka, (1, cfg.num_channels, cfg.repr_dim))

    fc1_in = 2 * cfg.repr_dim * (cfg.num_channels if cfg.channel_aggr == "concat" else 1)
    params["fc1"] = torch_linear_params(k1, fc1_in, cfg.repr_dim, glorot_weight=True)
    params["fc2"] = torch_linear_params(k2, cfg.repr_dim, 1, glorot_weight=True)
    return params


def _channel_forward(cfg, layers, x, steps, dims, dropout_keys, training):
    """PEABaseChannel.forward (base.py:134-140): relu between steps."""
    h = x
    n = len(layers)
    for i, (lp, g) in enumerate(zip(layers, steps)):
        din, dout, heads, _ = dims[i]
        if cfg.conv == "gcn":
            h = C.gcn_apply(lp, h, g)
        elif cfg.conv == "sage":
            h = C.sage_apply(lp, h, g)
        elif cfg.conv == "gat":
            dk = None
            if training and cfg.dropout > 0.0 and dropout_keys is not None:
                dk = dropout_keys[i]
            h = C.gat_apply(
                lp, h, g, heads=heads, concat=True,
                dropout=cfg.dropout if training else 0.0, dropout_key=dk,
            )
        else:
            raise ValueError(cfg.conv)
        if i < n - 1:
            h = jax.nn.relu(h)
    return h


def _stacked_step_params(params, step_idx):
    """Stack every channel's step-k conv params along a leading C axis."""
    per_channel = [ch[step_idx] for ch in params["channels"]]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_channel)


def _fused_gcn_step(sp, h, g, num_channels, num_nodes, aggregate=None):
    """h: [N, din] (shared input) or [C, N, din] -> [C, N, dout].

    `aggregate(msgs, g)` overrides the segment reduction (edge-parallel
    path psums local partials, parallel/edge_parallel.py)."""
    if h.ndim == 2:
        z = jnp.einsum("nd,cde->cne", h[:num_nodes], sp["w"])
    else:
        z = jnp.einsum("cnd,cde->cne", h, sp["w"])
    z = z.reshape(num_channels * num_nodes, -1)
    from ..ops.config import msg_cast
    from ..ops.gather import gather_src

    z, w = msg_cast(z, g.w)
    msgs = w[:, None] * gather_src(z, g)
    out = (aggregate or C._aggregate)(msgs, g)
    return out.reshape(num_channels, num_nodes, -1) + sp["b"][:, None, :]


def _fused_sage_step(sp, h, g, num_channels, num_nodes, aggregate=None):
    if h.ndim == 2:
        hc = jnp.broadcast_to(h[None, :num_nodes], (num_channels,) + h[:num_nodes].shape)
    else:
        hc = h
    from ..ops.config import msg_cast
    from ..ops.gather import gather_src

    flat = hc.reshape(num_channels * num_nodes, -1)
    flat, w = msg_cast(flat, g.w)
    mean_agg = (aggregate or C._aggregate)(w[:, None] * gather_src(flat, g), g)
    mean_agg = mean_agg.reshape(num_channels, num_nodes, -1)
    out = jnp.einsum("cnd,cde->cne", mean_agg, sp["w_rel"]) + sp["b_rel"][:, None, :]
    return out + jnp.einsum("cnd,cde->cne", hc, sp["w_root"])


def _fused_gat_step(sp, h, g, num_channels, num_nodes, heads, concat,
                    dropout, dropout_key, aggregate=None, softmax=None):
    from ..ops import config as _cfg
    from ..ops.config import msg_cast
    from ..ops.gather import gather_dst, gather_src
    from ..ops.pallas_segment import segment_softmax_auto

    overridden = aggregate is not None or softmax is not None
    softmax = softmax or segment_softmax_auto
    n_virtual = num_channels * num_nodes
    c_dim_full = sp["w"].shape[-1]
    c_dim = c_dim_full // heads
    dropout_active = dropout > 0.0 and dropout_key is not None

    if not overridden and not dropout_active:
        from ..ops.flash_gat import (
            flash_gat_attention,
            flash_gat_enabled,
            pack_gat_table,
        )

        if flash_gat_enabled(heads, dropout_active, g.dst.shape[0],
                             src_span=getattr(g, "src_span", 0.0)):
            # One fused pass per head: gather + logits + segment softmax +
            # weighted segment-sum, no [E, *] HBM intermediates
            # (ops/flash_gat.py).  The packed table is emitted COLUMN-major
            # straight from the einsum — no [N, k] -> [k, N] transpose op
            # on the hot path.  heads > 1 loops the single-head megakernel
            # (heads are independent softmaxes over the same edge list,
            # PyG GATConv semantics) and concatenates.
            t_dtype = (
                jnp.bfloat16 if _cfg.SEGSUM_TRANSPORT == "bf16"
                else jnp.float32
            )
            head_outs = []
            for hh in range(heads):
                w_h = sp["w"][:, :, hh * c_dim : (hh + 1) * c_dim]
                if h.ndim == 2:
                    z3 = jnp.einsum("nd,cde->ecn", h[:num_nodes], w_h)
                else:
                    z3 = jnp.einsum("cnd,cde->ecn", h, w_h)
                att2 = sp["att"][:, 0, hh]  # [C, 2c]
                a_dst = jnp.einsum(
                    "ecn,ce->cn", z3, att2[:, :c_dim]
                ).reshape(n_virtual)
                a_src = jnp.einsum(
                    "ecn,ce->cn", z3, att2[:, c_dim:]
                ).reshape(n_virtual)
                packed_t = pack_gat_table(
                    z3.reshape(c_dim, n_virtual), a_src, n_virtual, t_dtype
                )
                out_h = flash_gat_attention(
                    packed_t, a_dst, g.src, g.dst, g.src_perm, g.src_sorted,
                    n_virtual, c_dim, 0.2, False, _cfg.SEGSUM_TRANSPORT,
                )
                head_outs.append(
                    out_h.reshape(num_channels, num_nodes, c_dim)
                )
            if len(head_outs) == 1:
                out = head_outs[0]
            elif concat:
                out = jnp.concatenate(head_outs, axis=-1)
            else:
                out = sum(head_outs) / heads
            return out + sp["b"][:, None, :]

    if h.ndim == 2:
        z = jnp.einsum("nd,cde->cne", h[:num_nodes], sp["w"])
    else:
        z = jnp.einsum("cnd,cde->cne", h, sp["w"])
    z = z.reshape(num_channels, num_nodes, heads, c_dim)
    att = sp["att"][:, 0]  # [C, H, 2c]
    att_dst, att_src = att[..., :c_dim], att[..., c_dim:]
    a_dst = jnp.sum(z * att_dst[:, None], axis=-1).reshape(n_virtual, heads)
    a_src = jnp.sum(z * att_src[:, None], axis=-1).reshape(n_virtual, heads)
    # Pack a_src as extra feature columns of the z row-gather: XLA lowers
    # 1-D (scalar-row) gathers to a serial scalar loop on TPU (~1.4 GB/s
    # measured), while [E, D] row gathers stream at ~73 GB/s — so the src
    # side rides the wide gather for free.  dst side: ops/gather.gather_dst
    # (sorted-broadcast kernel on TPU).
    packed = msg_cast(
        jnp.concatenate([z.reshape(n_virtual, heads * c_dim), a_src], axis=1)
    )
    packed_e = gather_src(packed, g)  # [E, H*c + H]
    z_e = packed_e[:, : heads * c_dim].reshape(-1, heads, c_dim)
    a_src_e = packed_e[:, heads * c_dim :].astype(jnp.float32)  # logits stay f32
    alpha = jax.nn.leaky_relu(gather_dst(a_dst, g) + a_src_e, 0.2)
    alpha = softmax(alpha, g.dst, n_virtual)
    if dropout > 0.0 and dropout_key is not None:
        keep = jax.random.bernoulli(dropout_key, 1.0 - dropout, alpha.shape)
        alpha = jnp.where(keep, alpha / (1.0 - dropout), 0.0)
    alpha_m = msg_cast(alpha)
    out = (aggregate or C._aggregate)(z_e * alpha_m[:, :, None], g)
    out = out.reshape(num_channels, num_nodes, heads, c_dim)
    if concat:
        out = out.reshape(num_channels, num_nodes, heads * c_dim)
    else:
        out = out.mean(axis=2)
    return out + sp["b"][:, None, :]


def pea_forward_fused(
    params,
    fused_graphs,  # tuple[step] of fused StepGraph (graph.fuse_step_graphs)
    cfg: PEAConfig,
    training: bool = False,
    dropout_key=None,
    aggregate=None,  # override segment reduction (edge-parallel psum path)
    softmax=None,  # override segment softmax (edge-parallel stats exchange)
):
    """All channels advance together: per step, ONE batched einsum + ONE
    union-graph segment reduction instead of num_channels small convs.
    Bitwise math per channel is identical to the per-channel path (tested),
    so checkpoints/configs are interchangeable."""
    n = cfg.num_nodes
    num_steps = cfg.meta_path_steps[0]
    dims = _channel_layer_dims(cfg, num_steps)
    h = params["x"]
    for i in range(num_steps):
        sp = _stacked_step_params(params, i)
        g = fused_graphs[i]
        _, _, heads, _ = dims[i]
        if cfg.conv == "gcn":
            h = _fused_gcn_step(sp, h, g, cfg.num_channels, n, aggregate)
        elif cfg.conv == "sage":
            h = _fused_sage_step(sp, h, g, cfg.num_channels, n, aggregate)
        elif cfg.conv == "gat":
            dk = None
            if training and cfg.dropout > 0.0 and dropout_key is not None:
                dk = jax.random.fold_in(dropout_key, i)
            h = _fused_gat_step(
                sp, h, g, cfg.num_channels, n, heads, True,
                cfg.dropout if training else 0.0, dk,
                aggregate, softmax,
            )
        else:
            raise ValueError(cfg.conv)
        if i < num_steps - 1:
            h = jax.nn.relu(h)
    return jnp.transpose(h, (1, 0, 2))  # [N, C, R]


def _grouped_gat_forward(params, graphs, cfg: PEAConfig, training,
                         dropout_key):
    """Per-channel GAT forward that BATCHES channels sharing one edge list
    (graph.build_metapath_graphs dedupes identical step graphs, so object
    identity is the grouping key) through one streaming kernel pass
    (ops/stream_gat.stream_gat_attention_batched).  Falls back to
    gat_apply per channel wherever batching doesn't apply — math and the
    per-channel dropout RNG recipe are identical to _channel_forward."""
    from ..ops import config as _ops_cfg
    from ..ops.stream_gat import stream_gat_attention_batched, stream_gat_enabled

    n = cfg.num_nodes
    num_steps = cfg.meta_path_steps[0]
    n_chan = cfg.num_channels
    dims = _channel_layer_dims(cfg, num_steps)
    dropout_active = training and cfg.dropout > 0.0 and dropout_key is not None
    dkeys = None
    if dropout_key is not None:
        dkeys = [
            jax.random.split(jax.random.fold_in(dropout_key, c), num_steps)
            for c in range(n_chan)
        ]

    hs = [params["x"]] * n_chan
    for k in range(num_steps):
        _, dout, heads, _ = dims[k]
        groups: dict = {}
        for c in range(n_chan):
            groups.setdefault(id(graphs[c][k]), []).append(c)
        new_hs: list = [None] * n_chan
        # the streaming kernels batch at most 8 channels per pass
        # (stream_gat._layout): split larger shares into <=8-chunks
        # instead of crashing on the assert (round-4 ADVICE #2)
        split_groups = []
        for chans in groups.values():
            for i in range(0, len(chans), 8):
                split_groups.append(chans[i : i + 8])
        for chans in split_groups:
            g = graphs[chans[0]][k]
            batchable = (
                len(chans) > 1
                and heads == 1
                and getattr(g, "gat_loops", False)
                and not dropout_active
                and stream_gat_enabled(
                    g.dst.shape[0], False, kz=dout, n_ch=len(chans)
                )
            )
            if batchable:
                lp = [params["channels"][c][k] for c in chans]
                W = jnp.stack([p["w"] for p in lp])  # [Cg, din, dout]
                att = jnp.stack([p["att"][0, 0] for p in lp])  # [Cg, 2c]
                b = jnp.stack([p["b"] for p in lp])  # [Cg, dout]
                hstack = jnp.stack([hs[c][:n] for c in chans])  # [Cg, N, din]
                z = jnp.einsum("cnd,cde->cne", hstack, W)
                a_dst = jnp.einsum("cne,ce->cn", z, att[:, :dout])
                a_src = jnp.einsum("cne,ce->cn", z, att[:, dout:])
                outb = stream_gat_attention_batched(
                    z, a_src, a_dst, g.src, g.dst, g.src_perm, g.src_sorted,
                    n, True, 0.2, False, _ops_cfg.SEGSUM_TRANSPORT,
                )
                outb = outb + b[:, None, :]
                for i, c in enumerate(chans):
                    new_hs[c] = outb[i]
            else:
                for c in chans:
                    dk = None
                    if dropout_active:
                        dk = dkeys[c][k]
                    new_hs[c] = C.gat_apply(
                        params["channels"][c][k], hs[c], g, heads=heads,
                        concat=True,
                        dropout=cfg.dropout if training else 0.0,
                        dropout_key=dk,
                    )
        if k < num_steps - 1:
            new_hs = [jax.nn.relu(h) for h in new_hs]
        hs = new_hs
    return jnp.stack(hs, axis=1)  # [N, C, R]


@dataclasses.dataclass(frozen=True)
class HybridGATPlan:
    """Build-time channel grouping for the small-N GAT forward.

    Per step: channels sharing one StepGraph (the reference metapath
    table reuses edge lists across channels, utils/general_utils.py:
    300-392) are batched through ops/batch_gat.py's shared-edge kernels;
    the remaining channels run as ONE union graph (graph.fuse_step_graphs
    + the flash/union kernels).  `per_channel` keeps the ungrouped graphs
    for the dropout fallback path.
    """

    # per step: (batched: tuple[(StepGraph, chans)], union: StepGraph|None,
    #            union_chans: tuple[int, ...])
    steps: tuple
    per_channel: tuple  # tuple[channel] of tuple[step] of StepGraph
    num_channels: int

    @property
    def has_batched(self):
        return any(len(s[0]) > 0 for s in self.steps)


def build_hybrid_gat_plan(per_channel_graphs, num_nodes, cfg: PEAConfig):
    """Group channels by StepGraph identity (graph.build_metapath_graphs
    dedupes identical step edge lists) into batched shares of 2..8
    channels; everything else — singleton graphs, multi-head steps,
    VMEM-overflow groups — goes into one union graph per step."""
    from ..graph import fuse_step_graphs
    from ..ops import batch_gat as _bg
    from ..ops import config as _ops_cfg

    num_steps = cfg.meta_path_steps[0]
    dims = _channel_layer_dims(cfg, num_steps)
    itemsize = 2 if _ops_cfg.SEGSUM_TRANSPORT == "bf16" else 4
    steps = []
    for k in range(num_steps):
        _, dout, heads, _ = dims[k]
        groups_d: dict = {}
        for c, ch_graphs in enumerate(per_channel_graphs):
            groups_d.setdefault(id(ch_graphs[k]), []).append(c)
        batched, rest = [], []
        # prefer group sizes whose packed table stays within ONE 128-lane
        # tile (n_ch*(kz+1) <= 128) — the [k_pad, chunk] kernel ops pay
        # physical lanes in 128-tiles (measured ~1.5x per edge at 2 tiles)
        max_per = min(8, max(2, 128 // (dout + 1)))
        for chans in groups_d.values():
            g = per_channel_graphs[chans[0]][k]
            for i in range(0, len(chans), max_per):
                sub = chans[i : i + max_per]
                ok = (
                    len(sub) >= 2
                    and heads == 1
                    and not getattr(g, "gat_loops", False)
                    and _bg._vmem_bytes(num_nodes, dout, len(sub), itemsize)
                    <= _bg._VMEM_BUDGET
                )
                if ok:
                    batched.append((g, tuple(sub)))
                else:
                    rest.extend(sub)
        rest = sorted(rest)
        union = None
        if rest:
            union = fuse_step_graphs(
                [per_channel_graphs[c][k] for c in rest], num_nodes
            )
        steps.append((tuple(batched), union, tuple(rest)))
    return HybridGATPlan(
        steps=tuple(steps),
        per_channel=tuple(per_channel_graphs),
        num_channels=len(per_channel_graphs),
    )


def _stacked_subset_params(params, step_idx, chans):
    per_channel = [params["channels"][c][step_idx] for c in chans]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_channel)


def pea_forward_hybrid(params, plan: HybridGATPlan, cfg: PEAConfig,
                       training=False, dropout_key=None):
    """Hybrid forward: batched shared-edge kernels for grouped channels,
    union flash kernels for the rest.  Math per channel is identical to
    the per-channel/fused paths (tested); attention dropout falls back to
    the per-channel path in pea_forward before reaching here."""
    from ..ops import config as _ops_cfg
    from ..ops.batch_gat import (
        batch_gat_attention,
        batch_gat_enabled,
        batch_gat_reference,
    )

    n = cfg.num_nodes
    num_steps = cfg.meta_path_steps[0]
    dims = _channel_layer_dims(cfg, num_steps)
    n_chan = plan.num_channels
    hs = [None] * n_chan  # step 0 reads the shared embedding table
    for k in range(num_steps):
        _, dout, heads, _ = dims[k]
        batched, union, rest = plan.steps[k]
        new_hs: list = [None] * n_chan
        for g, chans in batched:
            lp = [params["channels"][c][k] for c in chans]
            W = jnp.stack([p["w"] for p in lp])  # [Cg, din, dout] (1 head)
            att = jnp.stack([p["att"][0, 0] for p in lp])  # [Cg, 2c]
            b = jnp.stack([p["b"] for p in lp])  # [Cg, dout]
            if k == 0:
                z = jnp.einsum("nd,cde->cne", params["x"][:n], W)
            else:
                hstack = jnp.stack([hs[c] for c in chans])  # [Cg, N, din]
                z = jnp.einsum("cnd,cde->cne", hstack, W)
            a_dst = jnp.einsum("cne,ce->cn", z, att[:, :dout])
            a_src = jnp.einsum("cne,ce->cn", z, att[:, dout:])
            if batch_gat_enabled(n, dout, len(chans), False):
                outb = batch_gat_attention(
                    z, a_src, a_dst, g.src, g.dst, n, 0.2, False,
                    _ops_cfg.SEGSUM_TRANSPORT,
                )
            else:  # off-TPU / forced-off: identical-semantics XLA oracle
                outb = batch_gat_reference(z, a_src, a_dst, g.src, g.dst, n)
            outb = outb + b[:, None, :]
            for i, c in enumerate(chans):
                new_hs[c] = outb[i]
        if union is not None:
            sp = _stacked_subset_params(params, k, rest)
            if k == 0:
                h_in = params["x"]
            else:
                h_in = jnp.stack([hs[c] for c in rest])
            out_u = _fused_gat_step(
                sp, h_in, union, len(rest), n, heads, True, 0.0, None
            )
            for i, c in enumerate(rest):
                new_hs[c] = out_u[i]
        if k < num_steps - 1:
            new_hs = [jax.nn.relu(h) for h in new_hs]
        hs = new_hs
    return jnp.stack(hs, axis=1)  # [N, C, R]


def pea_forward(
    params,
    graphs,  # tuple[channel] of tuple[step] of StepGraph, OR fused tuple[step]
    cfg: PEAConfig,
    channel_mask: Optional[jnp.ndarray] = None,  # float[num_channels]; 0 ablates
    training: bool = False,
    dropout_key=None,
):
    """Full-graph forward -> cached representation [num_nodes, repr-like]."""
    hybrid = isinstance(graphs, HybridGATPlan)
    if hybrid and training and cfg.dropout > 0.0 and dropout_key is not None:
        # dropout needs per-edge RNG over per-channel edge lists —
        # identical recipe to the ungrouped path
        graphs, hybrid = graphs.per_channel, False
    fused = (
        not hybrid
        and len(graphs) > 0
        and isinstance(graphs[0], StepGraph)
    )
    if hybrid:
        h = pea_forward_hybrid(params, graphs, cfg, training=training,
                               dropout_key=dropout_key)
    elif fused:
        h = pea_forward_fused(params, graphs, cfg, training=training, dropout_key=dropout_key)
    elif cfg.conv == "gat" and len(set(cfg.meta_path_steps)) == 1:
        h = _grouped_gat_forward(params, graphs, cfg, training, dropout_key)
    else:
        x = params["x"]
        outs = []
        for c, (layers, steps) in enumerate(zip(params["channels"], graphs)):
            dims = _channel_layer_dims(cfg, cfg.meta_path_steps[c])
            dkeys = None
            if dropout_key is not None:
                dkeys = jax.random.split(jax.random.fold_in(dropout_key, c), len(layers))
            outs.append(_channel_forward(cfg, layers, x, steps, dims, dkeys, training))
        h = jnp.stack(outs, axis=1)  # [N, C, R]
    if channel_mask is not None:
        h = h * channel_mask[None, :, None]

    if cfg.channel_aggr == "concat":
        return h.reshape(h.shape[0], -1)
    if cfg.channel_aggr == "mean":
        return h.mean(axis=1)
    if cfg.channel_aggr == "att":
        atts = jax.nn.softmax(jnp.sum(h * params["att"], axis=-1), axis=-1)
        return jnp.sum(h * atts[..., None], axis=1)
    raise ValueError(cfg.channel_aggr)


def pea_predict(params, cached_repr, unids, inids):
    """2-layer MLP pair scorer (base.py:208-214) -> float[B]."""
    u = cached_repr[unids]
    i = cached_repr[inids]
    z = jnp.concatenate([u, i], axis=-1)
    z = jax.nn.relu(linear(params["fc1"], z))
    return linear(params["fc2"], z)[..., 0]


def _log_sigmoid(z):
    # numerically stable log σ(z) = -softplus(-z)
    return -jax.nn.softplus(-z)


def entity_reg_loss(x_table, batch, row_mask):
    """Entity-aware contrastive regularizer, exactly as base.py:50-76.

    batch columns: [u, pos_i, neg_i, pos_item_ent, neg_item_ent, item_mask,
                    pos_user_ent, neg_user_ent, user_mask].
    """
    def sq(a, b):
        d = x_table[a] - x_table[b]
        return jnp.sum(d * d, axis=-1)

    item_pos = sq(batch[:, 1], batch[:, 3])
    item_neg = sq(batch[:, 1], batch[:, 4])
    user_pos = sq(batch[:, 0], batch[:, 6])
    user_neg = sq(batch[:, 0], batch[:, 7])
    item_term = -_log_sigmoid((item_pos - item_neg) * batch[:, 5])
    user_term = -_log_sigmoid((user_pos - user_neg) * batch[:, 8])
    return jnp.sum((item_term + user_term) * row_mask)


def pea_loss(
    params,
    graphs,
    cfg: PEAConfig,
    batch,  # int32[B, 3] or [B, 9] (entity-aware)
    row_mask=None,  # float[B]; 0 for padding rows of the last partial batch
    training: bool = True,
    dropout_key=None,
):
    """BPR loss with optional entity-aware regularizer (base.py:43-80)."""
    if row_mask is None:
        row_mask = jnp.ones(batch.shape[0], dtype=jnp.float32)
    cached = pea_forward(params, graphs, cfg, training=training, dropout_key=dropout_key)
    pos = pea_predict(params, cached, batch[:, 0], batch[:, 1])
    neg = pea_predict(params, cached, batch[:, 0], batch[:, 2])
    cf_loss = jnp.sum(-_log_sigmoid(pos - neg) * row_mask)
    if cfg.entity_aware and training:
        reg = entity_reg_loss(params["x"], batch, row_mask)
        return cf_loss + cfg.entity_aware_coff * reg
    return cf_loss
