"""Graph conv layers as pure (params, x, graph) -> x functions.

Each conv replicates the math of the layer the reference uses, re-designed
for TPU: all degree/self-loop work is precompiled into the StepGraph
(graph.py), messages are gathered with XLA dense gathers, and the segment
reduction runs on the Pallas MXU kernel on TPU (ops/pallas_segment.py) or
XLA scatter elsewhere.

Semantics sources (PyG 1.5.0 — pinned by the reference requirements.txt):
  GCNConv : out_i = sum_{(j,i) in E+I} (deg_j^-1/2 deg_i^-1/2) (x_j W) + b
            with deg over the *source* row of A+I  [torch_geometric/nn/conv/gcn_conv.py]
  GATConv : alpha_e = softmax_dst(leaky_relu(att_dst . (x_i W) + att_src . (x_j W)))
            out_i = concat_heads(sum_j alpha_e (x_j W)) + b  [gat_conv.py]
  SAGEConv: out = mean_j(x_j) W_rel + b + x W_root            [sage_conv.py]
  NGCFConv: reference nn/ngcf_conv.py:42-48
  KGATConv: reference nn/kgat_conv.py:43-54
  KGCNConv: reference nn/kgcn_conv.py:39-44
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..graph import StepGraph
from ..ops.config import msg_cast
from ..ops.gather import gather_dst, gather_src
from ..ops.pallas_segment import segment_softmax_auto, segment_sum_auto
from .init import glorot, torch_linear_bias, torch_linear_weight, zeros_init


def _aggregate(msgs, g: StepGraph, use_pallas=None):
    """Segment-sum edge messages into destination nodes.

    msgs may be [E, D] or [E, H, C]; reshaped to 2D for the Pallas path."""
    shape = msgs.shape
    if msgs.ndim > 2:
        msgs = msgs.reshape(shape[0], -1)
    out = segment_sum_auto(msgs, g.dst, g.num_nodes, use_pallas=use_pallas)
    if len(shape) > 2:
        out = out.reshape((g.num_nodes,) + shape[1:])
    return out


def _dot(x, w):
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------- GCNConv


def gcn_init(key, in_dim, out_dim):
    return {"w": glorot(key, (in_dim, out_dim)), "b": zeros_init((out_dim,))}


def gcn_apply(params, x, g: StepGraph, use_pallas=None):
    h = _dot(x, params["w"])
    h, w = msg_cast(h, g.w)
    msgs = w[:, None] * gather_src(h, g)
    return _aggregate(msgs, g, use_pallas) + params["b"]


# ---------------------------------------------------------------- GATConv


def gat_init(key, in_dim, out_dim, heads=1):
    kw, ka = jax.random.split(key)
    return {
        "w": glorot(kw, (in_dim, heads * out_dim)),
        # stored exactly as PyG's att param [1, H, 2C] so glorot fan matches
        "att": glorot(ka, (1, heads, 2 * out_dim)),
        "b": zeros_init((heads * out_dim,)),
    }


def gat_apply(
    params,
    x,
    g: StepGraph,
    heads=1,
    concat=True,
    negative_slope=0.2,
    dropout=0.0,
    dropout_key=None,
    use_pallas=None,
):
    n = g.num_nodes
    # x may carry sharding-padded extra rows (models/pea.py emb_rows);
    # reshape over its true row count, aggregate into n destination rows.
    h = _dot(x, params["w"]).reshape(x.shape[0], heads, -1)  # [N_pad, H, C]
    att = params["att"][0]  # [H, 2C]
    c = att.shape[-1] // 2
    att_dst, att_src = att[:, :c], att[:, c:]  # x_i (target) first, then x_j
    alpha_dst = jnp.sum(h * att_dst[None], axis=-1)  # [N, H]
    alpha_src = jnp.sum(h * att_src[None], axis=-1)

    if getattr(g, "gat_loops", False):
        # Implicit-self-loop graph (sparse large-scale regime): streaming
        # kernel pipeline per head (ops/stream_gat.py), XLA reference off
        # TPU / under attention dropout.  Math = PyG GATConv with the loop
        # term added analytically (tested vs the loop-edge oracle).
        from ..ops import config as _cfg
        from ..ops.stream_gat import (
            stream_gat_attention,
            stream_gat_enabled,
            stream_gat_reference,
        )

        dropout_active = dropout > 0.0 and dropout_key is not None
        use_stream = stream_gat_enabled(
            g.dst.shape[0], dropout_active, use_pallas, kz=c
        )
        head_outs = []
        for hh in range(heads):
            z_h = h[:n, hh]
            asrc = alpha_src[:n, hh]
            adst = alpha_dst[:n, hh]
            if use_stream:
                o = stream_gat_attention(
                    z_h, asrc, adst, g.src, g.dst, g.src_perm, g.src_sorted,
                    n, True, negative_slope, False, _cfg.SEGSUM_TRANSPORT,
                )
            else:
                ek = lk = None
                if dropout_active:
                    k1, k2 = jax.random.split(
                        jax.random.fold_in(dropout_key, hh)
                    )
                    ek = jax.random.bernoulli(k1, 1.0 - dropout, g.dst.shape)
                    lk = jax.random.bernoulli(k2, 1.0 - dropout, (n,))
                o = stream_gat_reference(
                    z_h, asrc, adst, g.src, g.dst, n, True, negative_slope,
                    edge_keep=ek, loop_keep=lk,
                    dropout=dropout if dropout_active else 0.0,
                )
            head_outs.append(o)
        if concat:
            out = jnp.concatenate(head_outs, axis=-1)
        else:
            out = sum(head_outs) / heads
        return out + params["b"]
    # src-side logits ride the wide row gather as extra columns (1-D gathers
    # lower to a serial scalar loop on TPU — see models/pea._fused_gat_step)
    packed = msg_cast(
        jnp.concatenate([h.reshape(h.shape[0], heads * c), alpha_src], axis=1)
    )
    packed_e = gather_src(packed, g)  # [E, H*C + H]
    h_e = packed_e[:, : heads * c].reshape(-1, heads, c)
    alpha_src_e = packed_e[:, heads * c :].astype(jnp.float32)
    alpha = gather_dst(alpha_dst, g) + alpha_src_e  # [E, H]
    alpha = jax.nn.leaky_relu(alpha, negative_slope)
    alpha = segment_softmax_auto(alpha, g.dst, n)
    if dropout > 0.0 and dropout_key is not None:
        keep = jax.random.bernoulli(dropout_key, 1.0 - dropout, alpha.shape)
        alpha = jnp.where(keep, alpha / (1.0 - dropout), 0.0)
    alpha = msg_cast(alpha)
    msgs = h_e * alpha[:, :, None]  # [E, H, C]
    out = _aggregate(msgs, g, use_pallas)  # [N, H, C]
    if concat:
        out = out.reshape(n, heads * c)
    else:
        out = out.mean(axis=1)
    return out + params["b"]


# ---------------------------------------------------------------- SAGEConv


def sage_init(key, in_dim, out_dim):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "w_rel": torch_linear_weight(k1, in_dim, out_dim),
        "b_rel": torch_linear_bias(k2, in_dim, out_dim),
        "w_root": torch_linear_weight(k3, in_dim, out_dim),
    }


def sage_apply(params, x, g: StepGraph, use_pallas=None):
    # g.w = 1/indeg(dst) turns the segment-sum into PyG's mean aggregation.
    # x may carry sharding-padded rows; node-aligned terms slice to num_nodes.
    xm, w = msg_cast(x, g.w)
    msgs = w[:, None] * gather_src(xm, g)
    mean_agg = _aggregate(msgs, g, use_pallas)
    root = _dot(x[: g.num_nodes], params["w_root"])
    return _dot(mean_agg, params["w_rel"]) + params["b_rel"] + root


# ---------------------------------------------------------------- NGCFConv


def ngcf_init(key, in_dim, out_dim):
    k1, k2 = jax.random.split(key)
    return {"w1": glorot(k1, (in_dim, out_dim)), "w2": glorot(k2, (in_dim, out_dim))}


def ngcf_apply(params, x, g: StepGraph, negative_slope=0.2, use_pallas=None):
    x_j, x_i = gather_src(x, g), gather_dst(x, g)
    msgs = g.w[:, None] * (_dot(x_j, params["w1"]) + _dot(x_i * x_j, params["w2"]))
    aggr = _aggregate(msgs, g, use_pallas)
    return jax.nn.leaky_relu(_dot(x[: g.num_nodes], params["w1"]) + aggr, negative_slope)


# ---------------------------------------------------------------- KGATConv


def kgat_init(key, in_dim, out_dim):
    k1, k2 = jax.random.split(key)
    return {
        "w_add": glorot(k1, (in_dim, out_dim)),
        "w_bi": glorot(k2, (in_dim, out_dim)),
        "b": zeros_init((out_dim,)),
    }


def kgat_apply(params, x, g: StepGraph, att_map, negative_slope=0.2, use_pallas=None,
               aggregate=None):
    """att_map: float[E_pad] per-edge attention (0 on padding).
    `aggregate` overrides the segment reduction (edge-parallel psum path)."""
    xm, att = msg_cast(x, att_map)
    aggr = (aggregate or _aggregate)(att[:, None] * gather_src(xm, g), g, use_pallas)
    xn = x[: g.num_nodes]
    add_aggr = jax.nn.leaky_relu(_dot(xn + aggr, params["w_add"]), negative_slope)
    bi_aggr = jax.nn.leaky_relu(_dot(xn * aggr, params["w_bi"]), negative_slope)
    return add_aggr + bi_aggr + params["b"]


# ---------------------------------------------------------------- KGCNConv


def kgcn_init(key, in_dim, out_dim):
    return {"w": glorot(key, (in_dim, out_dim)), "b": zeros_init((out_dim,))}


def kgcn_apply(params, x, g: StepGraph, att_map, use_pallas=None, aggregate=None):
    xm, att = msg_cast(x, att_map)
    aggr = (aggregate or _aggregate)(att[:, None] * gather_src(xm, g), g, use_pallas)
    return jax.nn.relu(_dot(aggr + x[: g.num_nodes], params["w"]) + params["b"])
