"""KGAT / KGCN knowledge-graph baselines.

Replicates the two-phase reference models (experiments/kgat_solver_bpr.py,
kgcn_solver_bpr.py + models/kgat.py, kgcn.py):

  graph      : all typed relations + reversed copies with negated relation
               ids (kgat_solver_bpr.py:126-140)
  kg phase   : TransR-projected BPR over (h, t_pos, t_neg, r) with corrupted
               tails (kgat_solver_bpr.py:110-124); NOTE the reference ranks
               pos_dist - neg_dist through -log sigmoid exactly as written.
  attention  : trans_vec = r[|rel|] * sign(rel)
               KGAT:  alpha_e = (x_dst P) . tanh(x_src P + trans_vec)
               KGCN:  alpha_e = x_dst . trans_vec
               att = segment_softmax(alpha, dst)   (solver :311-320)
  cf phase   : 3 conv layers with frozen att, dropout, concat of
               L2-normalized outputs; dot-product predict (models/kgat.py:45-56)
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..graph import StepGraph
from ..nn import conv as C
from ..ops import segment_softmax_auto
from .ngcf import _dropout, _l2norm
from .pea import _log_sigmoid


@dataclasses.dataclass(frozen=True)
class KGConfig:
    variant: str  # 'kgat' | 'kgcn'
    num_nodes: int
    num_relations: int
    emb_dim: int = 64
    hidden_size: int = 64
    dropout: float = 0.0

    @property
    def emb_rows(self):
        return -(-self.num_nodes // 128) * 128

    @property
    def layer_dims(self):
        h = self.hidden_size
        return [(self.emb_dim, h), (h, h // 2), (h // 2, h // 4)]


def kg_init(key, cfg: KGConfig):
    kx, kr, kp, k1, k2, k3 = jax.random.split(key, 6)
    bound = math.sqrt(6.0 / (cfg.num_nodes + cfg.emb_dim))
    from ..nn.init import glorot

    params = {
        "x": jax.random.uniform(kx, (cfg.emb_rows, cfg.emb_dim), minval=-bound, maxval=bound),
        "r": glorot(kr, (cfg.num_relations, cfg.emb_dim)),
        "proj": glorot(kp, (cfg.emb_dim, cfg.emb_dim)),
    }
    init = C.kgat_init if cfg.variant == "kgat" else C.kgcn_init
    for k, name, (din, dout) in zip((k1, k2, k3), ("conv1", "conv2", "conv3"), cfg.layer_dims):
        params[name] = init(k, din, dout)
    return params


def compute_att_map(params, g: StepGraph, cfg: KGConfig, softmax=None):
    """Per-edge attention over the signed typed graph (solver :311-320).
    Padding edges fall in the dropped sentinel segment; their values are
    irrelevant but finite.  `softmax` overrides the segment softmax (the
    edge-sharded two-pass stats exchange, parallel/edge_parallel.py)."""
    x, r = params["x"], params["r"]
    sign = jnp.where(g.rel < 0, -1.0, 1.0)  # sign(0) := 1 as in the reference
    trans_vec = r[jnp.abs(g.rel)] * sign[:, None]
    x_dst = x[g.dst]  # padding dst == num_nodes gathers clipped row; dropped
    x_src = x[g.src]
    if cfg.variant == "kgat":
        alpha = jnp.sum(
            jnp.dot(x_dst, params["proj"], preferred_element_type=jnp.float32)
            * jnp.tanh(jnp.dot(x_src, params["proj"], preferred_element_type=jnp.float32) + trans_vec),
            axis=-1,
        )
    else:
        alpha = jnp.sum(x_dst * trans_vec, axis=-1)
    alpha = jax.lax.stop_gradient(alpha)
    return (softmax or segment_softmax_auto)(alpha, g.dst, g.num_nodes)


def kg_forward(params, g: StepGraph, cfg: KGConfig, att_map, training=False,
               dropout_key=None, aggregate=None):
    keys = (None, None, None)
    if training and cfg.dropout > 0 and dropout_key is not None:
        keys = jax.random.split(dropout_key, 3)
    apply = C.kgat_apply if cfg.variant == "kgat" else C.kgcn_apply

    def conv(p, x):
        return apply(p, x, g, att_map, aggregate=aggregate)

    x1 = _dropout(conv(params["conv1"], params["x"]), cfg.dropout, keys[0])
    x2 = _dropout(conv(params["conv2"], x1), cfg.dropout, keys[1])
    x3 = _dropout(conv(params["conv3"], x2), cfg.dropout, keys[2])
    return jnp.concatenate([_l2norm(x1), _l2norm(x2), _l2norm(x3)], axis=-1)


def kg_predict(params, cached, unids, inids):
    return jnp.sum(cached[unids] * cached[inids], axis=-1)


def transr_kg_loss(params, batch, row_mask):
    """TransR BPR over corrupted tails (kgat_solver_bpr.py:110-124)."""
    proj = params["proj"]
    h = jnp.dot(params["x"][batch[:, 0]], proj, preferred_element_type=jnp.float32)
    pos_t = jnp.dot(params["x"][batch[:, 1]], proj, preferred_element_type=jnp.float32)
    neg_t = jnp.dot(params["x"][batch[:, 2]], proj, preferred_element_type=jnp.float32)
    r = params["r"][batch[:, 3]]
    pos_pred = jnp.sum((h + r - pos_t) ** 2, axis=-1)
    neg_pred = jnp.sum((h + r - neg_t) ** 2, axis=-1)
    return jnp.sum(-_log_sigmoid(pos_pred - neg_pred) * row_mask)


def kg_cf_loss(params, g, cfg, att_map, batch, row_mask, training=True,
               dropout_key=None, aggregate=None):
    cached = kg_forward(params, g, cfg, att_map, training=training,
                        dropout_key=dropout_key, aggregate=aggregate)
    pos = kg_predict(params, cached, batch[:, 0], batch[:, 1])
    neg = kg_predict(params, cached, batch[:, 0], batch[:, 2])
    return jnp.sum(-_log_sigmoid(pos - neg) * row_mask)
