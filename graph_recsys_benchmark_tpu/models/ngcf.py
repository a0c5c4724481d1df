"""NGCF baseline (reference models/ngcf.py + nn/ngcf_conv.py).

Three NGCFConv layers over the bidirectional user-item interaction graph
(experiments/ngcf_solver_bpr.py:102-107 builds user2item ∪ flipped), with
dropout after each conv and the final representation = concat of the three
L2-normalized layer outputs; pair score = dot product (ngcf.py:37-48).
Supports the entity-aware regularizer via GraphRecsysModel.loss
(base.py:50-76), like the reference.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..graph import StepGraph
from ..nn import conv as C
from .pea import _log_sigmoid, entity_reg_loss


@dataclasses.dataclass(frozen=True)
class NGCFConfig:
    num_nodes: int
    emb_dim: int = 64
    hidden_size: int = 64
    dropout: float = 0.0
    entity_aware: bool = False
    entity_aware_coff: float = 0.1

    @property
    def emb_rows(self):
        return -(-self.num_nodes // 128) * 128

    @property
    def layer_dims(self):
        h = self.hidden_size
        return [(self.emb_dim, h), (h, h // 2), (h // 2, h // 4)]


def ngcf_init(key, cfg: NGCFConfig):
    kx, k1, k2, k3 = jax.random.split(key, 4)
    bound = math.sqrt(6.0 / (cfg.num_nodes + cfg.emb_dim))
    params = {
        "x": jax.random.uniform(kx, (cfg.emb_rows, cfg.emb_dim), minval=-bound, maxval=bound)
    }
    for k, name, (din, dout) in zip((k1, k2, k3), ("conv1", "conv2", "conv3"), cfg.layer_dims):
        params[name] = C.ngcf_init(k, din, dout)
    return params


def _dropout(x, rate, key):
    if key is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _l2norm(x):
    # torch F.normalize(dim=-1) semantics (eps=1e-12)
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(n, 1e-12)


def ngcf_forward(params, g: StepGraph, cfg: NGCFConfig, training=False, dropout_key=None):
    keys = (None, None, None)
    if training and cfg.dropout > 0 and dropout_key is not None:
        keys = jax.random.split(dropout_key, 3)
    x1 = _dropout(C.ngcf_apply(params["conv1"], params["x"], g), cfg.dropout, keys[0])
    x2 = _dropout(C.ngcf_apply(params["conv2"], x1, g), cfg.dropout, keys[1])
    x3 = _dropout(C.ngcf_apply(params["conv3"], x2, g), cfg.dropout, keys[2])
    return jnp.concatenate([_l2norm(x1), _l2norm(x2), _l2norm(x3)], axis=-1)


def ngcf_predict(params, cached, unids, inids):
    return jnp.sum(cached[unids] * cached[inids], axis=-1)


def ngcf_loss(params, g, cfg: NGCFConfig, batch, row_mask=None, training=True, dropout_key=None):
    if row_mask is None:
        row_mask = jnp.ones(batch.shape[0], dtype=jnp.float32)
    cached = ngcf_forward(params, g, cfg, training=training, dropout_key=dropout_key)
    pos = ngcf_predict(params, cached, batch[:, 0], batch[:, 1])
    neg = ngcf_predict(params, cached, batch[:, 0], batch[:, 2])
    cf = jnp.sum(-_log_sigmoid(pos - neg) * row_mask)
    if cfg.entity_aware and training:
        cf = cf + cfg.entity_aware_coff * entity_reg_loss(params["x"], batch, row_mask)
    return cf
