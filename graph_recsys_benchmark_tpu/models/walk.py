"""Walk-based scorer: frozen pretrained embedding + 2-layer MLP pair scorer.

Reference models/walk.py:11-33 — `cached_repr` is the (frozen) MetaPath2Vec
embedding; predict = fc2(relu(fc1([u_repr, i_repr]))); trained with BPR.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn.init import linear, torch_linear_params
from .pea import _log_sigmoid


def walk_init(key, embedding_dim):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": torch_linear_params(k1, 2 * embedding_dim, embedding_dim, glorot_weight=True),
        "fc2": torch_linear_params(k2, embedding_dim, 1, glorot_weight=True),
    }


def walk_predict(params, embedding, unids, inids):
    z = jnp.concatenate([embedding[unids], embedding[inids]], axis=-1)
    return linear(params["fc2"], jax.nn.relu(linear(params["fc1"], z)))[..., 0]


def walk_bpr_loss(params, embedding, batch, row_mask):
    pos = walk_predict(params, embedding, batch[:, 0], batch[:, 1])
    neg = walk_predict(params, embedding, batch[:, 0], batch[:, 2])
    return jnp.sum(-_log_sigmoid(pos - neg) * row_mask)
