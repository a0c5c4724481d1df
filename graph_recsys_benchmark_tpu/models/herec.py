"""HeRec: MF + per-metapath random-walk embedding fusion (reference
models/herec.py).

  score(u, i) = user_emb[u] . item_emb[i]
              + (Σ_k σ(W_k rk_k[u_nid])) . user_rk_bias[u]
              + (Σ_k σ(W_k rk_k[i_nid])) . item_rk_bias[i]

rk_k are the frozen per-metapath MetaPath2Vec embeddings (indexed by GLOBAL
node id, herec.py:38-45); user_emb/item_emb/biases are local (minus type
offsets).  Trained with MSE on ratings (herec_solver_bpr.py:20).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn.init import glorot, torch_linear_bias


def herec_init(key, num_uids, num_iids, embedding_dim, num_metapaths):
    keys = jax.random.split(key, 4 + num_metapaths)
    params = {
        "user_emb": glorot(keys[0], (num_uids, embedding_dim)),
        "item_emb": glorot(keys[1], (num_iids, embedding_dim)),
        "user_rk_bias": glorot(keys[2], (num_uids, embedding_dim)),
        "item_rk_bias": glorot(keys[3], (num_iids, embedding_dim)),
        "trans": [],
    }
    trans = []
    for k in range(num_metapaths):
        kw = keys[4 + k]
        kb = jax.random.fold_in(kw, 1)
        trans.append(
            {
                "w": glorot(kw, (embedding_dim, embedding_dim)),
                "b": torch_linear_bias(kb, embedding_dim, embedding_dim),
            }
        )
    params["trans"] = tuple(trans)
    return params


def _fused_rk(params, rk_embeddings, nids):
    total = 0.0
    for tr, rk in zip(params["trans"], rk_embeddings):
        z = jnp.dot(rk[nids], tr["w"], preferred_element_type=jnp.float32) + tr["b"]
        total = total + jax.nn.sigmoid(z)
    return total


def herec_predict(params, rk_embeddings, acc_uids, acc_iids, unids, inids):
    u_loc = unids - acc_uids
    i_loc = inids - acc_iids
    pred = jnp.sum(params["user_emb"][u_loc] * params["item_emb"][i_loc], axis=-1)
    pred = pred + jnp.sum(
        _fused_rk(params, rk_embeddings, unids) * params["user_rk_bias"][u_loc], axis=-1
    )
    pred = pred + jnp.sum(
        _fused_rk(params, rk_embeddings, inids) * params["item_rk_bias"][i_loc], axis=-1
    )
    return pred


def herec_mse_loss(params, rk_embeddings, acc_uids, acc_iids, pair, rating, row_mask):
    pred = herec_predict(params, rk_embeddings, acc_uids, acc_iids, pair[:, 0], pair[:, 1])
    n = jnp.maximum(jnp.sum(row_mask), 1.0)
    return jnp.sum(((pred - rating) ** 2) * row_mask) / n
