"""Neural Factorization Machine over (uid, iid) fields — native rebuild of
the `torchfm` NeuralFactorizationMachineModel the reference wraps
(models/nfm.py:10-11; torchfm 0.7.0):

  linear  = w_u[uid] + w_i[iid] + b                     (FeaturesLinear)
  fm      = 0.5 * ((v_u + v_i)^2 - v_u^2 - v_i^2)       (bi-interaction)
          -> BatchNorm1d -> dropout
  mlp     = Linear(d, hidden) -> BN -> ReLU -> dropout -> Linear(hidden, 1)
  score   = linear + mlp(fm)

Trained with MSE on 0/1 labels — the reference's NFM solver overrides the
BCE loss with torch.nn.MSELoss on BCE-style labels (models/nfm.py:21-33).
BatchNorm running statistics live in a `state` pytree threaded through the
train scan (train mode uses batch stats, eval uses running stats, momentum
0.1, eps 1e-5 — torch defaults).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..nn.init import torch_linear_params, linear


@dataclasses.dataclass(frozen=True)
class NFMConfig:
    num_users: int
    num_items: int
    emb_dim: int = 64
    hidden_size: int = 64
    dropout: float = 0.3
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5


def nfm_init(key, cfg: NFMConfig):
    ke, kl, k1, k2 = jax.random.split(key, 4)
    n = cfg.num_users + cfg.num_items
    # torchfm FeaturesEmbedding / FeaturesLinear use xavier-uniform
    a = math.sqrt(6.0 / (n + cfg.emb_dim))
    params = {
        "emb": jax.random.uniform(ke, (n, cfg.emb_dim), minval=-a, maxval=a),
        "lin_w": jax.random.uniform(
            kl, (n, 1), minval=-math.sqrt(6.0 / (n + 1)), maxval=math.sqrt(6.0 / (n + 1))
        ),
        "bias": jnp.zeros((1,)),
        "bn0_scale": jnp.ones((cfg.emb_dim,)),
        "bn0_bias": jnp.zeros((cfg.emb_dim,)),
        "fc1": torch_linear_params(k1, cfg.emb_dim, cfg.hidden_size),
        "bn1_scale": jnp.ones((cfg.hidden_size,)),
        "bn1_bias": jnp.zeros((cfg.hidden_size,)),
        "fc2": torch_linear_params(k2, cfg.hidden_size, 1),
    }
    state = {
        "bn0_mean": jnp.zeros((cfg.emb_dim,)),
        "bn0_var": jnp.ones((cfg.emb_dim,)),
        "bn1_mean": jnp.zeros((cfg.hidden_size,)),
        "bn1_var": jnp.ones((cfg.hidden_size,)),
    }
    return {"params": params, "state": state}


def _batchnorm(x, scale, bias, mean, var, row_mask, training, momentum, eps):
    """BatchNorm1d with padded-row masking; returns (y, new_mean, new_var)."""
    if training:
        w = row_mask[:, None]
        n = jnp.maximum(jnp.sum(row_mask), 1.0)
        mu = jnp.sum(x * w, axis=0) / n
        v = jnp.sum(((x - mu) ** 2) * w, axis=0) / n
        # torch tracks unbiased running var
        unbiased = v * n / jnp.maximum(n - 1.0, 1.0)
        new_mean = (1 - momentum) * mean + momentum * mu
        new_var = (1 - momentum) * var + momentum * unbiased
        y = (x - mu) / jnp.sqrt(v + eps)
        return y * scale + bias, new_mean, new_var
    y = (x - mean) / jnp.sqrt(var + eps)
    return y * scale + bias, mean, var


def _dropout(x, rate, key):
    if key is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def nfm_forward(tree, cfg: NFMConfig, uids, iids, row_mask=None, training=False, dropout_key=None):
    """Returns (scores, new_state)."""
    p, s = tree["params"], tree["state"]
    if row_mask is None:
        row_mask = jnp.ones(uids.shape[0], dtype=jnp.float32)
    k0 = k1 = None
    if training and dropout_key is not None and cfg.dropout > 0:
        k0, k1 = jax.random.split(dropout_key)

    iid_idx = iids + cfg.num_users  # torchfm field offset
    lin = p["lin_w"][uids, 0] + p["lin_w"][iid_idx, 0] + p["bias"][0]

    vu = p["emb"][uids]
    vi = p["emb"][iid_idx]
    fm = 0.5 * ((vu + vi) ** 2 - vu**2 - vi**2)
    fm, m0, v0 = _batchnorm(
        fm, p["bn0_scale"], p["bn0_bias"], s["bn0_mean"], s["bn0_var"],
        row_mask, training, cfg.bn_momentum, cfg.bn_eps,
    )
    fm = _dropout(fm, cfg.dropout, k0)

    h = linear(p["fc1"], fm)
    h, m1, v1 = _batchnorm(
        h, p["bn1_scale"], p["bn1_bias"], s["bn1_mean"], s["bn1_var"],
        row_mask, training, cfg.bn_momentum, cfg.bn_eps,
    )
    h = jax.nn.relu(h)
    h = _dropout(h, cfg.dropout, k1)
    out = linear(p["fc2"], h)[:, 0]

    new_state = {"bn0_mean": m0, "bn0_var": v0, "bn1_mean": m1, "bn1_var": v1}
    return lin + out, new_state


def nfm_mse_loss(tree, cfg: NFMConfig, batch, row_mask, dropout_key=None):
    """MSE on 0/1 labels (models/nfm.py:22-27); batch cols (u, i, label)."""
    scores, new_state = nfm_forward(
        tree, cfg, batch[:, 0], batch[:, 1], row_mask, training=True, dropout_key=dropout_key
    )
    label = batch[:, 2].astype(jnp.float32)
    n = jnp.maximum(jnp.sum(row_mask), 1.0)
    loss = jnp.sum(((scores - label) ** 2) * row_mask) / n
    return loss, new_state
