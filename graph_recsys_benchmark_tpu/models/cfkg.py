"""CFKG: pure translational KG embedding recommender.

Reference: models/cfkg.py + experiments/cfkg_solver_bpr.py.  Trained ONLY on
the knowledge-graph objective over all typed edges with corrupted tails
(cfkg_solver_bpr.py:95-106):

  kg_loss = -( Σ log σ((h+r)·t_pos) + Σ log σ(-(h+r)·t_neg) )

Prediction ranks items by exp(Σ (x_u + r_user2item) ⊙ x_i) (cfkg.py:21-27);
node ids are used directly (MODEL_TYPE='Graph', no offset shifting).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..nn.init import glorot
from .pea import _log_sigmoid


@dataclasses.dataclass(frozen=True)
class CFKGConfig:
    num_nodes: int
    num_relations: int
    user2item_rel: int
    emb_dim: int = 64

    @property
    def emb_rows(self):
        return -(-self.num_nodes // 128) * 128


def cfkg_init(key, cfg: CFKGConfig):
    kx, kr = jax.random.split(key)
    bound = math.sqrt(6.0 / (cfg.num_nodes + cfg.emb_dim))
    return {
        "x": jax.random.uniform(kx, (cfg.emb_rows, cfg.emb_dim), minval=-bound, maxval=bound),
        "r": glorot(kr, (cfg.num_relations, cfg.emb_dim)),
    }


def cfkg_predict(params, cfg: CFKGConfig, unids, inids):
    u = params["x"][unids]
    i = params["x"][inids]
    r = params["r"][cfg.user2item_rel]
    return jnp.exp(jnp.sum((u + r) * i, axis=-1))


def cfkg_kg_loss(params, batch, row_mask):
    """batch cols: (h, t_pos, t_neg, rel)."""
    h = params["x"][batch[:, 0]]
    pos_t = params["x"][batch[:, 1]]
    neg_t = params["x"][batch[:, 2]]
    r = params["r"][batch[:, 3]]
    pos_sim = jnp.sum((h + r) * pos_t, axis=-1)
    neg_sim = jnp.sum((h + r) * neg_t, axis=-1)
    return -jnp.sum((_log_sigmoid(pos_sim) + _log_sigmoid(-neg_sim)) * row_mask)
