"""Two-stage walk-based trainers: MetaPath2Vec and HeRec.

Stage 1 (both): metapath-guided random-walk skip-gram pretraining — the
reference's DataLoader-over-start-nodes loop (metapath2vec_solver_bpr.py:
197-222, one pass, SparseAdam) becomes a single jitted lax.scan over
start-node batches with the device-side walker (models/metapath2vec.py).

Stage 2:
  MetaPath2Vec: freeze the embedding, train the 2-layer-MLP pair scorer
    with BPR (metapath2vec_solver_bpr.py:225-300, models/walk.py).
  HeRec: one pretrained embedding per metapath (2 for ml / yelp,
    herec_solver_bpr.py:166-252), fused MF model trained with MSE on
    ratings (models/herec.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.hin import HINData
from ..models import herec as M_herec
from ..models import metapath2vec as M_mp2v
from ..models import walk as M_walk
from .engine import GraphEpochEngine
from .optim import make_optimizer

ML_MP2V_STEPS = [
    ("user2item", False),
    ("genre2item", True),
    ("genre2item", False),
    ("user2item", True),
]  # uid -> iid -> genre -> iid -> uid (metapath2vec_solver_bpr.py:147-160)

ML_HEREC_METAPATHS = [
    ML_MP2V_STEPS,
    [("user2item", False), ("user2item", True)],
]  # herec_solver_bpr.py:166-177


def pretrain_mp2v(hin: HINData, relation_steps, cfg: M_mp2v.MP2VConfig, seed,
                  lr=1e-3, batch_start_nodes=8):
    """One pass of skip-gram pretraining; returns the embedding [num_nodes, D]."""
    steps = M_mp2v.metapath_from_hin(hin, relation_steps)
    key = jax.random.PRNGKey(seed)
    kinit, kperm, kscan = jax.random.split(key, 3)
    params = M_mp2v.mp2v_init(kinit, cfg)
    opt = make_optimizer("sparseadam", lr, 0.0)
    opt_state = opt.init(params)

    n_start = cfg.num_start
    n_batches = -(-n_start // batch_start_nodes)
    n_pad = n_batches * batch_start_nodes
    order = jax.random.permutation(kperm, n_start)
    order = jnp.pad(order, (0, n_pad - n_start))  # padded starts still walk; harmless

    # steps/order/keys enter as jit ARGUMENTS — closure-captured device
    # arrays would be baked into the program as constants, forcing a
    # device->host transfer at lowering (fails on the remote TPU relay).
    @jax.jit
    def run(params, opt_state, steps, starts_batches, keys):
        def step(carry, inputs):
            params, opt_state = carry
            starts, bkey = inputs
            kp, kn = jax.random.split(bkey)
            pos_rw = M_mp2v.sample_pos_walks(kp, starts, steps, cfg)
            neg_rw = M_mp2v.sample_neg_walks(kn, starts, steps, cfg)
            loss, grads = jax.value_and_grad(
                lambda p: M_mp2v.mp2v_loss(p, pos_rw, neg_rw, cfg)
            )(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        return jax.lax.scan(step, (params, opt_state), (starts_batches, keys))

    (params, _), losses = run(
        params,
        opt_state,
        steps,
        order.reshape(n_batches, batch_start_nodes).astype(jnp.int32),
        jax.random.split(kscan, n_batches),
    )
    return jax.lax.stop_gradient(params["emb"]), float(jnp.mean(losses))


def _load_or_pretrain(cache_dir, tag, hin, steps, cfg, seed, lr, batch):
    """Stage-1 embedding with on-disk caching, like the reference's
    `random_walk_*.pkl` (metapath2vec_solver_bpr.py:197-222): re-runs and
    resumes skip the pretraining pass (and its jit) entirely.  Keyed by the
    full stage-1 recipe + seed; saved atomically."""
    import hashlib
    import os

    path = None
    if cache_dir:
        key = hashlib.sha1(
            repr((tag, steps, cfg, lr, batch, seed, hin.num_nodes)).encode()
        ).hexdigest()[:16]
        path = os.path.join(cache_dir, f"random_walk_{tag}_{key}.npz")
        if os.path.isfile(path):
            data = np.load(path)
            return jnp.asarray(data["emb"]), float(data["loss"])
    emb, loss = pretrain_mp2v(hin, steps, cfg, seed, lr=lr,
                              batch_start_nodes=batch)
    if path:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = path + ".tmp.npz"
        np.savez(tmp, emb=np.asarray(emb), loss=np.float32(loss))
        os.replace(tmp, path)
    return emb, loss


class MetaPath2VecTrainer(GraphEpochEngine):
    """Stage-2 trainer; `init(seed)` runs (or reuses) stage-1 pretraining."""

    def __init__(self, hin: HINData, cfg: M_mp2v.MP2VConfig, tcfg,
                 relation_steps=None, rw_lr=1e-3, rw_batch=8, cache_dir=None):
        self.cfg = cfg
        self.relation_steps = relation_steps or ML_MP2V_STEPS
        self.rw_lr = rw_lr
        self.rw_batch = rw_batch
        self.cache_dir = cache_dir
        self.embedding = None  # set at init()

        super().__init__(
            hin, tcfg,
            init_params=lambda key: M_walk.walk_init(key, cfg.embedding_dim),
            batch_loss=lambda p, b, m, k: M_walk.walk_bpr_loss(p, self.embedding, b, m),
            eval_forward=lambda p, _mask: self.embedding,
            predict=lambda p, cached, u, i: M_walk.walk_predict(p, cached, u, i),
            loss_mode="bpr",
        )

    def init(self, seed: int):
        self.embedding, self.rw_loss = _load_or_pretrain(
            self.cache_dir, "mp2v", self.hin, self.relation_steps, self.cfg,
            seed, self.rw_lr, self.rw_batch,
        )
        # jitted programs capture self.embedding at first trace; invalidate
        self._epoch_fn = jax.jit(self._epoch)
        self._eval_fn = jax.jit(self._evaluate)
        return super().init(seed)


class HeRecTrainer(GraphEpochEngine):
    def __init__(self, hin: HINData, cfg: M_mp2v.MP2VConfig, tcfg,
                 metapaths=None, rw_lr=1e-3, rw_batch=8, cache_dir=None):
        self.cfg = cfg
        self.metapaths = metapaths or ML_HEREC_METAPATHS
        self.rw_lr = rw_lr
        self.rw_batch = rw_batch
        self.cache_dir = cache_dir
        self.rk_embeddings = None
        self.acc_uids = hin.type_accs[hin.types[0]]
        self.acc_iids = hin.item_acc
        emb_dim = cfg.embedding_dim

        def init_params(key):
            return M_herec.herec_init(
                key, hin.num_users, hin.num_items, emb_dim, len(self.metapaths)
            )

        def batch_loss(p, batch, row_mask, key):
            pair, rating = batch
            return M_herec.herec_mse_loss(
                p, self.rk_embeddings, self.acc_uids, self.acc_iids,
                pair, rating, row_mask,
            )

        super().__init__(
            hin, tcfg,
            init_params=init_params,
            batch_loss=batch_loss,
            eval_forward=lambda p, _mask: None,
            predict=lambda p, cached, u, i: M_herec.herec_predict(
                p, self.rk_embeddings, self.acc_uids, self.acc_iids, u, i
            ),
            loss_mode="mse",
        )

    def init(self, seed: int):
        embs = []
        for k, mp in enumerate(self.metapaths):
            emb, _ = _load_or_pretrain(
                self.cache_dir, f"herec{k}", self.hin, mp, self.cfg,
                seed + 1000 * k, self.rw_lr, self.rw_batch,
            )
            embs.append(emb)
        self.rk_embeddings = tuple(embs)
        self._epoch_fn = jax.jit(self._epoch)
        self._eval_fn = jax.jit(self._evaluate)
        return super().init(seed)
