"""Trainers for the baseline zoo: NGCF, KGAT, KGCN, CFKG, NFM.

Each mirrors its experiment driver in the reference:
  NGCF : bidirectional user-item graph, BPR (ngcf_solver_bpr.py:102-107)
  KGAT/KGCN : two-phase epoch — KG TransR phase over original typed edges,
    full-graph attention recompute, CF BPR phase with frozen attention
    (kgat_solver_bpr.py:284-348); both phases + attention run inside ONE
    jitted epoch program here.
  CFKG : KG-only training over typed edges, exp((u+r)·i) ranking
    (cfkg_solver_bpr.py:95-106, 222-253)
  NFM : (uid, iid) factorization machine, MSE-on-labels, BatchNorm state
    threaded through the scan (nfm_solver_bce.py, models/nfm.py)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.hin import HINData
from ..graph import build_kg_graph, build_ngcf_graph
from ..models import cfkg as M_cfkg
from ..models import kg as M_kg
from ..models import nfm as M_nfm
from ..models import ngcf as M_ngcf
from .engine import GraphEpochEngine
from .sampling import sample_cf_negatives


def _bidirectional_user_item(hin: HINData):
    e = hin.edge_index["user2item"]
    src = np.concatenate([e[0], e[1]])
    dst = np.concatenate([e[1], e[0]])
    return src, dst


def _typed_edges(hin: HINData):
    """(h, t, rel) over all relations in edge_type_dict order."""
    hs, ts, rs = [], [], []
    for name, rel in hin.edge_type_dict.items():
        e = hin.edge_index[name]
        hs.append(e[0])
        ts.append(e[1])
        rs.append(np.full(e.shape[1], rel, dtype=np.int64))
    return np.stack(
        [np.concatenate(hs), np.concatenate(ts), np.concatenate(rs)]
    ).T.astype(np.int32)


class NGCFTrainer(GraphEpochEngine):
    def __init__(self, hin: HINData, cfg: M_ngcf.NGCFConfig, tcfg):
        self.cfg = cfg
        src, dst = _bidirectional_user_item(hin)
        self.graph = build_ngcf_graph(src, dst, hin.num_nodes)

        super().__init__(
            hin, tcfg,
            init_params=lambda key: M_ngcf.ngcf_init(key, cfg),
            batch_loss=lambda p, b, m, k: M_ngcf.ngcf_loss(
                p, self.graph, cfg, b, row_mask=m, training=True,
                dropout_key=k if cfg.dropout > 0 else None,
            ),
            eval_forward=lambda p, _mask: M_ngcf.ngcf_forward(p, self.graph, cfg),
            predict=lambda p, cached, u, i: M_ngcf.ngcf_predict(p, cached, u, i),
            entity_aware=cfg.entity_aware,
            loss_mode="bpr",
        )


class CFKGTrainer(GraphEpochEngine):
    def __init__(self, hin: HINData, cfg: M_cfkg.CFKGConfig, tcfg):
        self.cfg = cfg
        kg_edges = jnp.asarray(_typed_edges(hin))

        super().__init__(
            hin, tcfg,
            init_params=lambda key: M_cfkg.cfkg_init(key, cfg),
            batch_loss=lambda p, b, m, k: M_cfkg.cfkg_kg_loss(p, b, m),
            eval_forward=lambda p, _mask: None,
            predict=lambda p, cached, u, i: M_cfkg.cfkg_predict(p, cfg, u, i),
            loss_mode="kg",
            kg_edges=kg_edges,
        )


class NFMTrainer(GraphEpochEngine):
    def __init__(self, hin: HINData, cfg: M_nfm.NFMConfig, tcfg):
        self.cfg = cfg

        def batch_loss(tree, batch, row_mask, key):
            return M_nfm.nfm_mse_loss(tree, cfg, batch, row_mask, dropout_key=key)

        super().__init__(
            hin, tcfg,
            init_params=lambda key: M_nfm.nfm_init(key, cfg),
            batch_loss=batch_loss,
            eval_forward=lambda tree, _mask: None,
            predict=lambda tree, cached, u, i: M_nfm.nfm_forward(tree, cfg, u, i)[0],
            mf_offsets=(hin.type_accs[hin.types[0]], hin.item_acc),
            loss_mode="bce",
            has_state=True,
            # NFM overrides MFRecsysModel.loss with MSELoss (nfm.py:21-33),
            # so its eval-loss column is the MSE form, not BCE
            eval_loss_form="mse",
        )


class KGTrainer(GraphEpochEngine):
    """KGAT/KGCN two-phase trainer; the whole epoch (KG scan + attention
    recompute + CF scan) is one jitted program."""

    def __init__(self, hin: HINData, cfg: M_kg.KGConfig, tcfg):
        self.cfg = cfg
        typed = _typed_edges(hin)
        # model graph: edges + reversed with negated relation ids
        src = np.concatenate([typed[:, 0], typed[:, 1]])
        dst = np.concatenate([typed[:, 1], typed[:, 0]])
        rel = np.concatenate([typed[:, 2], -typed[:, 2]])
        self.graph = build_kg_graph(src, dst, rel, hin.num_nodes)

        super().__init__(
            hin, tcfg,
            init_params=lambda key: M_kg.kg_init(key, cfg),
            batch_loss=self._cf_batch_loss,  # used by the CF phase
            eval_forward=self._forward_with_att,
            predict=lambda p, cached, u, i: M_kg.kg_predict(p, cached, u, i),
            loss_mode="bpr",
            kg_edges=jnp.asarray(typed),
        )
        self.kg_rows = int(typed.shape[0])
        self.kg_batches = -(-self.kg_rows // tcfg.batch_size)

    def _cf_batch_loss(self, params, batch, row_mask, key):
        # used only for standalone calls; the epoch scan passes a frozen att
        att = M_kg.compute_att_map(params, self.graph, self.cfg)
        return M_kg.kg_cf_loss(
            params, self.graph, self.cfg, att, batch, row_mask,
            training=True, dropout_key=key if self.cfg.dropout > 0 else None,
        )

    def _forward_with_att(self, params, _mask):
        att = M_kg.compute_att_map(params, self.graph, self.cfg)
        return M_kg.kg_forward(params, self.graph, self.cfg, att)

    # Overridable phase hooks — the sharded trainer (parallel/engine.py
    # ShardedKGTrainer) swaps each for its shard_map'd equivalent while the
    # epoch recipe (and its RNG structure) below stays IDENTICAL, so the
    # sharded run sees the same batches/negatives as the single-device one.

    def _kg_loss_grads(self, params, batch, row_mask):
        return jax.value_and_grad(
            lambda p: M_kg.transr_kg_loss(p, batch, row_mask)
        )(params)

    def _att_snapshot(self, params):
        return M_kg.compute_att_map(params, self.graph, self.cfg)

    def _cf_loss_grads(self, params, att, batch, row_mask, kl):
        return jax.value_and_grad(
            lambda p: M_kg.kg_cf_loss(
                p, self.graph, self.cfg, att, batch, row_mask,
                training=True,
                dropout_key=kl if self.cfg.dropout > 0 else None,
            )
        )(params)

    def _epoch(self, params, opt_state, key):
        """Phase A: KG TransR scan; ONE attention-map recompute; Phase B: CF
        BPR scan with the frozen map — exactly the reference's epoch shape
        (kgat_solver_bpr.py:284-348)."""
        bs = self.tcfg.batch_size
        kkg, kcf = jax.random.split(key)

        # ---- phase A: KG
        n_pad = self.kg_batches * bs
        perm = jnp.pad(jax.random.permutation(kkg, self.kg_rows), (0, n_pad - self.kg_rows))
        mask_all = (jnp.arange(n_pad) < self.kg_rows).astype(jnp.float32)

        def kg_step(carry, inputs):
            params, opt_state = carry
            rows, row_mask, bkey = inputs
            e = self.kg_edges[rows]
            neg_t = jax.random.randint(bkey, (bs,), 0, self.hin.num_nodes)
            batch = jnp.stack([e[:, 0], e[:, 1], neg_t, e[:, 2]], axis=1)
            loss, grads = self._kg_loss_grads(params, batch, row_mask)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), kg_losses = jax.lax.scan(
            kg_step, (params, opt_state),
            (
                perm.reshape(self.kg_batches, bs),
                mask_all.reshape(self.kg_batches, bs),
                jax.random.split(jax.random.fold_in(kkg, 1), self.kg_batches),
            ),
        )

        # ---- attention snapshot (kgat_solver_bpr.py:311-320, no_grad)
        att = self._att_snapshot(params)

        # ---- phase B: CF with the frozen att map
        n_pad_cf = self.num_batches * bs
        perm_cf = jnp.pad(
            jax.random.permutation(kcf, self.n_rows), (0, n_pad_cf - self.n_rows)
        )
        mask_cf = (jnp.arange(n_pad_cf) < self.n_rows).astype(jnp.float32)

        def cf_step(carry, inputs):
            params, opt_state = carry
            rows, row_mask, bkey = inputs
            kb, kl = jax.random.split(bkey)
            batch = self._build_batch(rows, kb)
            loss, grads = self._cf_loss_grads(params, att, batch, row_mask, kl)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), cf_losses = jax.lax.scan(
            cf_step, (params, opt_state),
            (
                perm_cf.reshape(self.num_batches, bs),
                mask_cf.reshape(self.num_batches, bs),
                jax.random.split(jax.random.fold_in(kcf, 1), self.num_batches),
            ),
        )
        # reference tracks the phases separately and checkpoints a 6-tuple
        # history (kg + cf train losses, kgat_solver_bpr.py:364-375,395-400)
        return params, opt_state, {
            "train_loss": jnp.mean(cf_losses),
            "kg_train_loss": jnp.mean(kg_losses),
        }
