"""Shared training engine: jitted scan-epochs + vectorized ranking eval.

Every model family in the reference shares the same outer recipe
(solvers.py:191-248): per epoch, resample negatives over all train
interactions, iterate batches, then rank 1 pos + 99 sampled negatives per
test user.  `GraphEpochEngine` owns that recipe as two jitted device
programs; families plug in four functions:

  init_params(key)                        -> params
  batch_loss(params, batch, row_mask, key)-> scalar loss   (training path)
  eval_forward(params, channel_mask)      -> cached repr    (full graph)
  predict(params, cached, u, i)           -> scores         (ranking path)

MF-type models (NFM/CFKG-style indexing, solvers.py:69-71, 204-210) set
`mf_offsets=(user_lo, item_lo)` so batch/eval node ids are shifted into
0-based user/item tables exactly as the reference does.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.hin import HINData
from .optim import make_optimizer
from .sampling import DeviceTables, build_device_tables, sample_cf_negatives, sample_entities


class GraphEpochEngine:
    def __init__(
        self,
        hin: HINData,
        tcfg,
        init_params: Callable,
        batch_loss: Callable,
        eval_forward: Callable,
        predict: Callable,
        entity_aware: bool = False,
        mf_offsets=None,
        num_channels: int = 0,
        loss_mode: str = "bpr",  # 'bpr' | 'bce' | 'mse' | 'kg'
        has_state: bool = False,
        kg_edges=None,  # int32[E_kg, 3] (h, t, rel) for loss_mode='kg'
        eval_loss_form: Optional[str] = None,  # override (eval.ranking forms)
    ):
        self.hin = hin
        self.tcfg = tcfg
        self.tables: DeviceTables = build_device_tables(hin)
        self.has_state = has_state
        base_opt = make_optimizer(tcfg.opt, tcfg.lr, tcfg.weight_decay)
        if has_state:
            # model state (e.g. BatchNorm running stats) rides inside the
            # param tree under 'state' but is updated from the loss aux, not
            # by the optimizer — mask it out of every transform (otherwise
            # weight decay would decay the running statistics).
            import optax as _optax

            def _mask(tree):
                return {
                    "params": jax.tree_util.tree_map(lambda _: True, tree["params"]),
                    "state": jax.tree_util.tree_map(lambda _: False, tree["state"]),
                }

            base_opt = _optax.masked(base_opt, _mask)
        self.optimizer = base_opt
        self._init_params = init_params
        self._batch_loss = batch_loss
        self._eval_forward = eval_forward
        self._predict = predict
        self.entity_aware = entity_aware
        self.mf_offsets = mf_offsets
        self.num_channels = num_channels
        self.loss_mode = loss_mode
        self.eval_loss_form = eval_loss_form or {
            "bpr": "bpr", "bce": "bce", "mse": "mse", "kg": "zero"
        }[loss_mode]

        self.kg_edges = kg_edges
        ei = hin.train_pos.shape[0]
        if loss_mode == "bpr":
            self.n_rows = ei * tcfg.num_negative_samples
        elif loss_mode == "bce":
            # pos rows + num_neg negative rows (movielens.py:887-917)
            self.n_rows = ei * (1 + tcfg.num_negative_samples)
        elif loss_mode == "kg":
            # one row per typed edge, corrupted tail (movielens.py:861-877)
            self.n_rows = int(kg_edges.shape[0])
        else:  # mse: one row per rated interaction (movielens.py:918-919)
            self.n_rows = ei
        self.num_batches = -(-self.n_rows // tcfg.batch_size)

        self._epoch_fn = jax.jit(self._epoch)
        self._eval_fn = jax.jit(self._evaluate)
        self._eval_full_fn = jax.jit(self._evaluate_full)

    # ------------------------------------------------------------ state

    def init(self, seed: int):
        params = self._init_params(jax.random.PRNGKey(seed))
        return params, self.optimizer.init(params)

    # ------------------------------------------------------------ batch build

    def _build_batch(self, rows, key):
        """rows: int[B] global row indices -> batch columns per loss_mode."""
        tables, tcfg = self.tables, self.tcfg
        ei = tables.train_pos.shape[0]
        kneg, kent = jax.random.split(key)

        if self.loss_mode == "bpr":
            inter = rows % ei
            u = tables.train_pos[inter, 0]
            pos_i = tables.train_pos[inter, 1]
            neg_i = sample_cf_negatives(kneg, u, tables, tcfg.sampling_strategy)
            cols = [u[:, None], pos_i[:, None], neg_i[:, None]]
            if self.entity_aware:
                cols.append(sample_entities(kent, u, pos_i, tables))
            batch = jnp.concatenate(cols, axis=1)
        elif self.loss_mode == "kg":
            e = self.kg_edges[rows]
            neg_t = jax.random.randint(kneg, (rows.shape[0],), 0, self.hin.num_nodes)
            batch = jnp.stack([e[:, 0], e[:, 1], neg_t, e[:, 2]], axis=1)
        elif self.loss_mode == "bce":
            # row < ei: positive (label 1); else sampled negative (label 0)
            is_pos = rows < ei
            inter = rows % ei
            u = tables.train_pos[inter, 0]
            pos_i = tables.train_pos[inter, 1]
            neg_i = sample_cf_negatives(kneg, u, tables, tcfg.sampling_strategy)
            item = jnp.where(is_pos, pos_i, neg_i)
            label = is_pos.astype(jnp.int32)
            batch = jnp.stack([u, item, label], axis=1)
        else:  # mse: (u, i, rating) — rating carried separately as float
            inter = rows % ei
            u = tables.train_pos[inter, 0]
            pos_i = tables.train_pos[inter, 1]
            rating = tables.ratings[inter]
            batch = (jnp.stack([u, pos_i], axis=1), rating)

        if self.mf_offsets is not None:
            u_lo, i_lo = self.mf_offsets
            if self.loss_mode == "bpr":
                shift = jnp.array([u_lo, i_lo, i_lo] + [0] * (batch.shape[1] - 3), dtype=batch.dtype)
                batch = batch - shift[None, :]
            elif self.loss_mode == "bce":
                batch = batch - jnp.array([u_lo, i_lo, 0], dtype=batch.dtype)[None, :]
            else:
                pair, rating = batch
                batch = (pair - jnp.array([u_lo, i_lo], dtype=pair.dtype)[None, :], rating)
        return batch

    # ------------------------------------------------------------ epoch

    def _epoch(self, params, opt_state, key):
        bs = self.tcfg.batch_size
        n_pad = self.num_batches * bs
        kperm, kscan = jax.random.split(key)
        perm = jax.random.permutation(kperm, self.n_rows)
        perm = jnp.pad(perm, (0, n_pad - self.n_rows))
        mask_all = (jnp.arange(n_pad) < self.n_rows).astype(jnp.float32)

        def step(carry, inputs):
            params, opt_state = carry
            rows, row_mask, bkey = inputs
            kb, kl = jax.random.split(bkey)
            batch = self._build_batch(rows, kb)
            if self.has_state:
                (loss, new_state), grads = jax.value_and_grad(
                    lambda p: self._batch_loss(p, batch, row_mask, kl), has_aux=True
                )(params)
            else:
                loss, grads = jax.value_and_grad(
                    lambda p: self._batch_loss(p, batch, row_mask, kl)
                )(params)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if self.has_state:
                params = {"params": params["params"], "state": new_state}
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step,
            (params, opt_state),
            (
                perm.reshape(self.num_batches, bs),
                mask_all.reshape(self.num_batches, bs),
                jax.random.split(kscan, self.num_batches),
            ),
        )
        return params, opt_state, jnp.mean(losses)

    def run_epoch(self, params, opt_state, key):
        return self._epoch_fn(params, opt_state, key)

    # ------------------------------------------------------------ eval

    def _evaluate(self, params, key, channel_mask):
        from ..eval.ranking import evaluate_ranking

        cached = self._eval_forward(params, channel_mask)

        if self.mf_offsets is None:
            def score(u, i):
                return self._predict(params, cached, u, i)
        else:
            u_lo, i_lo = self.mf_offsets

            def score(u, i):
                return self._predict(params, cached, u - u_lo, i - i_lo)

        return evaluate_ranking(
            key, score, self.tables,
            num_candidates=self.tcfg.num_neg_candidates,
            loss_form=self.eval_loss_form,
        )

    def evaluate(self, params, key, metapath_idx: Optional[int] = None):
        mask = np.ones(max(self.num_channels, 1), dtype=np.float32)
        if metapath_idx is not None:
            mask[metapath_idx] = 0.0
        return self._eval_fn(params, key, jnp.asarray(mask))

    def _evaluate_full(self, params, channel_mask):
        from ..eval.full_ranking import evaluate_full_ranking

        cached = self._eval_forward(params, channel_mask)

        if self.mf_offsets is None:
            def score(u, i):
                return self._predict(params, cached, u, i)
        else:
            u_lo, i_lo = self.mf_offsets

            def score(u, i):
                return self._predict(params, cached, u - u_lo, i - i_lo)

        return evaluate_full_ranking(score, self.tables)

    def evaluate_full(self, params):
        """Full-catalog ranking (every unseen item per test user) — the
        north-star extension of the 99-negative protocol (BASELINE.json);
        sharded dot-product sweep in user chunks."""
        mask = np.ones(max(self.num_channels, 1), dtype=np.float32)
        return self._eval_full_fn(params, jnp.asarray(mask))
