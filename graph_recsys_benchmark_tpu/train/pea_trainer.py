"""PEA training: the shared scan-epoch engine specialized to PEAGCN/GAT/Sage.

Epoch/eval recipe lives in engine.py (one jitted lax.scan per epoch, one
jitted vectorized ranking eval); this module supplies the PEA pieces:
metapath channel graphs, `pea_loss` (BPR + entity-aware regularizer,
reference models/base.py:43-80) and the 2-layer-MLP pair scorer.
"""

from __future__ import annotations

import dataclasses

import jax

from ..data.hin import HINData
from ..data.movielens import mlsmall_metapath_edges
from ..graph import build_fused_metapath_graphs, build_metapath_graphs
from ..models import pea as pea_mod
from ..models.pea import PEAConfig, pea_forward, pea_loss, pea_predict
from .engine import GraphEpochEngine


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Reference defaults: experiments/pea*_solver_bpr.py:28-55."""

    batch_size: int = 1024
    lr: float = 1e-3
    weight_decay: float = 1e-3
    opt: str = "adam"
    num_negative_samples: int = 4
    num_neg_candidates: int = 99
    sampling_strategy: str = "unseen"  # ml-small; 'random' for 25m/yelp
    epochs: int = 30
    runs: int = 5


class PEATrainer(GraphEpochEngine):
    # Per-channel GAT graphs: None = auto implicit self-loops past the
    # streaming threshold (ops/stream_gat.py).  ShardedPEATrainer forces
    # False — its shard_map/GSPMD programs use the edge-materialized paths.
    _analytic_gat_loops = None
    # Single-device GAT uses the hybrid shared-edge plan (models/pea.py
    # build_hybrid_gat_plan); the sharded trainers keep their own
    # fused/sharded graph layouts.
    _use_hybrid_plan = True

    def __init__(self, hin: HINData, cfg: PEAConfig, tcfg: TrainConfig, metapath_edges=None):
        self.cfg = cfg
        if metapath_edges is None:
            metapath_edges = mlsmall_metapath_edges(hin)
        assert len(metapath_edges) == cfg.num_channels
        uniform = len(set(cfg.meta_path_steps)) == 1
        if cfg.fused and uniform and cfg.conv == "gat" and self._use_hybrid_plan:
            # GAT: per-channel graphs dedupe identical step edge lists
            # (graph.build_metapath_graphs), so channels sharing a graph
            # batch through ONE shared-edge kernel pass (ops/batch_gat.py)
            # and only the rest rides the union kernels — the hybrid plan.
            # Past the streaming threshold the builder flips to implicit
            # self-loops and the grouped streaming path takes over instead.
            per_channel = build_metapath_graphs(
                metapath_edges, hin.num_nodes, cfg.conv,
                analytic_gat_loops=self._analytic_gat_loops,
            )
            if any(g.gat_loops for ch in per_channel for g in ch):
                self.graphs = per_channel  # grouped streaming path
            else:
                from ..models.pea import build_hybrid_gat_plan

                self.graphs = build_hybrid_gat_plan(
                    per_channel, hin.num_nodes, cfg
                )
        elif cfg.fused and uniform:
            self.graphs = build_fused_metapath_graphs(metapath_edges, hin.num_nodes, cfg.conv)
        else:
            self.graphs = build_metapath_graphs(
                metapath_edges, hin.num_nodes, cfg.conv,
                analytic_gat_loops=self._analytic_gat_loops,
            )

        def init_params(key):
            return pea_mod.pea_init(key, cfg)

        def batch_loss(params, batch, row_mask, key):
            return pea_loss(
                params, self.graphs, cfg, batch, row_mask=row_mask,
                training=True, dropout_key=key if cfg.dropout > 0 else None,
            )

        def eval_forward(params, channel_mask):
            return pea_forward(params, self.graphs, cfg, channel_mask=channel_mask)

        super().__init__(
            hin, tcfg,
            init_params=init_params,
            batch_loss=batch_loss,
            eval_forward=eval_forward,
            predict=lambda params, cached, u, i: pea_predict(params, cached, u, i),
            entity_aware=cfg.entity_aware,
            num_channels=cfg.num_channels,
            loss_mode="bpr",
        )
