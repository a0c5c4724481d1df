"""Yelp-regime on-chip benchmark (round-4 verdict directive #4).

Yelp is the reference's largest graph by TYPE structure — 11 node types
and 11 hard-coded metapaths (reference datasets/yelp.py:168-437,
utils/general_utils.py:377-392) — and where PEA's published wins are
biggest (HR@10 0.9128, images/results.png).  Its edge distribution
differs from both ML configs: a ~756k-interaction user–business graph
(review∪tip union under the (num_core+40)/num_core+10 band filters)
plus many mid-sized discretized-entity graphs, so this bench validates
that the span/scale-based kernel dispatch (flash / stream / fallback)
generalizes to a third distribution.

Recipe shapes follow the published script
(experiments/scripts/script_yelp.ps1): 11 2-step channels, batch 1024,
'random' negative sampling, entity-aware PEAGAT.  Sweeps the same gates
as tools/bench_25m.py and writes BENCH_yelp.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from graph_recsys_benchmark_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import importlib

bench_25m = importlib.import_module("tools.bench_25m")


def build(num_users, num_items, fused):
    from graph_recsys_benchmark_tpu.data.synthetic import synthetic_yelp_raw
    from graph_recsys_benchmark_tpu.data.yelp import (
        build_yelp_hin, yelp_metapath_edges,
    )
    from graph_recsys_benchmark_tpu.models.pea import PEAConfig
    from graph_recsys_benchmark_tpu.train import PEATrainer, TrainConfig

    t0 = time.time()
    business, user, reviewtip = synthetic_yelp_raw(
        seed=0, num_users=num_users, num_items=num_items, num_core=10,
        num_attributes=80, num_categories=60,
    )
    hin = build_yelp_hin(business, user, reviewtip, num_core=10,
                         candidate_mode="rejection")
    build_s = time.time() - t0
    cfg = PEAConfig(
        conv="gat", num_nodes=hin.num_nodes, meta_path_steps=(2,) * 11,
        emb_dim=64, hidden_size=64, repr_dim=16, entity_aware=True,
        fused=fused,
    )
    tcfg = TrainConfig(batch_size=1024, sampling_strategy="random")
    t0 = time.time()
    trainer = PEATrainer(hin, cfg, tcfg,
                         metapath_edges=yelp_metapath_edges(hin))
    graph_s = time.time() - t0
    return trainer, hin, build_s, graph_s


SWEEP = {
    "default": (None, True),
    "no_stream": (None, False),
    "fallback_both": (False, False),
}


def main():
    from graph_recsys_benchmark_tpu.ops import config as ops_config
    from graph_recsys_benchmark_tpu.train.pea_trainer import PEATrainer

    ops_config.SEGSUM_TRANSPORT = "bf16"
    only = os.environ.get("GRB_YELP_CONFIGS")
    runs = {}
    hin = None
    build_s = graph_s = 0.0
    for name, (flash, stream) in SWEEP.items():
        if only and name not in only.split(","):
            continue
        ops_config.FLASH_GAT = flash
        PEATrainer._analytic_gat_loops = None if stream else False
        trainer, hin, build_s, graph_s = build(
            num_users=60_000, num_items=8_000, fused=False,
        )
        gates = bench_25m.gate_report(trainer, hin)
        dt, loss = bench_25m.bench_steps(trainer)
        runs[name] = {
            "examples_per_s": round(trainer.tcfg.batch_size / dt, 1),
            "ms_per_step": round(dt * 1e3, 3),
            "last_loss": round(loss, 4),
            "gates": gates,
        }
        print(name, json.dumps(runs[name]), flush=True)
    ops_config.FLASH_GAT = None
    PEATrainer._analytic_gat_loops = None

    best = max(runs, key=lambda n: runs[n]["examples_per_s"])
    out = {
        "metric": "peagat_yelp_train_examples_per_s_per_chip",
        "value": runs[best]["examples_per_s"],
        "unit": "examples/s/chip",
        "ms_per_step": runs[best]["ms_per_step"],
        "best_config": best,
        "batch_size": 1024,
        "train_interactions": int(hin.train_pos.shape[0]),
        "channels": 11,
        "num_nodes": int(hin.num_nodes),
        "hin_build_s": round(build_s, 2),
        "graph_compile_s": round(graph_s, 2),
        "gates": runs[best]["gates"],
        "sweep": runs,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_yelp.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("metric", "value", "ms_per_step", "best_config")}))


if __name__ == "__main__":
    main()
