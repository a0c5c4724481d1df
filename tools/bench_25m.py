"""ML-25M-regime on-chip benchmark (VERDICT round 1, item 3).

Runs the flagship PEAGAT entity-aware training step at the reference's
ML-25M post-filter scale — ~2.1M train interactions, 69k typed nodes, the
13 hard-coded ml-25m metapath channels (utils/general_utils.py:335-356),
batch size 4096 with 'random' negative sampling (the published 25m recipe,
experiments/scripts/script_movielens_25m.ps1) — and reports steady-state
examples/s/chip plus which kernel paths engage at this scale.

At this node count the scatter accumulator spans multiple VMEM row tiles
(ops/pallas_segment.scatter_num_tiles: ~69k rows at the lane-padded 128-col
physical width = 6 tiles at the 6MB per-tile budget).  Whether the tiled
kernel or its sorted fallback wins is scale-dependent, so main() SWEEPS the
flash-GAT and tiled-scatter gates, reports every configuration, and commits
the fastest with its gate census (set GRB_25M_CONFIGS=name,name to subset).  Per-channel (unfused) graphs are used: the fused
13-channel union at 2M edges/channel would materialize >3GB per-edge
intermediates; sequential channels bound transient memory at ~2M x 64,
exactly the reference's own structure (models/base.py:191-206).

Writes BENCH_25m.json and prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from graph_recsys_benchmark_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def build(num_users, num_items, target_interactions, fused):
    from graph_recsys_benchmark_tpu.data.movielens import ml25m_metapath_edges
    from graph_recsys_benchmark_tpu.data.synthetic import synthetic_ml25m_hin
    from graph_recsys_benchmark_tpu.models.pea import PEAConfig
    from graph_recsys_benchmark_tpu.train import PEATrainer, TrainConfig

    t0 = time.time()
    hin = synthetic_ml25m_hin(
        num_users=num_users, num_items=num_items,
        target_interactions=target_interactions,
    )
    build_s = time.time() - t0
    cfg = PEAConfig(
        conv="gat", num_nodes=hin.num_nodes, meta_path_steps=(2,) * 13,
        emb_dim=64, hidden_size=64, repr_dim=16, entity_aware=True,
        fused=fused,
    )
    tcfg = TrainConfig(batch_size=4096, sampling_strategy="random")
    t0 = time.time()
    trainer = PEATrainer(hin, cfg, tcfg, metapath_edges=ml25m_metapath_edges(hin))
    graph_s = time.time() - t0
    return trainer, hin, build_s, graph_s


def gate_report(trainer, hin):
    """Which Pallas paths engage at this scale (kernel-vs-fallback census)."""
    from graph_recsys_benchmark_tpu.ops.flash_gat import flash_gat_enabled
    from graph_recsys_benchmark_tpu.ops.pallas_segment import (
        scatter_fits_vmem,
        scatter_num_tiles,
    )

    k = trainer.cfg.emb_dim + 1  # [z | a_src] packed width
    graphs = trainer.graphs
    flat = []
    for g in (graphs if not isinstance(graphs[0], tuple) else [s for ch in graphs for s in ch]):
        flat.append(g)
    rows = [int(g.num_nodes) for g in flat]
    edges = [int(g.src.shape[0]) for g in flat]
    from graph_recsys_benchmark_tpu.ops.stream_gat import stream_gat_enabled

    # streaming-path census: how many step graphs carry implicit self-loops
    # (analytic), and the channel-batch group sizes per step position
    # (graph dedup makes identical edge lists the same object)
    n_loops = sum(1 for g in flat if getattr(g, "gat_loops", False))
    group_sizes = []
    if not isinstance(graphs[0], tuple):
        per_channel = [(g,) for g in graphs]
    else:
        per_channel = graphs
    for k_step in range(max(len(ch) for ch in per_channel)):
        groups = {}
        for ch in per_channel:
            if k_step < len(ch):
                groups.setdefault(id(ch[k_step]), []).append(1)
        group_sizes.append(sorted((len(v) for v in groups.values()),
                                  reverse=True))
    return {
        "num_nodes": int(hin.num_nodes),
        "step_graph_rows_max": max(rows),
        "step_graph_edges_max": max(edges),
        "localized_scatter_bwd": bool(scatter_fits_vmem(max(rows), k)),
        "scatter_row_tiles": int(scatter_num_tiles(max(rows), k)),
        "flash_gat": bool(
            flash_gat_enabled(trainer.cfg.num_heads, trainer.cfg.dropout > 0,
                              max(edges),
                              src_span=max(g.src_span for g in flat))
        ),
        "stream_gat": bool(stream_gat_enabled(max(edges), False)) and n_loops > 0,
        "analytic_loop_graphs": n_loops,
        "src_span_max": round(max(g.src_span for g in flat), 1),
        "channel_batch_groups": group_sizes,
        "fallback_when_gated_off": "XLA gather + sorted segment-sum",
    }


def bench_steps(trainer, n_steps=8, reps=3):
    """Steady-state ms/step over an n_steps jitted scan (full train step:
    sampling + batch build + fwd/bwd over 13 channels + Adam)."""
    import optax

    eng = trainer
    bs = eng.tcfg.batch_size
    params, opt_state = trainer.init(seed=2020)

    def run(params, opt_state, key):
        def step(carry, bkey):
            params, opt_state = carry
            kr, kb, kl = jax.random.split(bkey, 3)
            rows = jax.random.randint(kr, (bs,), 0, eng.n_rows)
            batch = eng._build_batch(rows, kb)
            mask = jnp.ones((bs,), dtype=jnp.float32)
            loss, grads = jax.value_and_grad(
                lambda p: eng._batch_loss(p, batch, mask, kl)
            )(params)
            updates, opt_state = eng.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), jax.random.split(key, n_steps)
        )
        return params, opt_state, jnp.mean(losses)

    fn = jax.jit(run)
    params, opt_state, loss = fn(params, opt_state, jax.random.PRNGKey(0))
    jax.block_until_ready(loss)
    t0 = time.time()
    for i in range(reps):
        params, opt_state, loss = fn(params, opt_state, jax.random.PRNGKey(i + 1))
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / (reps * n_steps)
    return dt, float(loss)


SWEEP = {
    # gate config -> (FLASH_GAT override, MAX_SCATTER_TILES, stream path)
    # 'default' = round-4 dispatch: analytic-self-loop graphs + the
    # streaming GAT kernel pipeline (ops/stream_gat.py) with channel
    # batching over deduped edge lists.  'no_stream' measures the same
    # code with loop-edge graphs (composed path + the span-aware gather
    # dispatch); 'fallback_both' additionally forces the round-3 fallback
    # gates — the round-3 best config, kept as the measured baseline.
    "default": (None, None, True),
    "no_stream": (None, None, False),
    "tiled_scatter_forced": (None, 16, False),
    "fallback_both": (False, 1, False),
}


def main():
    """Sweeps the scale-sensitive kernel gates (flash-GAT megakernel and the
    row-tiled VMEM scatter vs their composed/sorted fallbacks), reports every
    configuration, and records the fastest as the headline — with the gates
    that produced it — so the committed artifact always reflects a measured
    dispatch decision at THIS scale (round-2 verdict item 2)."""
    from graph_recsys_benchmark_tpu.ops import config as ops_config

    ops_config.SEGSUM_TRANSPORT = "bf16"
    only = os.environ.get("GRB_25M_CONFIGS")
    runs = {}
    build_s = graph_s = 0.0
    hin = None
    default_tiles = ops_config.MAX_SCATTER_TILES
    from graph_recsys_benchmark_tpu.train.pea_trainer import PEATrainer

    for name, (flash, tiles, stream) in SWEEP.items():
        if only and name not in only.split(","):
            continue
        ops_config.FLASH_GAT = flash
        ops_config.MAX_SCATTER_TILES = default_tiles if tiles is None else tiles
        PEATrainer._analytic_gat_loops = None if stream else False
        trainer, hin, build_s, graph_s = build(
            num_users=40_000, num_items=16_000, target_interactions=2_000_000,
            fused=False,
        )
        gates = gate_report(trainer, hin)
        dt, loss = bench_steps(trainer)
        runs[name] = {
            "examples_per_s": round(trainer.tcfg.batch_size / dt, 1),
            "ms_per_step": round(dt * 1e3, 3),
            "last_loss": round(loss, 4),
            "gates": gates,
        }
        print(name, json.dumps(runs[name]))
    ops_config.FLASH_GAT = None
    ops_config.MAX_SCATTER_TILES = default_tiles
    PEATrainer._analytic_gat_loops = None

    best = max(runs, key=lambda n: runs[n]["examples_per_s"])
    out = {
        "metric": "peagat_ml25m_train_examples_per_s_per_chip",
        "value": runs[best]["examples_per_s"],
        "unit": "examples/s/chip",
        "ms_per_step": runs[best]["ms_per_step"],
        "best_config": best,
        "batch_size": 4096,
        "train_interactions": int(hin.train_pos.shape[0]),
        "channels": 13,
        "hin_build_s": round(build_s, 2),
        "graph_compile_s": round(graph_s, 2),
        "gates": runs[best]["gates"],
        "sweep": runs,
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_25m.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
