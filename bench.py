"""Driver benchmark: flagship training throughput (examples/s/chip).

Flagship = PEAGAT with entity-aware regularizer (the reference's best
model, BASELINE.md) on a synthetic HIN at ml-latest-small post-filter scale
(~600 users / ~90k interactions / 9 metapath channels), BPR with 4
negatives — the published training recipe
(experiments/scripts/script_movielens_latest-small.ps1).

Measured: steady-state fused-epoch throughput — the whole epoch (negative +
entity sampling, batching, forward/backward over all 9 channels, Adam) is
one jitted lax.scan on device.

vs_baseline: ratio against the SAME fused epoch with every custom TPU
kernel disabled (stock XLA scatter/gather lowering, ops/config.py
FORCE_PALLAS=False) — isolating what the Pallas segment-sum / fused-softmax
/ sorted-backward-gather kernels buy on identical hardware and math.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# Persistent compilation cache: the axon remote compiler costs 30-120s per
# program; caching makes repeated bench/driver invocations near-instant.
try:
    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np


def build():
    from graph_recsys_benchmark_tpu.data import build_mlsmall_hin, synthetic_mlsmall_raw
    from graph_recsys_benchmark_tpu.models.pea import PEAConfig
    from graph_recsys_benchmark_tpu.train import PEATrainer, TrainConfig

    movies, ratings, tagging = synthetic_mlsmall_raw(
        seed=7, num_users=600, num_items=900,
        min_ratings_per_user=40, max_ratings_per_user=200,
        num_directors=120, num_actors=320, num_writers=160,
        num_tags=180, tagging_rows=3000,
    )
    hin = build_mlsmall_hin(movies, ratings, tagging, num_core=10, num_feat_core=5)
    cfg = PEAConfig(
        conv="gat", num_nodes=hin.num_nodes, meta_path_steps=(2,) * 9,
        emb_dim=64, hidden_size=64, repr_dim=16, entity_aware=True,
    )
    tcfg = TrainConfig(batch_size=1024, sampling_strategy="unseen")
    return PEATrainer(hin, cfg, tcfg), hin


def bench_fused(trainer, epochs=2, roofline=False):
    params, opt_state = trainer.init(seed=2020)
    key = jax.random.PRNGKey(0)
    # warmup/compile
    key, k = jax.random.split(key)
    params, opt_state, loss = trainer.run_epoch(params, opt_state, k)
    jax.block_until_ready(loss)
    t0 = time.time()
    for _ in range(epochs):
        key, k = jax.random.split(key)
        params, opt_state, loss = trainer.run_epoch(params, opt_state, k)
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / epochs
    roof = {}
    if roofline:
        # achieved-HBM/MFU accounting from XLA's post-fusion cost model
        # (Pallas calls contribute their declared DMA bytes); honest
        # utilization for a bandwidth-bound workload (utils/roofline.py)
        from graph_recsys_benchmark_tpu.utils.roofline import roofline_report

        compiled = trainer._epoch_fn.lower(
            params, opt_state, jax.random.PRNGKey(0)
        ).compile()
        # XLA's cost model counts a while/scan BODY ONCE (not x trip count),
        # so for the scan-epoch program bytes_accessed ~= ONE step's traffic
        # (+ small per-epoch setup); pair it with the per-step time
        roof = roofline_report(compiled, dt / trainer.num_batches, steps=1)
    return trainer.n_rows / dt, float(loss), roof


def main():
    from graph_recsys_benchmark_tpu.ops import config as ops_config

    # Flagship config: bf16 message transport (gathers + segment reductions
    # move bf16 through HBM/MXU with f32 accumulation).  Training quality is
    # unchanged vs f32 (tools/smoke_train.py: same losses to 3 digits, same
    # HR@10 band; PARITY.md) — the reference-parity f32 path stays the
    # library default.
    ops_config.SEGSUM_TRANSPORT = "bf16"
    trainer, hin = build()
    fused_eps, last_loss, roof = bench_fused(trainer, roofline=True)

    # f32-transport fused number: same kernels, reference-parity numerics —
    # keeps the kernel-only speedup separable from the precision trade
    # (round-1 advisor finding)
    ops_config.SEGSUM_TRANSPORT = "f32"
    f32_trainer, _ = build()
    f32_eps, _, _ = bench_fused(f32_trainer, epochs=1)

    # stock-XLA baseline: identical epoch program in the stock numerics —
    # f32 messages, XLA scatter/gather lowering, no custom kernels (what a
    # straight port of the reference's torch-scatter pipeline would run).
    ops_config.FORCE_PALLAS = False
    ops_config.SEGSUM_TRANSPORT = "f32"
    xla_trainer, _ = build()
    xla_eps, _, _ = bench_fused(xla_trainer, epochs=1)
    # One observed flake through the axon relay returned an epoch "time" of
    # ~2 ms (block_until_ready returning before the remote execution), which
    # printed vs_baseline = 0.002.  The stock-XLA epoch is tens of seconds;
    # anything faster than the kernel build is impossible — remeasure once.
    if xla_eps > fused_eps:
        print(
            f"implausible stock-XLA epoch ({xla_eps:.0f} ex/s > fused"
            f" {fused_eps:.0f}); remeasuring", file=sys.stderr,
        )
        xla_eps, _, _ = bench_fused(xla_trainer, epochs=1)
    ops_config.FORCE_PALLAS = None
    ops_config.SEGSUM_TRANSPORT = "f32"

    print(
        json.dumps(
            {
                "metric": "peagat_train_examples_per_s_per_chip",
                "value": round(fused_eps, 1),
                "unit": "examples/s/chip",
                "vs_baseline": round(fused_eps / xla_eps, 3),
                "value_f32_transport": round(f32_eps, 1),
                "f32_vs_baseline": round(f32_eps / xla_eps, 3),
                # roofline: achieved HBM GB/s + utilization vs the v5e's
                # 819 GB/s peak, and MFU vs 197 bf16 TFLOP/s — the honest
                # hardware-potential comparison for a memory-bound workload
                **{k: v for k, v in roof.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
