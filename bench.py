"""Driver benchmark: flagship training throughput (examples/s/chip).

Flagship = PEAGAT with entity-aware regularizer (the reference's best
model, BASELINE.md) on a synthetic HIN at ml-latest-small post-filter scale
(~600 users / ~90k interactions / 9 metapath channels), BPR with 4
negatives — the published training recipe
(experiments/scripts/script_movielens_latest-small.ps1).

Measured: steady-state fused-epoch throughput — the whole epoch (negative +
entity sampling, batching, forward/backward over all 9 channels, Adam) is
one jitted lax.scan on device.

vs_baseline: ratio against the reference-style execution model on the SAME
chip — per-batch dispatch (one jitted step per batch driven from the host
loop, like the DataLoader loop in solvers.py:203-216).  That isolates the
fused-epoch design win while hardware is held constant.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
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


def bench_fused(trainer, epochs=3):
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
    return trainer.n_rows / dt, float(loss)


def bench_per_batch(trainer, num_batches=40):
    """Reference-style execution: one dispatched step per batch."""
    import optax

    from graph_recsys_benchmark_tpu.models.pea import pea_loss
    from graph_recsys_benchmark_tpu.train.sampling import (
        sample_cf_negatives,
        sample_entities,
    )

    cfg, tcfg, tables, graphs = trainer.cfg, trainer.tcfg, trainer.tables, trainer.graphs
    params, opt_state = trainer.init(seed=2020)
    bs = tcfg.batch_size
    ei = tables.train_pos.shape[0]

    @jax.jit
    def step(params, opt_state, rows, key):
        kneg, kent = jax.random.split(key)
        u = tables.train_pos[rows, 0]
        pos_i = tables.train_pos[rows, 1]
        neg_i = sample_cf_negatives(kneg, u, tables, tcfg.sampling_strategy)
        ents = sample_entities(kent, u, pos_i, tables)
        batch = jnp.concatenate([u[:, None], pos_i[:, None], neg_i[:, None], ents], axis=1)
        loss, grads = jax.value_and_grad(
            lambda p: pea_loss(p, graphs, cfg, batch, training=True)
        )(params)
        updates, opt_state = trainer.optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(0)
    rows = jnp.arange(bs, dtype=jnp.int32) % ei
    params, opt_state, loss = step(params, opt_state, rows, key)  # compile
    jax.block_until_ready(loss)

    t0 = time.time()
    for b in range(num_batches):
        key, k = jax.random.split(key)
        rows = (jnp.arange(bs, dtype=jnp.int32) + b * bs) % ei
        params, opt_state, loss = step(params, opt_state, rows, k)
    jax.block_until_ready(loss)
    dt = time.time() - t0
    return num_batches * bs / dt


def main():
    trainer, hin = build()
    fused_eps, last_loss = bench_fused(trainer)
    per_batch_eps = bench_per_batch(trainer)
    print(
        json.dumps(
            {
                "metric": "peagat_train_examples_per_s_per_chip",
                "value": round(fused_eps, 1),
                "unit": "examples/s/chip",
                "vs_baseline": round(fused_eps / per_batch_eps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
