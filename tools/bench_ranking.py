"""Full-ranking eval throughput: items scored per second on the real TPU.

BASELINE.json's metric pairs training examples/s/chip with full-ranking
items-scored/s.  This drives the engine's `evaluate_full` (sharded
dot-product sweep over every unseen catalog item per test user,
eval/full_ranking.py) on the bench-scale PEAGAT model and reports both the
99-negative protocol eval rate and the full-catalog rate.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_recsys_benchmark_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax

import importlib

bench = importlib.import_module("bench")


def main():
    trainer, hin = bench.build()
    params, _ = trainer.init(seed=2020)
    key = jax.random.PRNGKey(0)

    n_users = int(trainer.tables.test_users.shape[0])

    # 99-negative protocol eval (the reference's metrics loop, vectorized)
    m = trainer.evaluate(params, key)
    jax.block_until_ready(m["HR"])
    t0 = time.time()
    reps = 10
    for _ in range(reps):
        m = trainer.evaluate(params, key)
    jax.block_until_ready(m["HR"])
    dt99 = (time.time() - t0) / reps
    items99 = n_users * (1 + trainer.tcfg.num_neg_candidates)

    # full-catalog sweep
    mf = trainer.evaluate_full(params)
    jax.block_until_ready(mf["HR"])
    t0 = time.time()
    for _ in range(reps):
        mf = trainer.evaluate_full(params)
    jax.block_until_ready(mf["HR"])
    dtf = (time.time() - t0) / reps
    if trainer.tables.mode == "dense":
        items_full = int(trainer.tables.cand.shape[0] * (trainer.tables.cand.shape[1] - 1))
    else:
        items_full = n_users * int(trainer.tables.num_items)

    print(f"test users: {n_users}")
    print(
        f"99-neg protocol: {dt99*1e3:.2f}ms/eval -> "
        f"{items99/dt99/1e6:.2f}M items/s  HR@10={float(m['HR'][5]):.4f}"
    )
    print(
        f"full ranking:    {dtf*1e3:.2f}ms/eval ({items_full} scored) -> "
        f"{items_full/dtf/1e6:.2f}M items/s  HR@10={float(mf['HR'][5]):.4f}"
    )


if __name__ == "__main__":
    main()
