"""End-to-end PEAGAT fused-epoch throughput: f32 vs bf16 message transport,
plus a short quality check (train a few epochs each, compare HR@10)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from graph_recsys_benchmark_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import importlib

bench = importlib.import_module("bench")

from graph_recsys_benchmark_tpu.ops import config as ops_config


def quality(trainer, epochs=6):
    params, opt_state = trainer.init(seed=2020)
    key = jax.random.PRNGKey(0)
    for _ in range(epochs):
        key, k = jax.random.split(key)
        params, opt_state, loss = trainer.run_epoch(params, opt_state, k)
    m = trainer.evaluate(params, jax.random.PRNGKey(42))
    return float(m["HR"][5]), float(loss)


def main():
    print("backend:", jax.default_backend())
    for transport in ("f32", "bf16"):
        ops_config.SEGSUM_TRANSPORT = transport
        trainer, hin = bench.build()
        eps, loss = bench.bench_fused(trainer, epochs=2)
        hr10, qloss = quality(trainer)
        print(
            f"{transport}: {eps:.0f} examples/s  loss={loss:.1f} "
            f"HR@10(6ep)={hr10:.4f} train_loss(6ep)={qloss:.1f}"
        )
    ops_config.SEGSUM_TRANSPORT = "f32"


if __name__ == "__main__":
    main()
