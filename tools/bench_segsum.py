"""Microbenchmark: Pallas segment-sum kernel vs XLA scatter on the TPU.

Run directly on the TPU backend (not under tests/conftest.py).
Inputs stay device-resident; timing loops chain computations so the axon
relay's per-call dispatch overhead is amortized.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from graph_recsys_benchmark_tpu.ops import segment_sum, sorted_segment_sum_pallas
from graph_recsys_benchmark_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def bench(f, x, iters=50):
    y = f(x)
    y.block_until_ready()
    t = time.time()
    for _ in range(iters):
        x2 = f(x)
    x2.block_until_ready()
    return (time.time() - t) / iters


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    for n, e, d in [(3000, 40_000, 64), (10_000, 100_000, 64), (60_000, 2_000_000, 64)]:
        dst = np.sort(rng.integers(0, n, e)).astype(np.int32)
        msgs = jax.device_put(rng.standard_normal((e, d)).astype(np.float32))
        dstj = jax.device_put(jnp.asarray(dst))

        fp = jax.jit(lambda m: sorted_segment_sum_pallas(m, dstj, n))
        fx = jax.jit(lambda m: segment_sum(m, dstj, n))

        err = float(jnp.max(jnp.abs(fp(msgs) - fx(msgs))))
        tp, tx = bench(fp, msgs), bench(fx, msgs)
        gbs = e * d * 4 / tp / 1e9
        print(
            f"n={n} e={e} d={d}: pallas {tp*1e3:.3f}ms ({gbs:.1f} GB/s) "
            f"xla {tx*1e3:.3f}ms  speedup {tx/tp:.2f}x  maxerr {err:.2e}"
        )


if __name__ == "__main__":
    main()
