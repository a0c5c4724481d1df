"""Microbenchmark: Pallas sorted-broadcast kernel vs XLA gather on TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from graph_recsys_benchmark_tpu.ops.pallas_segment import sorted_broadcast_pallas
from graph_recsys_benchmark_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def bench(f, x, iters=50):
    y = f(x)
    y.block_until_ready()
    t = time.time()
    for _ in range(iters):
        y = f(x)
    y.block_until_ready()
    return (time.time() - t) / iters


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    for n, e, k in [(15210, 662528, 1), (15210, 662528, 2), (300000, 4000000, 1)]:
        dst = np.sort(rng.integers(0, n, e)).astype(np.int32)
        shape = (n,) if k == 1 else (n, k)
        v = jax.device_put(rng.standard_normal(shape).astype(np.float32))
        dstj = jax.device_put(jnp.asarray(dst))

        fp = jax.jit(lambda x: sorted_broadcast_pallas(x, dstj, n))
        fx = jax.jit(lambda x: x[dstj])

        err = float(jnp.max(jnp.abs(fp(v) - fx(v))))
        tp, tx = bench(fp, v), bench(fx, v)
        print(
            f"n={n} e={e} k={k}: pallas {tp*1e3:.3f}ms  xla {tx*1e3:.3f}ms  "
            f"speedup {tx/tp:.1f}x  maxerr {err:.1e}"
        )


if __name__ == "__main__":
    main()
