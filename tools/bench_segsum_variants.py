"""Segment-sum kernel variant sweep on the real TPU: transport dtype
(f32 vs bf16) x edge-chunk size.  Informs the defaults in ops/config.py
and pallas_segment._C."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from graph_recsys_benchmark_tpu.ops import segment_sum
from graph_recsys_benchmark_tpu.ops.pallas_segment import _pallas_forward
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
    for n, e, d in [(10_000, 100_000, 64), (60_000, 2_000_000, 64)]:
        dst = np.sort(rng.integers(0, n, e)).astype(np.int32)
        msgs = jax.device_put(rng.standard_normal((e, d)).astype(np.float32))
        dstj = jax.device_put(jnp.asarray(dst))

        fx = jax.jit(lambda m: segment_sum(m, dstj, n))
        ref = fx(msgs)
        tx = bench(fx, msgs)
        print(f"n={n} e={e}: xla {tx*1e3:.3f}ms")

        for transport in ("f32", "bf16"):
            for chunk in (512, 1024, 2048):
                fp = jax.jit(
                    lambda m, t=transport, c=chunk: _pallas_forward(
                        m, dstj, n, False, t, c
                    )
                )
                err = float(jnp.max(jnp.abs(fp(msgs) - ref)))
                tp = bench(fp, msgs)
                gbs = e * d * (2 if transport == "bf16" else 4) / tp / 1e9
                print(
                    f"  {transport} chunk={chunk}: {tp*1e3:.3f}ms ({gbs:.0f} GB/s) "
                    f"speedup {tx/tp:.2f}x maxerr {err:.2e}"
                )


if __name__ == "__main__":
    main()
