"""Decompose flagship step time: sampling / forward / +backward / +adam.

Runs the SAME scan-epoch skeleton as bench.py with the loss/grad/update
stages progressively enabled, so each increment isolates one stage's cost.
(Stage deltas are approximate — XLA fuses across stages — but they bound
where the non-kernel time goes; VERDICT round 1 item 2.)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from graph_recsys_benchmark_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import importlib

bench = importlib.import_module("bench")


def timed_epoch(fn, params, opt_state, n=3):
    key = jax.random.PRNGKey(0)
    out = fn(params, opt_state, key)
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(n):
        out = fn(params, opt_state, jax.random.PRNGKey(i + 1))
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    from graph_recsys_benchmark_tpu.ops import config as ops_config

    ops_config.SEGSUM_TRANSPORT = "bf16"
    trainer, hin = bench.build()
    eng = trainer.engine if hasattr(trainer, "engine") else trainer
    params, opt_state = trainer.init(seed=2020)

    bs = eng.tcfg.batch_size
    num_batches = eng.num_batches
    n_rows = eng.n_rows
    n_pad = num_batches * bs

    def make_epoch(mode):
        def epoch(params, opt_state, key):
            kperm, kscan = jax.random.split(key)
            perm = jax.random.permutation(kperm, n_rows)
            perm = jnp.pad(perm, (0, n_pad - n_rows))
            mask_all = (jnp.arange(n_pad) < n_rows).astype(jnp.float32)

            def step(carry, inputs):
                params, opt_state = carry
                rows, row_mask, bkey = inputs
                kb, kl = jax.random.split(bkey)
                batch = eng._build_batch(rows, kb)
                if mode == "sample":
                    # consume the batch so it isn't DCE'd
                    return (params, opt_state), jnp.sum(batch).astype(jnp.float32)
                if mode == "fwd":
                    loss = eng._batch_loss(params, batch, row_mask, kl)
                    return (params, opt_state), loss
                loss, grads = jax.value_and_grad(
                    lambda p: eng._batch_loss(p, batch, row_mask, kl)
                )(params)
                if mode == "bwd":
                    # consume grads without the optimizer
                    gs = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
                    return (params, opt_state), loss + gs * 0.0
                updates, opt_state = eng.optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                step,
                (params, opt_state),
                (
                    perm.reshape(num_batches, bs),
                    mask_all.reshape(num_batches, bs),
                    jax.random.split(kscan, num_batches),
                ),
            )
            return jnp.mean(losses)

        return jax.jit(epoch)

    prev = 0.0
    for mode in ["sample", "fwd", "bwd", "full"]:
        dt = timed_epoch(make_epoch(mode), params, opt_state)
        ms = dt / num_batches * 1e3
        print(
            f"{mode:7s}: {dt:.3f}s/epoch  {ms:7.3f} ms/step  (+{ms - prev:6.3f})  "
            f"{n_rows / dt:,.0f} ex/s"
        )
        prev = ms


if __name__ == "__main__":
    main()
