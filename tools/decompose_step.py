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

    import json

    from graph_recsys_benchmark_tpu.utils.roofline import (
        V5E_HBM_BYTES_PER_S,
        cost_numbers,
    )

    prev_ms = 0.0
    prev_bytes = 0.0
    prev_flops = 0.0
    stages = {}
    for mode in ["sample", "fwd", "bwd", "full"]:
        fn = make_epoch(mode)
        dt = timed_epoch(fn, params, opt_state)
        # XLA's cost model counts the scan body ONCE, so bytes_accessed is
        # (approximately) ONE step's HBM traffic, not the epoch's
        flops, bytes_acc = cost_numbers(
            fn.lower(params, opt_state, jax.random.PRNGKey(0)).compile()
        )
        ms = dt / num_batches * 1e3
        d_ms = ms - prev_ms
        d_bytes = bytes_acc - prev_bytes
        d_flops = flops - prev_flops
        gbps = bytes_acc / (ms * 1e-3) / 1e9 if ms else 0.0
        stage_gbps = d_bytes / (d_ms * 1e-3) / 1e9 if d_ms > 0 else 0.0
        stages[mode] = {
            "ms_per_step": round(ms, 3),
            "stage_delta_ms": round(d_ms, 3),
            "bytes_per_step": round(bytes_acc),
            "stage_delta_bytes": round(d_bytes),
            "stage_delta_flops": round(d_flops),
            "cum_hbm_gbps": round(gbps, 1),
            "stage_hbm_gbps": round(stage_gbps, 1),
            "stage_hbm_util": round(stage_gbps * 1e9 / V5E_HBM_BYTES_PER_S, 4),
        }
        print(
            f"{mode:7s}: {dt:.3f}s/epoch  {ms:7.3f} ms/step  (+{d_ms:6.3f})  "
            f"{n_rows / dt:,.0f} ex/s  stage {stage_gbps:6.1f} GB/s "
            f"({stages[mode]['stage_hbm_util']:.0%} of v5e HBM)"
        )
        prev_ms, prev_bytes, prev_flops = ms, bytes_acc, flops

    out = {
        "metric": "flagship_step_phase_roofline",
        "unit": "per-step bytes / achieved GB/s (v5e peak 819)",
        "stages": stages,
        "note": "stages are cumulative program variants (sample -> +forward "
                "-> +backward -> +adam); deltas attribute bytes/time to each "
                "phase; bytes from XLA post-fusion cost model incl. Pallas "
                "CostEstimates",
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "ROOFLINE.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"wrote": path}))


if __name__ == "__main__":
    main()
