"""Roofline decomposition of the ML-25M training step (round-4 verdict
directive #3): per-phase (sample / fwd / grad / adam) AND per-group
attribution — one row per deduped step-graph pass (the 15 channel-batch
groups of the 13-metapath config) with measured ms, analytic stream
bytes, and achieved GB/s, so the 281 ms/step of BENCH_25m.json stops
being unexplained.

Phases are measured decompose_step.py-style (each phase its own compiled
scan program; XLA's cost model counts a scan body once).  Group rows are
measured from standalone scans of stream_gat_attention_batched at the
group's exact shapes.

Writes ROOFLINE_25m.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from graph_recsys_benchmark_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import importlib

bench_25m = importlib.import_module("tools.bench_25m")

N_STEPS = 8


def scan_time(fn, *args, n_it=20):
    def prog(args):
        def step(carry, _):
            out = fn(*args, carry)
            s = sum(
                jnp.sum(o).astype(jnp.float32)
                for o in jax.tree_util.tree_leaves(out)
                if jnp.issubdtype(o.dtype, jnp.floating)
            )
            return carry * 0.0 + s * 1e-30, ()

        carry, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n_it)
        return carry

    j = jax.jit(prog)
    out = j(args)
    jax.block_until_ready(out)
    t0 = time.time()
    out = j(args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n_it * 1e3


def group_rows(trainer, hin):
    """One measured row per deduped step-graph pass."""
    from graph_recsys_benchmark_tpu.models.pea import _channel_layer_dims
    from graph_recsys_benchmark_tpu.ops import config as ops_config
    from graph_recsys_benchmark_tpu.ops.stream_gat import (
        _layout, stream_gat_attention_batched,
    )

    cfg = trainer.cfg
    per_channel = trainer.graphs
    n = cfg.num_nodes
    num_steps = cfg.meta_path_steps[0]
    dims = _channel_layer_dims(cfg, num_steps)
    key = jax.random.PRNGKey(0)
    rows = []
    for k in range(num_steps):
        _, kz, heads, _ = dims[k]
        groups = {}
        for c in range(cfg.num_channels):
            groups.setdefault(id(per_channel[c][k]), []).append(c)
        for chans in groups.values():
            g = per_channel[chans[0]][k]
            n_ch = len(chans)
            e_pad = int(g.src.shape[0])
            z = jax.random.normal(key, (n_ch, n, kz), jnp.float32) * 0.3
            asr = jax.random.normal(key, (n_ch, n), jnp.float32)
            ads = jax.random.normal(key, (n_ch, n), jnp.float32)

            def fwd(z_, a_, b_, c):
                return stream_gat_attention_batched(
                    z_ + c, a_, b_, g.src, g.dst, g.src_perm, g.src_sorted,
                    n, bool(g.gat_loops), 0.2, False,
                    ops_config.SEGSUM_TRANSPORT,
                )

            def fb(z_, a_, b_, c):
                def loss(zz, aa, bb):
                    o = stream_gat_attention_batched(
                        zz, aa, bb, g.src, g.dst, g.src_perm, g.src_sorted,
                        n, bool(g.gat_loops), 0.2, False,
                        ops_config.SEGSUM_TRANSPORT,
                    )
                    return jnp.sum(o * o)

                return jax.grad(loss, argnums=(0, 1, 2))(z_ + c, a_, b_)

            t_f = scan_time(fwd, z, asr, ads)
            t_fb = scan_time(fb, z, asr, ads)
            itemsize = 2 if ops_config.SEGSUM_TRANSPORT == "bf16" else 4
            kb_pad, _, _ = _layout(n, kz, n_ch)  # physical lane width
            stream_bytes = e_pad * kb_pad * itemsize
            # per grad pass: packed_e gather (w+r via fwd), fwd read,
            # bwd_dst read, st_e gather (w) + bwd_src read + ids
            bytes_grad = stream_bytes * 5 + e_pad * 4 * 4
            rows.append({
                "step": k,
                "channels": chans,
                "n_ch": n_ch,
                "kz": kz,
                "edges_padded": e_pad,
                "gat_loops": bool(g.gat_loops),
                "src_span": round(float(g.src_span), 1),
                "fwd_ms": round(t_f, 3),
                "fwd_bwd_ms": round(t_fb, 3),
                "stream_bytes_per_pass": stream_bytes,
                "analytic_bytes_grad": bytes_grad,
                "grad_gbps": round(bytes_grad / (t_fb * 1e-3) / 1e9, 1),
            })
            print(json.dumps(rows[-1]), flush=True)
    return rows


def phase_rows(trainer):
    from graph_recsys_benchmark_tpu.utils.roofline import (
        V5E_HBM_BYTES_PER_S, cost_numbers,
    )

    eng = trainer
    bs = eng.tcfg.batch_size
    params, opt_state = trainer.init(seed=2020)
    key = jax.random.PRNGKey(0)
    bkeys = jax.random.split(key, N_STEPS)
    rows_all = jax.vmap(
        lambda k: jax.random.randint(k, (bs,), 0, eng.n_rows)
    )(bkeys)
    masks = jnp.ones((N_STEPS, bs), jnp.float32)

    @jax.jit
    def phase_sample(rows_all, bkeys):
        def step(_, inp):
            rows, bkey = inp
            kb, _ = jax.random.split(bkey)
            batch = eng._build_batch(rows, kb)
            return (), jnp.sum(batch).astype(jnp.float32)

        _, s = jax.lax.scan(step, (), (rows_all, bkeys))
        return jnp.sum(s)

    batches = jax.jit(jax.vmap(eng._build_batch))(
        rows_all, jax.vmap(lambda k: jax.random.split(k)[0])(bkeys)
    )
    lkeys = jax.vmap(lambda k: jax.random.split(k)[1])(bkeys)

    @jax.jit
    def phase_fwd(params, batches, masks, lkeys):
        def step(_, inp):
            batch, mask, kl = inp
            return (), eng._batch_loss(params, batch, mask, kl)

        _, losses = jax.lax.scan(step, (), (batches, masks, lkeys))
        return jnp.mean(losses)

    @jax.jit
    def phase_grad(params, batches, masks, lkeys):
        def step(_, inp):
            batch, mask, kl = inp
            loss, grads = jax.value_and_grad(
                lambda p: eng._batch_loss(p, batch, mask, kl)
            )(params)
            gs = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
            return (), loss + 0.0 * gs

        _, losses = jax.lax.scan(step, (), (batches, masks, lkeys))
        return jnp.mean(losses)

    grads_once = jax.jit(
        lambda p, b, m, k: jax.grad(lambda q: eng._batch_loss(q, b, m, k))(p)
    )(params, batches[0], masks[0], lkeys[0])

    @jax.jit
    def phase_adam(params, opt_state, grads):
        def step(carry, _):
            params, opt_state = carry
            updates, opt_state = eng.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), ()

        (params, opt_state), _ = jax.lax.scan(
            step, (params, opt_state), (), length=N_STEPS
        )
        return jax.tree_util.tree_leaves(params)[0].sum()

    phases = {
        "sample": (phase_sample, (rows_all, bkeys)),
        "fwd": (phase_fwd, (params, batches, masks, lkeys)),
        "grad": (phase_grad, (params, batches, masks, lkeys)),
        "adam": (phase_adam, (params, opt_state, grads_once)),
    }
    stages = {}
    for name, (fn, args) in phases.items():
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(2):
            out = fn(*args)
        jax.block_until_ready(out)
        ms = (time.time() - t0) / 2 / N_STEPS * 1e3
        compiled = fn.lower(*args).compile()
        flops, bytes_acc = cost_numbers(compiled)
        gbps = bytes_acc / (ms * 1e-3) / 1e9 if ms else 0.0
        stages[name] = {
            "ms_per_step": round(ms, 3),
            "bytes_per_step": int(bytes_acc),
            "flops_per_step": int(flops),
            "hbm_gbps": round(gbps, 1),
            "hbm_util": round(gbps * 1e9 / V5E_HBM_BYTES_PER_S, 4),
        }
        print(name, json.dumps(stages[name]), flush=True)
    return stages


def main():
    from graph_recsys_benchmark_tpu.ops import config as ops_config

    ops_config.SEGSUM_TRANSPORT = "bf16"
    trainer, hin, build_s, graph_s = bench_25m.build(
        num_users=40_000, num_items=16_000, target_interactions=2_000_000,
        fused=False,
    )
    rows = group_rows(trainer, hin)
    stages = phase_rows(trainer)
    sum_grad_ms = round(sum(r["fwd_bwd_ms"] for r in rows), 1)
    # analytic HBM floor of the grad phase: every stream group moves its
    # packed stream ~5x (gather write, fwd read, bwd_dst read, st_e
    # gather write, bwd_src read) + ids; at the v5e's 819 GB/s peak.
    # The random-access gathers are transaction-bound well below peak in
    # practice, so this is a LOWER bound, not an expectation.
    floor_ms = round(
        sum(r["analytic_bytes_grad"] for r in rows) / 819e9 * 1e3, 1
    )
    out = {
        "metric": "ml25m_step_phase_and_group_roofline",
        "unit": "per-step ms / analytic stream bytes (v5e HBM peak 819 GB/s)",
        "stages": stages,
        "groups": rows,
        "sum_group_fwd_bwd_ms": sum_grad_ms,
        "analytic_grad_floor_ms": floor_ms,
        "note": (
            "groups = deduped step-graph passes of the 13-channel config; "
            "analytic bytes assume the 128-col band stream layout; the "
            "grad phase ~ sum of group fwd_bwd rows + batch/entity tail"
        ),
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "ROOFLINE_25m.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"wrote": "ROOFLINE_25m.json",
                      "sum_group_fwd_bwd_ms": sum_grad_ms}))


if __name__ == "__main__":
    main()
