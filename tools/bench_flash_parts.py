"""Steady-state device timing of the flash-GAT pipeline pieces.

Each candidate op runs inside ONE jitted lax.scan (iterations serialized by
a carry perturbation), exactly like the production scan-epoch — per-call
host/tunnel dispatch latency (which dominates naive per-call timing through
the axon relay, ~0.5-1 ms/call) cancels out.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from graph_recsys_benchmark_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import importlib

bench = importlib.import_module("bench")

N_IT = 200


def scan_time(fn, *args):
    """Mean device ms/iteration of fn(*args) inside one jitted scan."""

    def epoch(args):
        def step(carry, _):
            out = fn(*jax.tree_util.tree_map(lambda a: a, args), carry)
            # fold a scalar of the output back into the carry to serialize
            s = sum(
                jnp.sum(o).astype(jnp.float32)
                for o in jax.tree_util.tree_leaves(out)
                if jnp.issubdtype(o.dtype, jnp.floating)
            )
            return carry * 0.0 + s * 1e-30, ()

        carry, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=N_IT)
        return carry

    j = jax.jit(epoch)
    out = j(args)
    jax.block_until_ready(out)
    t0 = time.time()
    out = j(args)
    jax.block_until_ready(out)
    return (time.time() - t0) / N_IT * 1e3


def main():
    from graph_recsys_benchmark_tpu.data.movielens import mlsmall_metapath_edges
    from graph_recsys_benchmark_tpu.graph import build_fused_metapath_graphs
    from graph_recsys_benchmark_tpu.ops import flash_gat as fg
    from graph_recsys_benchmark_tpu.ops.gather import gather_rows
    from graph_recsys_benchmark_tpu.ops.pallas_segment import (
        _BR,
        _cdiv,
        localized_scatter_add_pallas,
        segment_sum_auto,
        sorted_broadcast_auto,
    )

    trainer, hin = bench.build()
    fused = build_fused_metapath_graphs(
        mlsmall_metapath_edges(hin), hin.num_nodes, "gat"
    )
    n = fused[0].num_nodes

    for i, (g, kz) in enumerate(zip(fused, [64, 16])):
        key = jax.random.PRNGKey(i)
        E = g.dst.shape[0]
        k = kz + 1
        k_pad = max(8, _cdiv(k, 8) * 8)
        n_src_pad = _cdiv(n + 1, _BR) * _BR + _BR
        packed = jax.random.normal(key, (n, k), jnp.float32).astype(jnp.bfloat16)
        a_dst = jax.random.normal(key, (n,), jnp.float32)
        table = jax.random.normal(key, (n, kz + 4), jnp.float32)
        ct = jax.random.normal(key, (E, k), jnp.float32)
        dpre = jax.random.normal(key, (E,), jnp.float32)

        packed_t = fg.pack_gat_table(
            jnp.asarray(packed.T[:kz]), a_dst * 0 + 1.0, n, jnp.bfloat16
        )

        def fwd(pt, ad, c):
            return fg._flash_forward_impl(
                pt + c.astype(jnp.bfloat16), ad, g.src, g.dst, n, kz, 0.2,
                False, "bf16",
            )

        def bwd(pt, ad, c):
            def loss(q, a):
                out = fg.flash_gat_attention(
                    q, a, g.src, g.dst, g.src_perm, g.src_sorted, n, kz,
                    0.2, False, "bf16",
                )
                return jnp.sum(out * out)

            return jax.grad(loss, argnums=(0, 1))(
                pt + c.astype(jnp.bfloat16), ad
            )

        t_fwd = scan_time(fwd, packed_t, a_dst)
        t_fb = scan_time(bwd, packed_t, a_dst)
        t_bc = scan_time(
            lambda t, c: sorted_broadcast_auto(t + c, g.dst, n, exact=False),
            table,
        )
        t_gr = scan_time(
            lambda p, c: gather_rows(
                p + c.astype(jnp.bfloat16), g.src, g.src_perm, g.src_sorted, n
            ),
            packed,
        )
        t_sc = scan_time(
            lambda x, c: localized_scatter_add_pallas(
                x + c, g.src, n, transport="bf16"
            ),
            ct,
        )
        t_ss = scan_time(
            lambda d, c: segment_sum_auto((d + c)[:, None], g.dst, n), dpre
        )
        print(
            f"step{i} E={E} kz={kz}: fwd {t_fwd:.3f}  fwd+bwd(mega) {t_fb:.3f}  "
            f"bcast {t_bc:.3f}  gather {t_gr:.3f}  scatter {t_sc:.3f}  "
            f"segsum1 {t_ss:.3f}  (ms)"
        )


if __name__ == "__main__":
    main()
