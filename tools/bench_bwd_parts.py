"""Steady-state timing of the composed flash-GAT BACKWARD pieces under the
production (bf16-transport) flagship config, at both bench-scale layer
shapes.  Identifies what a fused backward-glue kernel must beat."""

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
    def epoch(args):
        def step(carry, _):
            out = fn(*args, carry)
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
    import graph_recsys_benchmark_tpu.ops.config as cfg
    from graph_recsys_benchmark_tpu.data.movielens import mlsmall_metapath_edges
    from graph_recsys_benchmark_tpu.graph import build_fused_metapath_graphs
    from graph_recsys_benchmark_tpu.ops import flash_gat as fg
    from graph_recsys_benchmark_tpu.ops.pallas_segment import (
        _BR,
        _broadcast_forward,
        _cdiv,
        localized_scatter_add_pallas,
        segment_sum_auto,
    )

    cfg.SEGSUM_TRANSPORT = "bf16"
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
        packed_t = jnp.pad(
            jax.random.normal(key, (k, n), jnp.float32).astype(jnp.bfloat16),
            ((0, k_pad - k), (0, n_src_pad - n)),
        )
        gmat = jax.random.normal(key, (n, kz), jnp.float32)
        g_tab = gmat.astype(jnp.bfloat16)
        stats = jax.random.normal(key, (n, 3), jnp.float32)
        a_dst = jax.random.normal(key, (n,), jnp.float32)
        m = jnp.abs(jax.random.normal(key, (n,), jnp.float32)) + 1.0
        s = jnp.abs(jax.random.normal(key, (n,), jnp.float32)) + 1.0
        out = jax.random.normal(key, (n, kz), jnp.float32)
        dpre = jax.random.normal(key, (E,), jnp.float32)
        ct = jax.random.normal(key, (k, E), jnp.float32).astype(jnp.bfloat16)

        t_bc_g = scan_time(
            lambda t, c: _broadcast_forward(
                t + c.astype(t.dtype), g.dst, n, False, exact=False,
                out_transposed=True,
            ),
            g_tab,
        )
        t_bc_st = scan_time(
            lambda t, c: _broadcast_forward(
                t + c, g.dst, n, False, exact=False, out_transposed=True
            ),
            stats,
        )
        t_gather = scan_time(
            lambda p, c: _broadcast_forward(
                None, g.src, n, False, exact=False, out_transposed=True,
                v_t=p + c.astype(p.dtype), k=k,
            ),
            packed_t,
        )

        def glue(g_e, st_e, pk_t, c):
            gout_e, logden_e, adst_e = st_e[0], st_e[1], st_e[2]
            z_e = pk_t[:kz].astype(jnp.float32)
            a_src_e = pk_t[kz].astype(jnp.float32)
            pre = adst_e + a_src_e + c
            act = jnp.where(pre > 0, pre, 0.2 * pre)
            att = jnp.where(g.dst < n, jnp.exp(act - logden_e), 0.0)
            datt = jnp.sum(g_e.astype(jnp.float32) * z_e, axis=0)
            dalpha = att * (datt - gout_e)
            dpre_ = dalpha * jnp.where(pre > 0, 1.0, 0.2)
            ct_t = jnp.concatenate(
                [
                    (att[None] * g_e.astype(jnp.float32)).astype(jnp.bfloat16),
                    dpre_[None].astype(jnp.bfloat16),
                ],
                axis=0,
            )
            return ct_t, dpre_

        g_e0 = jnp.zeros((kz, E), jnp.bfloat16)
        st_e0 = jnp.zeros((3, E), jnp.float32)
        pk0 = jnp.zeros((k, E), jnp.bfloat16)
        t_glue = scan_time(glue, g_e0, st_e0, pk0)

        t_scatter = scan_time(
            lambda x, c: localized_scatter_add_pallas(
                None, g.src, n, transport="bf16",
                ct_t=(x + c.astype(x.dtype)),
            ),
            ct,
        )
        t_seg1 = scan_time(
            lambda d, c: segment_sum_auto((d + c)[:, None], g.dst, n), dpre
        )

        def full_bwd(pt, ad, c):
            def loss(q, a):
                o = fg.flash_gat_attention(
                    q, a, g.src, g.dst, g.src_perm, g.src_sorted, n, kz,
                    0.2, False, "bf16",
                )
                return jnp.sum(o * o)

            return jax.grad(loss, argnums=(0, 1))(pt + c.astype(pt.dtype), ad)

        t_fb = scan_time(full_bwd, packed_t, a_dst)
        t_fwd = scan_time(
            lambda pt, ad, c: fg._flash_forward_impl(
                pt + c.astype(pt.dtype), ad, g.src, g.dst, n, kz, 0.2, False,
                "bf16",
            ),
            packed_t, a_dst,
        )

        print(
            f"step{i} E={E} kz={kz}: fwd {t_fwd:.3f} fwd+bwd {t_fb:.3f} | "
            f"bc_g {t_bc_g:.3f} bc_st {t_bc_st:.3f} gather {t_gather:.3f} "
            f"glue {t_glue:.3f} scatter {t_scatter:.3f} seg1 {t_seg1:.3f} "
            f"sum(bwd parts) {t_bc_g+t_bc_st+t_gather+t_glue+t_scatter+t_seg1:.3f} (ms)"
        )


if __name__ == "__main__":
    main()
