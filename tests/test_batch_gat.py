"""Batched shared-edge flash-GAT (ops/batch_gat.py) + the hybrid plan
(models/pea.build_hybrid_gat_plan): kernel-vs-oracle parity and
end-to-end equivalence with the fused-union trainer path.

The oracle for the kernel is per-channel PyG 1.5 GATConv semantics over
the loop-materialized edge list (reference models/peagat.py:14-21) —
identical to ops/flash_gat.flash_gat_attention's contract.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graph_recsys_benchmark_tpu.graph import build_gat_graph
from graph_recsys_benchmark_tpu.ops.batch_gat import (
    batch_gat_attention,
    batch_gat_enabled,
    batch_gat_reference,
)


def _graph(seed, n, e):
    rng = np.random.default_rng(seed)
    return build_gat_graph(
        rng.integers(0, n, e), rng.integers(0, n, e), n,
        analytic_loops=False,
    )


def _inputs(seed, n_ch, n, kz, scale=0.3):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    z = jax.random.normal(k1, (n_ch, n, kz)) * scale
    a_src = jax.random.normal(k2, (n_ch, n)) * 0.5
    a_dst = jax.random.normal(k3, (n_ch, n)) * 0.5
    g = jax.random.normal(k4, (n_ch, n, kz))
    return z, a_src, a_dst, g


def test_kernel_interpret_matches_oracle_f32():
    n, e, kz, n_ch = 300, 2500, 16, 7
    g = _graph(0, n, e)
    z, a_src, a_dst, gct = _inputs(1, n_ch, n, kz)

    out = batch_gat_attention(z, a_src, a_dst, g.src, g.dst, n, 0.2, True,
                              "f32")
    ref = batch_gat_reference(z, a_src, a_dst, g.src, g.dst, n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-6, atol=5e-6)

    def loss(zz, asr, ads):
        o = batch_gat_attention(zz, asr, ads, g.src, g.dst, n, 0.2, True,
                                "f32")
        return jnp.sum(o * gct)

    def loss_ref(zz, asr, ads):
        return jnp.sum(
            batch_gat_reference(zz, asr, ads, g.src, g.dst, n) * gct
        )

    grads = jax.grad(loss, argnums=(0, 1, 2))(z, a_src, a_dst)
    refs = jax.grad(loss_ref, argnums=(0, 1, 2))(z, a_src, a_dst)
    for got, want in zip(grads, refs):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=5e-5, atol=5e-5)


def test_kernel_bf16_matches_flash_bf16():
    """bf16 transport deviates from the f32 oracle by inherent rounding
    (the flash kernels share the trade) — the contract is matching the
    ESTABLISHED flash bf16 numerics per channel."""
    from graph_recsys_benchmark_tpu.ops import flash_gat as fg

    n, e, kz, n_ch = 300, 2500, 16, 7
    g = _graph(0, n, e)
    z, a_src, a_dst, gct = _inputs(1, n_ch, n, kz)

    def flash_per_ch(zz, asr, ads):
        outs = []
        for c in range(n_ch):
            pk = fg.pack_gat_table(zz[c].T, asr[c], n, jnp.bfloat16)
            outs.append(fg.flash_gat_attention(
                pk, ads[c], g.src, g.dst, g.src_perm, g.src_sorted, n, kz,
                0.2, True, "bf16",
            ))
        return jnp.stack(outs)

    out = batch_gat_attention(z, a_src, a_dst, g.src, g.dst, n, 0.2, True,
                              "bf16")
    ref = flash_per_ch(z, a_src, a_dst)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=4e-3, atol=4e-3)

    def loss(zz, asr, ads):
        o = batch_gat_attention(zz, asr, ads, g.src, g.dst, n, 0.2, True,
                                "bf16")
        return jnp.sum(o * gct)

    def loss_ref(zz, asr, ads):
        return jnp.sum(flash_per_ch(zz, asr, ads) * gct)

    grads = jax.grad(loss, argnums=(0, 1, 2))(z, a_src, a_dst)
    refs = jax.grad(loss_ref, argnums=(0, 1, 2))(z, a_src, a_dst)
    for got, want in zip(grads, refs):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)


def test_empty_edge_list_returns_zeros():
    n, kz, n_ch = 100, 8, 3
    z, a_src, a_dst, gct = _inputs(2, n_ch, n, kz)
    src = jnp.zeros((0,), jnp.int32)
    dst = jnp.zeros((0,), jnp.int32)
    out = batch_gat_attention(z, a_src, a_dst, src, dst, n, 0.2, True, "f32")
    assert out.shape == (n_ch, n, kz)
    assert float(jnp.max(jnp.abs(out))) == 0.0
    grads = jax.grad(
        lambda zz: jnp.sum(
            batch_gat_attention(zz, a_src, a_dst, src, dst, n, 0.2, True,
                                "f32") * gct
        )
    )(z)
    assert float(jnp.max(jnp.abs(grads))) == 0.0


def test_enabled_gate_limits():
    # channel-count limits
    assert not batch_gat_enabled(1000, 16, 1, False)
    assert not batch_gat_enabled(1000, 16, 9, False)
    # dropout routes off
    assert not batch_gat_enabled(1000, 16, 4, True)
    # VMEM overflow at large N falls back instead of asserting
    assert not batch_gat_enabled(500_000, 64, 8, False)


def test_hybrid_plan_groups_shared_graphs():
    from graph_recsys_benchmark_tpu.models.pea import (
        PEAConfig, build_hybrid_gat_plan,
    )
    from graph_recsys_benchmark_tpu.graph import build_metapath_graphs

    n = 200
    rng = np.random.default_rng(3)
    shared = (rng.integers(0, n, 900), rng.integers(0, n, 900))
    solo = (rng.integers(0, n, 400), rng.integers(0, n, 400))
    # channels 0,1,2 share `shared` as their 2nd step; channel 3 is solo
    metapaths = [
        [(rng.integers(0, n, 300), rng.integers(0, n, 300)), shared]
        for _ in range(3)
    ] + [[solo, solo]]
    graphs = build_metapath_graphs(metapaths, n, "gat")
    cfg = PEAConfig(conv="gat", num_nodes=n, meta_path_steps=(2,) * 4,
                    emb_dim=8, hidden_size=8, repr_dim=4)
    plan = build_hybrid_gat_plan(graphs, n, cfg)
    assert plan.num_channels == 4
    b1, union1, rest1 = plan.steps[1]
    assert len(b1) == 1 and b1[0][1] == (0, 1, 2)
    assert rest1 == (3,) and union1 is not None
    # step 0: all distinct -> no batched groups, one union of 4
    b0, union0, rest0 = plan.steps[0]
    assert b0 == () and rest0 == (0, 1, 2, 3)
    assert plan.has_batched


def test_hybrid_trainer_matches_union_trainer():
    """End to end: the hybrid-plan PEATrainer reproduces the fused-union
    trainer's epoch (same RNG recipe) to fp tolerance on CPU."""
    from graph_recsys_benchmark_tpu.data import (
        build_mlsmall_hin, synthetic_mlsmall_raw,
    )
    from graph_recsys_benchmark_tpu.models.pea import (
        HybridGATPlan, PEAConfig,
    )
    from graph_recsys_benchmark_tpu.train import PEATrainer, TrainConfig

    movies, ratings, tagging = synthetic_mlsmall_raw(
        seed=7, num_users=60, num_items=90, min_ratings_per_user=12,
        max_ratings_per_user=30, num_directors=20, num_actors=40,
        num_writers=25, num_tags=30, tagging_rows=200,
    )
    hin = build_mlsmall_hin(movies, ratings, tagging, num_core=3,
                            num_feat_core=2)
    cfg = PEAConfig(conv="gat", num_nodes=hin.num_nodes,
                    meta_path_steps=(2,) * 9, emb_dim=16, hidden_size=16,
                    repr_dim=8, entity_aware=True)
    tcfg = TrainConfig(batch_size=128, sampling_strategy="unseen")

    tr = PEATrainer(hin, cfg, tcfg)
    assert isinstance(tr.graphs, HybridGATPlan)

    class UnionTrainer(PEATrainer):
        _use_hybrid_plan = False

    tr2 = UnionTrainer(hin, cfg, tcfg)

    p1, o1 = tr.init(seed=2020)
    p2, o2 = tr2.init(seed=2020)
    p1, o1, loss1 = tr.run_epoch(p1, o1, jax.random.PRNGKey(0))
    p2, o2, loss2 = tr2.run_epoch(p2, o2, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

    # eval + ablation parity through the plan
    m1 = tr.evaluate(p1, jax.random.PRNGKey(1))
    m2 = tr2.evaluate(p2, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(m1["HR"]), np.asarray(m2["HR"]),
                               rtol=1e-4, atol=1e-5)
