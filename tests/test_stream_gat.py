"""Streaming GAT pipeline (ops/stream_gat.py): kernel-vs-oracle parity.

The analytic-self-loop contract: a `gat_loops` StepGraph carries a
loop-free edge list and consumers add the per-row loop softmax term.  The
oracle for ALL of it is plain GAT over the loop-materialized graph
(PyG 1.5 GATConv semantics, reference models/peagat.py:14-21).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graph_recsys_benchmark_tpu.graph import build_gat_graph
from graph_recsys_benchmark_tpu.nn import conv as C
from graph_recsys_benchmark_tpu.ops.stream_gat import (
    stream_gat_attention,
    stream_gat_reference,
)


def _random_graph(seed, n, e):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    return src, dst


def _inputs(seed, n, kz):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    z = jax.random.normal(k1, (n, kz), jnp.float32) * 0.3
    a_src = jax.random.normal(k2, (n,), jnp.float32) * 0.5
    a_dst = jax.random.normal(k3, (n,), jnp.float32) * 0.5
    return z, a_src, a_dst


def test_analytic_loops_match_loop_edges_gat_apply():
    """gat_apply on a gat_loops graph (reference fallback path) must equal
    gat_apply on the loop-materialized graph."""
    n, e = 500, 4000
    src, dst = _random_graph(0, n, e)
    g_loops = build_gat_graph(src, dst, n, analytic_loops=False)
    g_ana = build_gat_graph(src, dst, n, analytic_loops=True)
    assert g_ana.gat_loops and not g_loops.gat_loops
    assert g_ana.num_edges < g_loops.num_edges

    params = C.gat_init(jax.random.PRNGKey(1), 24, 16)
    x = jax.random.normal(jax.random.PRNGKey(2), (n, 24), jnp.float32)
    out_ref = C.gat_apply(params, x, g_loops)
    out_ana = C.gat_apply(params, x, g_ana)
    np.testing.assert_allclose(np.asarray(out_ana), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)


def test_reference_grads_match_loop_edges():
    n, e = 300, 2500
    src, dst = _random_graph(3, n, e)
    g_loops = build_gat_graph(src, dst, n, analytic_loops=False)
    g_ana = build_gat_graph(src, dst, n, analytic_loops=True)
    params = C.gat_init(jax.random.PRNGKey(1), 16, 8)
    x = jax.random.normal(jax.random.PRNGKey(2), (n, 16), jnp.float32)

    def loss(p, g):
        return jnp.sum(C.gat_apply(p, x, g) ** 2)

    g1 = jax.grad(loss)(params, g_loops)
    g2 = jax.grad(loss)(params, g_ana)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g2[k]), np.asarray(g1[k]),
                                   rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize("transport", ["f32", "bf16"])
@pytest.mark.parametrize("self_loops", [True, False])
def test_stream_kernel_interpret_forward(transport, self_loops):
    n, e, kz = 400, 6000, 16
    src, dst = _random_graph(7, n, e)
    g = build_gat_graph(src, dst, n, analytic_loops=True)
    z, a_src, a_dst = _inputs(11, n, kz)

    out = stream_gat_attention(
        z, a_src, a_dst, g.src, g.dst, g.src_perm, g.src_sorted, n,
        self_loops, 0.2, True, transport,
    )
    if transport == "bf16":
        z = z.astype(jnp.bfloat16).astype(jnp.float32)
        a_src = a_src.astype(jnp.bfloat16).astype(jnp.float32)
    ref = stream_gat_reference(z, a_src, a_dst, g.src, g.dst, n, self_loops,
                               0.2)
    tol = 3e-2 if transport == "bf16" else 2e-5
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=tol,
                               atol=tol)


@pytest.mark.parametrize("transport", ["f32"])
def test_stream_kernel_interpret_grads(transport):
    n, e, kz = 300, 5000, 16
    src, dst = _random_graph(13, n, e)
    g = build_gat_graph(src, dst, n, analytic_loops=True)
    z, a_src, a_dst = _inputs(17, n, kz)

    def loss_k(z, a_src, a_dst):
        o = stream_gat_attention(
            z, a_src, a_dst, g.src, g.dst, g.src_perm, g.src_sorted, n,
            True, 0.2, True, transport,
        )
        return jnp.sum(o ** 2)

    def loss_r(z, a_src, a_dst):
        o = stream_gat_reference(z, a_src, a_dst, g.src, g.dst, n, True, 0.2)
        return jnp.sum(o ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(z, a_src, a_dst)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(z, a_src, a_dst)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5)


def test_stream_empty_edges_loop_only():
    """A graph whose padded list is all sentinel edges: output = pure
    self-loop softmax (= z itself, att_ii = 1)."""
    n, kz = 130, 8
    src, dst = _random_graph(19, n, 0)
    g = build_gat_graph(np.zeros(0, np.int64), np.zeros(0, np.int64), n,
                        analytic_loops=True)
    assert g.num_edges == 0
    z, a_src, a_dst = _inputs(23, n, kz)
    out = stream_gat_attention(
        z, a_src, a_dst, g.src, g.dst, g.src_perm, g.src_sorted, n,
        True, 0.2, True, "f32",
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(z), rtol=1e-5,
                               atol=1e-6)
    # gradients stay finite / correct through the loop-only path
    gz = jax.grad(lambda zz: jnp.sum(stream_gat_attention(
        zz, a_src, a_dst, g.src, g.dst, g.src_perm, g.src_sorted, n,
        True, 0.2, True, "f32") ** 2))(z)
    assert bool(jnp.all(jnp.isfinite(gz)))


def test_dropout_reference_zero_dropout_equals_plain():
    n, e = 200, 1500
    src, dst = _random_graph(29, n, e)
    g = build_gat_graph(src, dst, n, analytic_loops=True)
    params = C.gat_init(jax.random.PRNGKey(1), 16, 8)
    x = jax.random.normal(jax.random.PRNGKey(2), (n, 16), jnp.float32)
    out0 = C.gat_apply(params, x, g)
    # dropout active but keep-prob ~1 via masks of all ones is exercised by
    # dropout=0 path; here just check the dropout path runs and is finite
    outd = C.gat_apply(params, x, g, dropout=0.3,
                       dropout_key=jax.random.PRNGKey(5))
    assert bool(jnp.all(jnp.isfinite(outd)))
    assert out0.shape == outd.shape


def test_dropout_reference_softmax_then_drop_parity():
    """stream_gat_reference with a FIXED keep mask must equal the PyG
    order — softmax over the full (loop-materialized) in-edge set FIRST,
    then drop normalized alphas WITHOUT renormalizing — computed here by
    an independent loop-edge segment-op oracle (round-4 ADVICE #1)."""
    n, e, kz, p_drop = 120, 900, 8, 0.4
    src, dst = _random_graph(31, n, e)
    g = build_gat_graph(src, dst, n, analytic_loops=True)
    z, a_src, a_dst = _inputs(7, n, kz)
    er = g.num_edges
    rng = np.random.default_rng(9)
    edge_keep_real = rng.random(er) < (1.0 - p_drop)
    loop_keep = jnp.asarray(rng.random(n) < (1.0 - p_drop))
    # pad edges carry keep=True (their p is 0 anyway)
    edge_keep = jnp.asarray(
        np.concatenate([edge_keep_real, np.ones(g.dst.shape[0] - er, bool)])
    )

    out = stream_gat_reference(
        z, a_src, a_dst, g.src, g.dst, n, self_loops=True,
        edge_keep=edge_keep, loop_keep=loop_keep, dropout=p_drop,
    )

    # independent oracle: materialize the loops as edges, one combined
    # softmax, then drop each normalized alpha
    srcs = np.asarray(g.src)[:er]
    dsts = np.asarray(g.dst)[:er]
    all_src = jnp.asarray(np.concatenate([srcs, np.arange(n)]))
    all_dst = jnp.asarray(np.concatenate([dsts, np.arange(n)]))
    keep_all = jnp.concatenate(
        [edge_keep[:er], loop_keep.astype(bool)]
    )
    pre = a_dst[all_dst] + a_src[all_src]
    act = jnp.where(pre > 0, pre, 0.2 * pre)
    m = jax.ops.segment_max(act, all_dst, num_segments=n)
    pexp = jnp.exp(act - jnp.where(jnp.isfinite(m), m, 0.0)[all_dst])
    s = jax.ops.segment_sum(pexp, all_dst, num_segments=n)
    att = pexp / (s + 1e-16)[all_dst]
    att = jnp.where(keep_all, att / (1.0 - p_drop), 0.0)
    expected = jax.ops.segment_sum(
        att[:, None] * z[all_src], all_dst, num_segments=n
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=2e-5, atol=2e-5)


def test_fuse_rejects_gat_loops_graphs():
    from graph_recsys_benchmark_tpu.graph import fuse_step_graphs

    n, e = 100, 800
    src, dst = _random_graph(31, n, e)
    g = build_gat_graph(src, dst, n, analytic_loops=True)
    with pytest.raises(ValueError):
        fuse_step_graphs([g, g], n)


def test_batched_matches_per_channel():
    """Channels sharing one edge list through the batched kernel must match
    per-channel single calls (and the loop-edge oracle)."""
    from graph_recsys_benchmark_tpu.ops.stream_gat import (
        stream_gat_attention_batched,
    )

    n, e, kz, n_ch = 350, 5000, 16, 3
    src, dst = _random_graph(41, n, e)
    g = build_gat_graph(src, dst, n, analytic_loops=True)
    key = jax.random.PRNGKey(43)
    ks = jax.random.split(key, 3)
    z = jax.random.normal(ks[0], (n_ch, n, kz), jnp.float32) * 0.3
    a_src = jax.random.normal(ks[1], (n_ch, n), jnp.float32) * 0.5
    a_dst = jax.random.normal(ks[2], (n_ch, n), jnp.float32) * 0.5

    outb = stream_gat_attention_batched(
        z, a_src, a_dst, g.src, g.dst, g.src_perm, g.src_sorted, n,
        True, 0.2, True, "f32",
    )
    for c in range(n_ch):
        ref = stream_gat_reference(z[c], a_src[c], a_dst[c], g.src, g.dst,
                                   n, True, 0.2)
        np.testing.assert_allclose(np.asarray(outb[c]), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    # batched grads vs per-channel reference grads
    def loss_b(z, a_src, a_dst):
        o = stream_gat_attention_batched(
            z, a_src, a_dst, g.src, g.dst, g.src_perm, g.src_sorted, n,
            True, 0.2, True, "f32",
        )
        return jnp.sum(o ** 2)

    def loss_r(z, a_src, a_dst):
        tot = 0.0
        for c in range(n_ch):
            o = stream_gat_reference(z[c], a_src[c], a_dst[c], g.src, g.dst,
                                     n, True, 0.2)
            tot = tot + jnp.sum(o ** 2)
        return tot

    gb = jax.grad(loss_b, argnums=(0, 1, 2))(z, a_src, a_dst)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(z, a_src, a_dst)
    for a, b in zip(gb, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5)


def test_grouped_pea_forward_matches_ungrouped():
    """The grouped per-channel GAT forward must reproduce _channel_forward
    exactly when no batching applies (small graphs, loops as edges), and
    match the loop-edge math when channels batch (gat_loops graphs)."""
    import dataclasses as _dc

    from graph_recsys_benchmark_tpu.models import pea as P
    from graph_recsys_benchmark_tpu.graph import build_metapath_graphs

    rng = np.random.default_rng(47)
    n = 300
    e1 = (rng.integers(0, n, 1500), rng.integers(0, n, 1500))
    e2 = (rng.integers(0, n, 2000), rng.integers(0, n, 2000))
    # three channels; channels 0 and 2 share the SAME step lists
    mp = [[e1, e2], [e2, e1], [e1, e2]]
    cfg = P.PEAConfig(conv="gat", num_nodes=n, meta_path_steps=(2, 2, 2),
                      emb_dim=16, hidden_size=16, repr_dim=8, fused=False)
    params = P.pea_init(jax.random.PRNGKey(3), cfg)

    g_edges = build_metapath_graphs(mp, n, "gat", analytic_gat_loops=False)
    g_ana = build_metapath_graphs(mp, n, "gat", analytic_gat_loops=True)
    # dedup shares objects across channels
    assert g_edges[0][0] is g_edges[2][0]
    out_edges = P.pea_forward(params, g_edges, cfg)
    out_ana = P.pea_forward(params, g_ana, cfg)
    np.testing.assert_allclose(np.asarray(out_ana), np.asarray(out_edges),
                               rtol=5e-5, atol=5e-5)
