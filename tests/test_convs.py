"""Golden tests: each conv vs a dense numpy oracle implementing the
reference layer math directly (PyG 1.5 semantics / reference nn/*.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_recsys_benchmark_tpu import graph as G
from graph_recsys_benchmark_tpu.nn import conv as C


def _rand_graph(rng, n, e):
    src = rng.integers(0, n, size=e)
    dst = rng.integers(0, n, size=e)
    return src.astype(np.int64), dst.astype(np.int64)


def _leaky(x, s=0.2):
    return np.where(x > 0, x, s * x)


N, E, DIN, DOUT = 19, 57, 6, 4
RNG = np.random.default_rng(42)
SRC, DST = _rand_graph(RNG, N, E)
X = RNG.standard_normal((N, DIN)).astype(np.float32)


def test_gcn_matches_dense_oracle():
    g = G.build_gcn_graph(SRC, DST, N)
    params = C.gcn_init(jax.random.PRNGKey(0), DIN, DOUT)
    got = np.asarray(C.gcn_apply(params, jnp.asarray(X), g))

    # oracle: A+I — replicate add_remaining_self_loops (keep existing loops,
    # add missing), deg over source row
    loops_present = np.unique(SRC[SRC == DST])
    missing = np.setdiff1d(np.arange(N), loops_present)
    s = np.concatenate([SRC, missing])
    d = np.concatenate([DST, missing])
    deg = np.bincount(s, minlength=N).astype(np.float64)
    dinv = np.where(deg > 0, deg**-0.5, 0.0)
    w = np.asarray(params["w"])
    h = X @ w
    want = np.zeros((N, DOUT))
    for j, i in zip(s, d):
        want[i] += dinv[j] * dinv[i] * h[j]
    want += np.asarray(params["b"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("heads", [1, 3])
def test_gat_matches_dense_oracle(heads):
    g = G.build_gat_graph(SRC, DST, N)
    params = C.gat_init(jax.random.PRNGKey(1), DIN, DOUT, heads=heads)
    got = np.asarray(C.gat_apply(params, jnp.asarray(X), g, heads=heads))

    keep = SRC != DST
    s = np.concatenate([SRC[keep], np.arange(N)])
    d = np.concatenate([DST[keep], np.arange(N)])
    w = np.asarray(params["w"])
    att = np.asarray(params["att"])[0]  # [H, 2C]
    h = (X @ w).reshape(N, heads, DOUT)
    a_dst, a_src = att[:, :DOUT], att[:, DOUT:]
    alpha = _leaky(
        np.sum(h[d] * a_dst[None], -1) + np.sum(h[s] * a_src[None], -1)
    )  # [E2, H]
    att_e = np.zeros_like(alpha)
    for i in range(N):
        m = d == i
        ex = np.exp(alpha[m] - alpha[m].max(axis=0, keepdims=True))
        att_e[m] = ex / (ex.sum(axis=0, keepdims=True) + 1e-16)
    want = np.zeros((N, heads, DOUT))
    for idx, (j, i) in enumerate(zip(s, d)):
        want[i] += att_e[idx][:, None] * h[j]
    want = want.reshape(N, heads * DOUT) + np.asarray(params["b"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sage_matches_dense_oracle():
    g = G.build_sage_graph(SRC, DST, N)
    params = C.sage_init(jax.random.PRNGKey(2), DIN, DOUT)
    got = np.asarray(C.sage_apply(params, jnp.asarray(X), g))

    mean_agg = np.zeros((N, DIN))
    for i in range(N):
        m = DST == i
        if m.sum():
            mean_agg[i] = X[SRC[m]].mean(axis=0)
    want = (
        mean_agg @ np.asarray(params["w_rel"])
        + np.asarray(params["b_rel"])
        + X @ np.asarray(params["w_root"])
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ngcf_matches_dense_oracle():
    g = G.build_ngcf_graph(SRC, DST, N)
    params = C.ngcf_init(jax.random.PRNGKey(3), DIN, DOUT)
    got = np.asarray(C.ngcf_apply(params, jnp.asarray(X), g))

    # reference removes self-loops BEFORE the lazy degree computation
    keep = SRC != DST
    s, d = SRC[keep], DST[keep]
    count = np.bincount(s, minlength=N) + np.bincount(d, minlength=N)
    deg = count // 2  # torch 1.5 LongTensor '/' == integer division
    w1, w2 = np.asarray(params["w1"]), np.asarray(params["w2"])
    aggr = np.zeros((N, DOUT))
    for j, i in zip(s, d):
        denom = deg[i] * deg[j]
        coff = 1.0 / np.sqrt(denom) if denom > 0 else 0.0
        aggr[i] += coff * (X[j] @ w1 + (X[i] * X[j]) @ w2)
    want = _leaky(X @ w1 + aggr)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_kgat_kgcn_match_dense_oracle():
    rel = RNG.integers(-3, 4, size=E)
    g = G.build_kg_graph(SRC, DST, rel, N)
    att = RNG.random(g.src.shape[0]).astype(np.float32)
    att[g.num_edges :] = 0.0

    params = C.kgat_init(jax.random.PRNGKey(4), DIN, DOUT)
    got = np.asarray(C.kgat_apply(params, jnp.asarray(X), g, jnp.asarray(att)))

    s = np.asarray(g.src)[: g.num_edges]
    d = np.asarray(g.dst)[: g.num_edges]
    aggr = np.zeros((N, DIN))
    for idx, (j, i) in enumerate(zip(s, d)):
        aggr[i] += att[idx] * X[j]
    w_add, w_bi = np.asarray(params["w_add"]), np.asarray(params["w_bi"])
    want = _leaky((X + aggr) @ w_add) + _leaky((X * aggr) @ w_bi) + np.asarray(params["b"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    params2 = C.kgcn_init(jax.random.PRNGKey(5), DIN, DOUT)
    got2 = np.asarray(C.kgcn_apply(params2, jnp.asarray(X), g, jnp.asarray(att)))
    want2 = np.maximum((aggr + X) @ np.asarray(params2["w"]) + np.asarray(params2["b"]), 0)
    np.testing.assert_allclose(got2, want2, rtol=1e-4, atol=1e-5)


def test_convs_jit_and_grad():
    g = G.build_gcn_graph(SRC, DST, N)
    params = C.gcn_init(jax.random.PRNGKey(6), DIN, DOUT)

    @jax.jit
    def loss(p, x):
        return jnp.sum(C.gcn_apply(p, x, g) ** 2)

    grads = jax.grad(loss)(params, jnp.asarray(X))
    assert np.all(np.isfinite(np.asarray(grads["w"])))
