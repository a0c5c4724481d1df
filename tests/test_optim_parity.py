"""Optimizer parity vs torch: our optax chain must reproduce
torch.optim.Adam(weight_decay=wd) — the reference's optimizer
(general_utils.py:29-37) — step for step."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

torch = pytest.importorskip("torch")

from graph_recsys_benchmark_tpu.train.optim import make_optimizer


@pytest.mark.parametrize("wd", [0.0, 1e-3, 1e-2])
def test_adam_matches_torch(wd):
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((5, 3)).astype(np.float32)

    # torch side: quadratic-ish loss grad = w * scale + offset each step
    tw = torch.nn.Parameter(torch.tensor(w0))
    topt = torch.optim.Adam([tw], lr=1e-3, weight_decay=wd)

    params = {"w": jnp.asarray(w0)}
    opt = make_optimizer("adam", 1e-3, wd)
    state = opt.init(params)

    for step in range(5):
        g_np = (w0 * 0 + rng.standard_normal((5, 3))).astype(np.float32)

        topt.zero_grad()
        tw.grad = torch.tensor(g_np)
        topt.step()

        grads = {"w": jnp.asarray(g_np)}
        # torch couples weight decay to the CURRENT param value
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)

        np.testing.assert_allclose(
            np.asarray(params["w"]), tw.detach().numpy(), rtol=2e-5, atol=2e-6,
        ), step


def test_sgd_matches_torch():
    rng = np.random.default_rng(1)
    w0 = rng.standard_normal((4,)).astype(np.float32)
    tw = torch.nn.Parameter(torch.tensor(w0))
    topt = torch.optim.SGD([tw], lr=1e-2, weight_decay=1e-3)
    params = {"w": jnp.asarray(w0)}
    opt = make_optimizer("sgd", 1e-2, 1e-3)
    state = opt.init(params)
    for _ in range(3):
        g = rng.standard_normal(4).astype(np.float32)
        topt.zero_grad()
        tw.grad = torch.tensor(g)
        topt.step()
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_sparse_adam_matches_torch():
    """scale_by_sparse_adam vs torch.optim.SparseAdam on an embedding whose
    gradient touches a different row subset each step (the MetaPath2Vec
    pretraining pattern, metapath2vec_solver_bpr.py:209): untouched rows
    must stay frozen (no dense-Adam momentum tail)."""
    rng = np.random.default_rng(1)
    n, d = 12, 4
    w0 = rng.standard_normal((n, d)).astype(np.float32)

    temb = torch.nn.Embedding(n, d, sparse=True)
    with torch.no_grad():
        temb.weight.copy_(torch.tensor(w0))
    topt = torch.optim.SparseAdam(temb.parameters(), lr=1e-2)

    params = {"emb": jnp.asarray(w0)}
    opt = make_optimizer("sparseadam", 1e-2)
    state = opt.init(params)

    for step in range(6):
        rows = rng.choice(n, size=4, replace=False)
        g_rows = rng.standard_normal((4, d)).astype(np.float32)
        # one row's gradient contains zeros WITHIN a touched row — torch
        # still updates that whole row (it is present in the sparse COO)
        g_rows[0, :2] = 0.0

        topt.zero_grad()
        loss = (temb(torch.tensor(rows)) * torch.tensor(g_rows)).sum()
        loss.backward()
        topt.step()

        g_dense = np.zeros((n, d), np.float32)
        g_dense[rows] = g_rows
        updates, state = opt.update({"emb": jnp.asarray(g_dense)}, state, params)
        params = optax.apply_updates(params, updates)

        np.testing.assert_allclose(
            np.asarray(params["emb"]),
            temb.weight.detach().numpy(),
            rtol=1e-5, atol=1e-6,
            err_msg=f"step {step}",
        )
