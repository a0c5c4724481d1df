"""Loss-formula parity vs literal torch transcriptions of the reference."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from graph_recsys_benchmark_tpu.models.pea import entity_reg_loss, _log_sigmoid


def _torch_entity_reg(x, batch):
    """Literal transcription of models/base.py:50-76."""
    x = torch.tensor(x)
    t = torch.tensor(batch)
    pos_item_entity, neg_item_entity = t[:, 3], t[:, 4]
    pos_user_entity, neg_user_entity = t[:, 6], t[:, 7]
    item_entity_mask, user_entity_mask = t[:, 5], t[:, 8]

    item_pos_reg = ((x[t[:, 1]] - x[pos_item_entity]) * (x[t[:, 1]] - x[pos_item_entity])).sum(dim=-1)
    item_neg_reg = ((x[t[:, 1]] - x[neg_item_entity]) * (x[t[:, 1]] - x[neg_item_entity])).sum(dim=-1)
    user_pos_reg = ((x[t[:, 0]] - x[pos_user_entity]) * (x[t[:, 0]] - x[pos_user_entity])).sum(dim=-1)
    user_neg_reg = ((x[t[:, 0]] - x[neg_user_entity]) * (x[t[:, 0]] - x[neg_user_entity])).sum(dim=-1)

    item_reg_los = -((item_pos_reg - item_neg_reg) * item_entity_mask).sigmoid().log().sum()
    user_reg_los = -((user_pos_reg - user_neg_reg) * user_entity_mask).sigmoid().log().sum()
    return float(item_reg_los + user_reg_los)


def test_entity_reg_matches_reference_formula():
    rng = np.random.default_rng(0)
    n, b, d = 30, 16, 6
    x = rng.standard_normal((n, d)).astype(np.float32) * 0.3
    batch = np.zeros((b, 9), dtype=np.int64)
    batch[:, 0] = rng.integers(0, 10, b)          # user
    batch[:, 1] = rng.integers(10, 20, b)         # pos item
    batch[:, 2] = rng.integers(10, 20, b)         # neg item
    batch[:, 3] = rng.integers(20, 30, b)         # pos item entity
    batch[:, 4] = rng.integers(20, 30, b)         # neg item entity
    batch[:, 5] = rng.integers(0, 2, b)           # item mask
    batch[:, 6] = rng.integers(20, 30, b)         # pos user entity
    batch[:, 7] = rng.integers(20, 30, b)         # neg user entity
    batch[:, 8] = rng.integers(0, 2, b)           # user mask

    got = float(
        entity_reg_loss(jnp.asarray(x), jnp.asarray(batch), jnp.ones(b, dtype=jnp.float32))
    )
    want = _torch_entity_reg(x, batch)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bpr_sum_matches_reference_formula():
    rng = np.random.default_rng(1)
    pos = rng.standard_normal(32).astype(np.float32)
    neg = rng.standard_normal(32).astype(np.float32)
    # reference: -(pos - neg).sigmoid().log().sum() (base.py:48)
    want = float(-(torch.tensor(pos) - torch.tensor(neg)).sigmoid().log().sum())
    got = float(jnp.sum(-_log_sigmoid(jnp.asarray(pos) - jnp.asarray(neg))))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def _eval_stack(pos_scores, neg_scores, u):
    """The reference's per-user eval stack: [pos_pred[:1], neg_pred]."""
    pos = torch.tensor(pos_scores[u : u + 1])
    neg = torch.tensor(neg_scores[u])
    pred = torch.cat([pos, neg])
    label = torch.cat([torch.ones_like(pos), torch.zeros_like(neg)])
    return pred, label


def test_eval_loss_forms_match_reference_models():
    """eval_loss_per_user vs literal MFRecsysModel.loss (BCE, base.py:111-123)
    and NFM/HeRec MSELoss eval branches (nfm.py:21-33)."""
    from graph_recsys_benchmark_tpu.eval.ranking import eval_loss_per_user

    rng = np.random.default_rng(2)
    u, c = 8, 99
    pos = rng.standard_normal(u).astype(np.float32)
    neg = rng.standard_normal((u, c)).astype(np.float32)

    got_bce = np.asarray(eval_loss_per_user(jnp.asarray(pos), jnp.asarray(neg), "bce"))
    got_mse = np.asarray(eval_loss_per_user(jnp.asarray(pos), jnp.asarray(neg), "mse"))
    got_zero = np.asarray(eval_loss_per_user(jnp.asarray(pos), jnp.asarray(neg), "zero"))

    for i in range(u):
        pred, label = _eval_stack(pos, neg, i)
        want_bce = float(torch.nn.BCEWithLogitsLoss()(pred, label))
        want_mse = float(torch.nn.MSELoss()(pred, label))
        np.testing.assert_allclose(got_bce[i], want_bce, rtol=1e-5)
        np.testing.assert_allclose(got_mse[i], want_mse, rtol=1e-5)
    np.testing.assert_array_equal(got_zero, np.zeros(u, dtype=np.float32))
