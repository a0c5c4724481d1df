"""Checkpointing: params + optimizer state + metric history, resumable.

Replicates the reference checkpoint semantics (utils/general_utils.py:40-124):
a checkpoint carries {epoch, model_states, optim_states, rec_metrics} where
rec_metrics is the per-epoch HR/NDCG/AUC/loss history, so a resumed run
keeps its max-over-epochs summary (solvers.py:296-300).  Storage is
flax.serialization msgpack for the pytrees + a small npz for the history —
content-addressed layout `<dir>/run_<n>/{latest,epoch_<k>}.ckpt` mirroring
the reference's `run_<n>/{latest,<epoch>}.pkl` (general_utils.py:13-26).
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path, params, opt_state, epoch, rec_metrics):
    """rec_metrics: dict of numpy arrays (per-epoch metric history)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {
        "epoch": int(epoch),
        "params": serialization.to_bytes(params),
        "opt_state": serialization.to_bytes(opt_state),
        "rec_metrics": {k: np.asarray(v) for k, v in rec_metrics.items()},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=4)
    os.replace(tmp, path)  # atomic: a crash never truncates `latest`


def load_checkpoint(path, params_template, opt_state_template):
    """Returns (params, opt_state, last_epoch, rec_metrics); templates give
    the pytree structure (epoch 0 + empty history when no file exists,
    matching general_utils.py:87-104)."""
    if not os.path.isfile(path):
        return params_template, opt_state_template, 0, None
    with open(path, "rb") as f:
        payload = pickle.load(f)
    params = serialization.from_bytes(params_template, payload["params"])
    opt_state = serialization.from_bytes(opt_state_template, payload["opt_state"])
    params = jax.tree_util.tree_map(lambda x: jax.numpy.asarray(x), params)
    opt_state = jax.tree_util.tree_map(lambda x: jax.numpy.asarray(x), opt_state)
    return params, opt_state, payload["epoch"], payload["rec_metrics"]
