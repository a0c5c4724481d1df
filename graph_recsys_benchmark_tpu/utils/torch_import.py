"""Import the reference's torch checkpoints into this framework.

The reference ships six REAL pre-trained PEA checkpoints under
`experiments/checkpoint/weights/Movielenslatest-small/<MODEL>/BPR/.../run_1/
latest.pkl` (SURVEY.md section 2.3) — torch pickles holding
{'epoch', 'model_states', 'optim_states', 'rec_metrics'}
(reference utils/general_utils.py:40-53).  This module converts the
`model_states['model']` state dict into this framework's PEA parameter
pytree so a reference user can migrate trained weights directly, and
extracts `rec_metrics` — the per-epoch HR/NDCG/AUC history the reference
RECORDED ON THE REAL ml-latest-small DATASET — which is the only real-data
evidence available in this zero-egress environment (the processed-graph
pickle itself was stripped from the reference checkout).

Tensor-layout mapping (PyG 1.5 / torch 1.5 conventions -> ours):
  x                      [N, emb]    -> params['x'][:N] (rows padded to 128)
  att                    [1, C, R]   -> params['att'] (identical)
  GCNConv   .weight      [in, out]   -> w (PyG stores untransposed), .bias -> b
  GATConv   .lin.weight  [out, in]   -> w = weight.T (torch Linear layout)
            .att_i/.att_j [1,H,c]    -> att = concat([att_i, att_j], -1)
                                        (att_i is the DESTINATION half —
                                        PyG 1.5 alpha = (x_i*att_i)+(x_j*att_j))
            .bias        [H*c]       -> b
  SAGEConv  .lin_rel.weight [out,in] -> w_rel = T, .lin_rel.bias -> b_rel
            .lin_root.weight [out,in]-> w_root = T (root path has no bias)
  fc1/fc2   .weight      [out, in]   -> w = weight.T, .bias -> b
"""

from __future__ import annotations

import numpy as np


def load_reference_checkpoint(path):
    """-> (state_dict{name: np.ndarray}, rec_metrics dict, epoch)."""
    import torch

    ck = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.detach().numpy() for k, v in ck["model_states"]["model"].items()}
    hr, ndcg, auc, train_loss, eval_loss = ck["rec_metrics"]
    rec = {
        "HR": np.asarray(hr),
        "NDCG": np.asarray(ndcg),
        "AUC": np.asarray(auc),
        "train_loss": np.asarray(train_loss),
        "eval_loss": np.asarray(eval_loss),
    }
    return sd, rec, int(ck["epoch"])


def convert_pea_state(sd, cfg):
    """Reference PEA state dict -> this framework's params pytree for
    `cfg` (models/pea.pea_init structure; shapes must agree)."""
    n, emb = sd["x"].shape
    assert n == cfg.num_nodes, (n, cfg.num_nodes)
    assert emb == cfg.emb_dim
    x = np.zeros((cfg.emb_rows, emb), np.float32)
    x[:n] = sd["x"]
    params = {"x": x}

    def _prefix(c, k):
        # the shipped checkpoints span two module-naming generations: the
        # current `pea_channels.N.gnn_layers.K` (models/base.py:166) and an
        # older `mpa<conv>_channels.N.<conv>_layers.K` (the non-entity-aware
        # PEAGCN checkpoint was trained before the rename)
        for pre in (
            f"pea_channels.{c}.gnn_layers.{k}.",
            f"mpa{cfg.conv}_channels.{c}.{cfg.conv}_layers.{k}.",
        ):
            if any(name.startswith(pre) for name in sd):
                return pre
        raise KeyError(f"no channel-{c} layer-{k} weights in state dict")

    channels = []
    for c in range(cfg.num_channels):
        layers = []
        for k in range(cfg.meta_path_steps[c]):
            pre = _prefix(c, k)
            if cfg.conv == "gcn":
                layers.append({
                    "w": sd[pre + "weight"].astype(np.float32),
                    "b": sd[pre + "bias"].astype(np.float32),
                })
            elif cfg.conv == "gat":
                att = np.concatenate(
                    [sd[pre + "att_i"], sd[pre + "att_j"]], axis=-1
                ).astype(np.float32)
                layers.append({
                    "w": sd[pre + "lin.weight"].T.astype(np.float32),
                    "att": att,
                    "b": sd[pre + "bias"].astype(np.float32),
                })
            elif cfg.conv == "sage":
                layers.append({
                    "w_rel": sd[pre + "lin_rel.weight"].T.astype(np.float32),
                    "b_rel": sd[pre + "lin_rel.bias"].astype(np.float32),
                    "w_root": sd[pre + "lin_root.weight"].T.astype(np.float32),
                })
            else:
                raise ValueError(cfg.conv)
        channels.append(tuple(layers))
    params["channels"] = tuple(channels)

    if cfg.channel_aggr == "att":
        params["att"] = sd["att"].astype(np.float32)
    params["fc1"] = {
        "w": sd["fc1.weight"].T.astype(np.float32),
        "b": sd["fc1.bias"].astype(np.float32),
    }
    params["fc2"] = {
        "w": sd["fc2.weight"].T.astype(np.float32),
        "b": sd["fc2.bias"].astype(np.float32),
    }
    return params


def import_reference_checkpoint(path, cfg):
    """One-call migration: reference latest.pkl -> (params, rec_metrics)."""
    sd, rec, epoch = load_reference_checkpoint(path)
    return convert_pea_state(sd, cfg), rec, epoch
