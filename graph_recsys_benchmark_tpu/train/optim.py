"""Optimizer factory with torch parity (reference utils/general_utils.py:29-37).

torch.optim.Adam(weight_decay=wd) is L2-inside-Adam: grad += wd * param
*before* the moment updates.  The optax equivalent is add_decayed_weights
*before* scale_by_adam — NOT adamw (which decays after).  Defaults match
torch: b1=0.9, b2=0.999, eps=1e-8.
"""

from __future__ import annotations

import optax


def make_optimizer(opt: str = "adam", lr: float = 1e-3, weight_decay: float = 0.0):
    opt = opt.lower()
    if opt == "adam":
        steps = []
        if weight_decay:
            steps.append(optax.add_decayed_weights(weight_decay))
        steps += [optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8), optax.scale(-lr)]
        return optax.chain(*steps)
    if opt == "sparseadam":
        # torch SparseAdam == Adam moments on touched rows only; on TPU the
        # dense update is faster than masking, and with no weight decay the
        # untouched-row moments only differ by bias-correction scaling.
        return optax.chain(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8), optax.scale(-lr))
    if opt == "sgd":
        steps = []
        if weight_decay:
            steps.append(optax.add_decayed_weights(weight_decay))
        steps.append(optax.sgd(lr))
        return optax.chain(*steps)
    raise ValueError(f"unknown optimizer {opt!r}")
