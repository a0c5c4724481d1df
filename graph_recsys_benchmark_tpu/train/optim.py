"""Optimizer factory with torch parity (reference utils/general_utils.py:29-37).

torch.optim.Adam(weight_decay=wd) is L2-inside-Adam: grad += wd * param
*before* the moment updates.  The optax equivalent is add_decayed_weights
*before* scale_by_adam — NOT adamw (which decays after).  Defaults match
torch: b1=0.9, b2=0.999, eps=1e-8.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def scale_by_sparse_adam(b1=0.9, b2=0.999, eps=1e-8):
    """torch.optim.SparseAdam semantics on dense gradients.

    torch's SparseAdam updates moments and parameters ONLY at the sparse
    gradient's coordinates (for an Embedding: the touched rows) while the
    bias correction uses the GLOBAL step count (torch sparse_adam.py:
    state['step'] increments every step regardless of coverage).  Dense
    Adam instead keeps moving untouched rows on their momentum tail.  Here
    a row is 'touched' iff any of its gradient entries is nonzero —
    exactly the embedding-row granularity torch sees through the sparse
    COO gradient."""

    def init(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update(grads, state, params=None):
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)

        def upd(g, mu, nu):
            if g.ndim >= 2:
                touched = jnp.any(g != 0, axis=tuple(range(1, g.ndim)),
                                  keepdims=True)
            else:
                touched = g != 0
            mu2 = jnp.where(touched, b1 * mu + (1.0 - b1) * g, mu)
            nu2 = jnp.where(touched, b2 * nu + (1.0 - b2) * g * g, nu)
            step = jnp.where(
                touched, (mu2 / bc1) / (jnp.sqrt(nu2 / bc2) + eps), 0.0
            )
            return step, mu2, nu2

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        out = [upd(g, mu, nu) for g, mu, nu in zip(flat_g, flat_mu, flat_nu)]
        steps = jax.tree_util.tree_unflatten(treedef, [o[0] for o in out])
        mu = jax.tree_util.tree_unflatten(treedef, [o[1] for o in out])
        nu = jax.tree_util.tree_unflatten(treedef, [o[2] for o in out])
        return steps, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(opt: str = "adam", lr: float = 1e-3, weight_decay: float = 0.0):
    opt = opt.lower()
    if opt == "adam":
        steps = []
        if weight_decay:
            steps.append(optax.add_decayed_weights(weight_decay))
        steps += [optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8), optax.scale(-lr)]
        return optax.chain(*steps)
    if opt == "sparseadam":
        # true torch SparseAdam: untouched embedding rows are frozen (no
        # momentum tail), bias correction by global step
        return optax.chain(
            scale_by_sparse_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale(-lr),
        )
    if opt == "sgd":
        steps = []
        if weight_decay:
            steps.append(optax.add_decayed_weights(weight_decay))
        steps.append(optax.sgd(lr))
        return optax.chain(*steps)
    raise ValueError(f"unknown optimizer {opt!r}")
