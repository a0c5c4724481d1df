"""Sharded PEA training step: dp-sharded batches + row-sharded embedding.

This is the multi-chip analog of the single-chip jitted step in
train/pea_trainer.py.  Sharding layout (SURVEY.md sections 2.5/5.7):

  params['x']      : PartitionSpec('mp', None) — embedding rows sharded
                     over the model axis; XLA all-gathers rows for the
                     full-graph forward and reduce-scatters the gradient.
  other params     : replicated
  batch            : PartitionSpec('dp') — BPR triples split across the
                     data axis; per-device partial losses/grads psum
                     automatically via the replicated-out sharding.
  graphs           : replicated (edge tensors are int tables; the per-edge
                     message work is sharded through the batch/activation
                     shardings XLA propagates).

The step function is the same pure `pea_loss` + optax update, so the
single-chip and multi-chip paths cannot drift apart.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.pea import PEAConfig, pea_loss


def param_shardings(params, mesh: Mesh):
    """Sharding pytree: embedding table row-sharded on mp, rest replicated."""
    rep = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P("mp", None))

    def assign(path, leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if keys and keys[0] == "x":
            return row
        return rep

    return jax.tree_util.tree_map_with_path(assign, params)


def make_sharded_train_step(cfg: PEAConfig, graphs, optimizer, mesh: Mesh):
    """Returns (step_fn, placement) where step_fn(params, opt_state, batch,
    row_mask, key) is jitted over the mesh with the layout above and
    placement(params, opt_state) device_puts a fresh state onto it."""

    def step(params, opt_state, batch, row_mask, key):
        def loss_fn(p):
            return pea_loss(
                p, graphs, cfg, batch, row_mask=row_mask, training=True,
                dropout_key=key if cfg.dropout > 0 else None,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def placement(params, opt_state):
        p_shard = param_shardings(params, mesh)
        # optimizer moments mirror their parameter's sharding
        o_shard = _opt_shardings(opt_state, p_shard, mesh)
        params = jax.device_put(params, p_shard)
        opt_state = jax.device_put(opt_state, o_shard)
        return params, opt_state, p_shard, o_shard

    def jitted(params, opt_state, p_shard, o_shard):
        rep = NamedSharding(mesh, P())
        dp = NamedSharding(mesh, P("dp"))
        dp2 = NamedSharding(mesh, P("dp", None))
        return jax.jit(
            step,
            in_shardings=(p_shard, o_shard, dp2, dp, rep),
            out_shardings=(p_shard, o_shard, rep),
        )

    return step, placement, jitted


def _opt_shardings(opt_state, p_shard, mesh):
    """Give each optimizer-state leaf the sharding of the parameter it
    mirrors, replicating everything else (step counters, scalars).

    A state subtree is a parameter mirror iff its full pytree STRUCTURE
    equals the param tree's (optax's `mu`/`nu`/`trace` fields are literal
    tree_maps of the params) — structural identity, not the fragile
    leaf-count heuristic (round-1 ADVICE/VERDICT: a chain state with a
    coincidentally equal leaf count must not silently inherit shardings).
    """
    rep = NamedSharding(mesh, P())
    flat_p, p_def = jax.tree_util.tree_flatten(p_shard)

    def match(sub):
        try:
            flat_s, s_def = jax.tree_util.tree_flatten(sub)
        except Exception:
            return None
        if s_def == p_def:
            return jax.tree_util.tree_unflatten(s_def, flat_p)
        return None

    def walk(state):
        m = match(state)
        if m is not None:
            return m
        if hasattr(state, "_fields"):  # NamedTuple state
            return type(state)(**{f: walk(getattr(state, f)) for f in state._fields})
        if isinstance(state, (tuple, list)):
            return type(state)(walk(s) for s in state)
        return jax.tree_util.tree_map(lambda _: rep, state)

    return walk(opt_state)
