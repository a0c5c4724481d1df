"""Parameter initializers matching the reference's torch/PyG initialization.

Quality parity depends on these: the reference initializes the *entire node
embedding table* with PyG `glorot` over (num_nodes, emb_dim)
(models/base.py:156,183), giving a much smaller scale than standard embedding
inits.  Linear layers keep torch's default (kaiming-uniform weight + fan-in
uniform bias) unless the reference explicitly re-initializes the weight with
glorot (models/base.py:186-189).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def glorot(key, shape, dtype=jnp.float32):
    """PyG `torch_geometric.nn.inits.glorot`: U(-a, a) with
    a = sqrt(6 / (shape[-2] + shape[-1]))."""
    a = math.sqrt(6.0 / (shape[-2] + shape[-1]))
    return jax.random.uniform(key, shape, dtype=dtype, minval=-a, maxval=a)


def zeros_init(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype=dtype)


def torch_linear_weight(key, in_dim, out_dim, dtype=jnp.float32):
    """torch.nn.Linear default weight init (kaiming_uniform with a=sqrt(5)),
    stored here already transposed to [in, out] for `x @ w`."""
    bound = math.sqrt(1.0 / in_dim)
    return jax.random.uniform(key, (in_dim, out_dim), dtype=dtype, minval=-bound, maxval=bound)


def torch_linear_bias(key, in_dim, out_dim, dtype=jnp.float32):
    """torch.nn.Linear default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = math.sqrt(1.0 / in_dim)
    return jax.random.uniform(key, (out_dim,), dtype=dtype, minval=-bound, maxval=bound)


def torch_linear_params(key, in_dim, out_dim, glorot_weight=False, dtype=jnp.float32):
    """Linear layer params {w: [in, out], b: [out]}.

    glorot_weight=True replicates the reference pattern of re-initializing
    `.weight` with PyG glorot while leaving the bias at torch default
    (e.g. models/base.py:186-187 for the fc1/fc2 predictor)."""
    kw, kb = jax.random.split(key)
    if glorot_weight:
        w = glorot(kw, (in_dim, out_dim), dtype=dtype)
    else:
        w = torch_linear_weight(kw, in_dim, out_dim, dtype=dtype)
    return {"w": w, "b": torch_linear_bias(kb, in_dim, out_dim, dtype=dtype)}


def linear(params, x):
    return jnp.dot(x, params["w"], preferred_element_type=jnp.float32) + params["b"]
