"""Device mesh construction for SPMD scale-out.

The reference is single-GPU (SURVEY.md section 2.5); the TPU design scales
over a pod slice with two mesh axes:

  dp — data parallel: BPR batch rows (and, transparently, the edge-message
       work inside each conv when XLA propagates shardings) are split across
       devices; gradients all-reduce over ICI.
  mp — model parallel: the node embedding table is row-sharded; convs
       consume the all-gathered table (XLA inserts the collective from the
       sharding annotations).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: int | None = None, mp: int = 1, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if dp is None:
        dp = len(devices) // mp
    assert dp * mp <= len(devices), (dp, mp, len(devices))
    arr = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(arr, axis_names=("dp", "mp"))
