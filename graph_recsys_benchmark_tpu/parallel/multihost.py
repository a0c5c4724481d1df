"""Multi-host runtime: process initialization, pod meshes, per-host feeds.

The reference is a single-process, single-GPU program (SURVEY.md section
5.8: no NCCL/MPI/Gloo anywhere); the TPU framework scales over pod slices
where each host owns a subset of the chips.  Three pieces:

  initialize_runtime()  — `jax.distributed.initialize` when launched as one
                          process per host (TPU pod / SLURM / explicit
                          coordinator flags); an idempotent no-op when
                          single-process so every CLI entry point can call
                          it unconditionally.
  make_pod_mesh()       — ('dp','mp') mesh with the data axis laid out
                          DCN-outermost: the host (process) dimension maps
                          onto dp so gradient psum crosses DCN exactly once
                          per step, while mp (the row-sharded embedding's
                          all_to_all axis, parallel/a2a.py) stays inside a
                          host and rides ICI.
  HostBatchFeed         — per-host data feed: every process derives the SAME
                          global epoch permutation from the shared PRNG
                          seed, builds only the rows its dp shard owns, and
                          assembles the global batch with
                          `jax.make_array_from_process_local_data` — no host
                          ever materializes (or ships) another host's rows.

Scaling measurements over the virtual CPU mesh (collective counts + the
step-time-vs-dp curve the ≥80% 1→N-host target is judged by) live in
tools/bench_scaling.py.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_runtime(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Bring up the cross-host runtime; returns True if multi-process.

    Resolution order (first hit wins):
      1. explicit args (CLI flags --dist_coordinator/--dist_nprocs/--dist_rank)
      2. GRB_COORDINATOR / GRB_NUM_PROCESSES / GRB_PROCESS_ID env vars
      3. cloud auto-detection (TPU pod metadata, SLURM) via bare
         `jax.distributed.initialize()` when JAX_COORDINATOR_ADDRESS is set
      4. otherwise: single-process no-op.
    """
    # NOTE: must not touch jax.devices()/process_count() here — any backend
    # query initializes XLA and makes jax.distributed.initialize() illegal.
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return True  # already initialized

    coordinator_address = coordinator_address or os.environ.get("GRB_COORDINATOR")
    if num_processes is None and os.environ.get("GRB_NUM_PROCESSES"):
        num_processes = int(os.environ["GRB_NUM_PROCESSES"])
    if process_id is None and os.environ.get("GRB_PROCESS_ID"):
        process_id = int(os.environ["GRB_PROCESS_ID"])

    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        # TPU pod / SLURM / Cloud auto-detection path
        jax.distributed.initialize()
        return True
    return False


def make_pod_mesh(dp: Optional[int] = None, mp: int = 1, devices=None) -> Mesh:
    """('dp','mp') mesh spanning every process, DCN-outermost on dp.

    Single-process: delegates to the flat local mesh (parallel/mesh.py
    semantics).  Multi-process: the process dimension is folded into dp —
    `jax.devices()` orders devices process-major, so reshaping [n_procs *
    local, ] -> (dp, mp) with mp a divisor of the per-process device count
    keeps every mp (all_to_all) group inside one host (ICI) and makes dp's
    psum the only DCN collective.
    """
    if devices is None:
        devices = jax.devices()
    n_procs = jax.process_count()
    local = len(devices) // max(n_procs, 1)
    if n_procs > 1:
        assert mp <= local and local % mp == 0, (
            f"mp={mp} must divide the per-host device count {local} so the "
            f"embedding all_to_all stays on ICI"
        )
    if dp is None:
        dp = len(devices) // mp
    assert dp * mp <= len(devices), (dp, mp, len(devices))
    arr = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(arr, axis_names=("dp", "mp"))


def process_local_rows(n_rows: int, mesh: Mesh, axis: str = "dp") -> slice:
    """The contiguous slice of a [n_rows, ...] dp-sharded global array whose
    shards live on THIS process's devices."""
    n_shards = int(mesh.shape[axis])
    assert n_rows % n_shards == 0, (n_rows, n_shards)
    per = n_rows // n_shards
    # which dp indices does this process own?
    axis_idx = mesh.axis_names.index(axis)
    mine = sorted(
        idx[axis_idx]
        for idx, d in np.ndenumerate(mesh.devices)
        if d.process_index == jax.process_index()
    )
    if not mine:
        return slice(0, 0)
    lo, hi = mine[0], mine[-1] + 1
    assert mine == list(range(lo, hi)), (
        "dp shards of one process must be contiguous; got " + repr(mine)
    )
    return slice(lo * per, hi * per)


def global_batch(local_np: np.ndarray, mesh: Mesh, spec: P) -> jax.Array:
    """Assemble a global device array from this process's local rows."""
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.ascontiguousarray(local_np)
    )


class HostBatchFeed:
    """Per-host epoch feed for the step-based sharded training paths
    (parallel/spmd.py, parallel/a2a.py).

    All processes construct the identical epoch permutation from the shared
    numpy seed (reference semantics: one global shuffle per epoch,
    solvers.py:195-200), then each process materializes only its dp-slice
    of every batch.  `batches(epoch_seed)` yields
    (global_rows_array, global_mask_array) pairs ready to pass to the
    jitted sharded step.
    """

    def __init__(self, n_rows: int, batch_size: int, mesh: Mesh, axis: str = "dp"):
        self.n_rows = int(n_rows)
        self.batch_size = int(batch_size)
        self.num_batches = -(-self.n_rows // self.batch_size)
        self.mesh = mesh
        self.axis = axis
        self.local = process_local_rows(self.batch_size, mesh, axis)

    def batches(self, epoch_seed: int):
        rng = np.random.default_rng(epoch_seed)
        perm = rng.permutation(self.n_rows).astype(np.int32)
        pad = self.num_batches * self.batch_size - self.n_rows
        perm = np.concatenate([perm, np.zeros(pad, dtype=np.int32)])
        mask = (np.arange(self.num_batches * self.batch_size) < self.n_rows).astype(
            np.float32
        )
        perm = perm.reshape(self.num_batches, self.batch_size)
        mask = mask.reshape(self.num_batches, self.batch_size)
        sl = self.local
        for b in range(self.num_batches):
            rows = global_batch(perm[b, sl], self.mesh, P(self.axis))
            m = global_batch(mask[b, sl], self.mesh, P(self.axis))
            yield rows, m
