"""Global kernel-backend override for the auto-dispatched ops.

FORCE_PALLAS:
  None  -> per-op heuristics (measured thresholds)
  True  -> always the Pallas TPU kernels
  False -> always the XLA lowering (scatter/gather) — the stock-XLA baseline
           bench.py compares against, and the right setting off-TPU.
Read at trace time; change it before jitting.
"""

FORCE_PALLAS = None

# Message-transport dtype for the edge pipeline ('f32' | 'bf16').  'bf16'
# casts gathered node features / per-edge coefficients to bfloat16 and runs
# the Pallas segment-sum as a native 1-pass bf16 MXU matmul with f32
# accumulation — roughly half the HBM bytes on the gather AND the reduction
# (tools/bench_segsum_variants.py: 5.05x vs XLA at 2M edges, vs 3.46x f32).
# Costs ~3 mantissa bits per message.  Default 'f32' keeps bitwise-level
# parity with the reference math.  Read at trace time.
SEGSUM_TRANSPORT = "f32"


def msg_cast(*arrays):
    """Cast message operands to the configured transport dtype (trace-time)."""
    import jax.numpy as jnp

    if SEGSUM_TRANSPORT == "bf16":
        out = tuple(a.astype(jnp.bfloat16) for a in arrays)
    else:
        out = arrays
    return out if len(out) != 1 else out[0]


def resolve(use_pallas, default):
    if use_pallas is not None:
        return use_pallas
    if FORCE_PALLAS is not None:
        return FORCE_PALLAS
    return default

# Per-TILE VMEM byte budget for the localized scatter-add accumulator
# (~16 MiB VMEM/core on v5e; leave room for edge-chunk blocks).  Node
# tables larger than one tile split into ceil(bytes/budget) row tiles; the
# kernel makes one pass over the edge chunks per tile (each pass re-reads
# the cotangent blocks), clamping every chunk's window span to the tile.
VMEM_TABLE_BUDGET = 6 * 1024 * 1024

# Max scatter row-tiles before falling back to the permuted sorted
# segment-sum.  Each tile costs one extra pass over the [K, E] cotangent
# (~150 B/edge at bf16 transport) — vs the fallback's E->E permutation
# gather measured at 8.5 GB/s, even 16 passes win at the ML-25M regime
# (69k nodes = 6 tiles at the lane-padded 128-col physical row width;
# measured delta in BENCH_25m.json).
MAX_SCATTER_TILES = 16

# Use the one-pass flash-GAT backward megakernel instead of the composed
# broadcast/gather/scatter pipeline (measured slower on v5e at bench scale;
# kept for experimentation and interpret-mode validation).
FLASH_BWD_MEGA = False

# Flash-GAT dispatch override (None = heuristic, False = always the 5-op
# composed pipeline, True = force where eligible).  Separate from
# FORCE_PALLAS so scale sweeps can A/B the megakernel without losing the
# segment/gather kernels (tools/bench_25m.py gate sweep).
FLASH_GAT = None
