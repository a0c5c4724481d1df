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

# Scatter-accumulator VMEM budgets, in PHYSICAL bytes (f32 rows occupy
# ceil(k/128)*128 lanes under the (8,128) tiling).  A SINGLE tile may use
# up to this much: a constant-index output block is fetched once for the
# whole grid (no double-buffering), so the v5e's ~16 MiB scoped VMEM fits
# it plus the edge-chunk scratch (measured: the 10.7 MB flagship
# accumulator compiles and wins at bench scale).
SCATTER_SINGLE_TILE_LIMIT = 12 * 1024 * 1024

# Per-TILE budget once the table needs MULTIPLE tiles: alternating output
# blocks ARE double-buffered, so each tile must fit twice.
VMEM_TABLE_BUDGET = 6 * 1024 * 1024

# Max scatter row-tiles before falling back to the permuted sorted
# segment-sum.  Each extra tile costs one full pass over the [K, E]
# cotangent chunks.  Measured on v5e: 1 tile wins (bench scale, in the
# flagship number); 6 tiles LOSE 23% to the sorted fallback at the ML-25M
# regime (BENCH_25m.json sweep: 4378 vs 5713 ex/s) — the crossover is
# below 6, so stay conservative until a mid-scale point is measured.
MAX_SCATTER_TILES = 2

# Use the one-pass flash-GAT backward megakernel instead of the composed
# broadcast/gather/scatter pipeline (measured slower on v5e at bench scale;
# kept for experimentation and interpret-mode validation).
FLASH_BWD_MEGA = False

# Flash-GAT dispatch override (None = heuristic, False = always the 5-op
# composed pipeline, True = force where eligible).  Separate from
# FORCE_PALLAS so scale sweeps can A/B the megakernel without losing the
# segment/gather kernels (tools/bench_25m.py gate sweep).
FLASH_GAT = None
