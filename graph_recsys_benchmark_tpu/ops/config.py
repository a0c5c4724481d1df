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
# broadcast/gather/scatter pipeline.  Measured slower on v5e at bench scale
# even after the v2 merged window walk (one one-hot per window feeding both
# gather and scatter matmuls): 210.5k vs 268.8k ex/s end-to-end — the
# serial per-chunk dependency chain (stat-broadcast matmul -> window loop
# with VMEM-accumulator RMW) loses to the individually pipelined
# broadcast/gather/scatter kernels despite writing zero [E, *] HBM glue.
# Kept for experimentation and interpret-mode validation.
FLASH_BWD_MEGA = False

# Softmax-shift strategy inside the flash-GAT forward kernel:
#   'bound'  -> per-row precomputed safe shift m̂_i = leakyrelu(a_dst_i +
#               max_j a_src_j).  m̂ is a true upper bound on every logit of
#               row i (addition and leaky_relu are monotone), so
#               exp(act − m̂) ∈ (0, 1] — no overflow ever — and the softmax
#               ratio is mathematically independent of the shift.  Removes
#               the online-max state entirely: per edge chunk the kernel
#               drops a [128, C] masked-select, a [128, C] row-max, the
#               m-regather matmul and the accumulator rescale (~0.4 us of
#               VPU per 1024-edge chunk).  Numerics: underflow only when a
#               row's best logit sits > ~80 BELOW a_dst_i + max(a_src) —
#               logits that spread mean training has already diverged.
#   'online' -> flash-attention-style running row max (the exact per-row
#               max, robust to any logit spread).
# Both shifts cancel exactly in real arithmetic; fp differences are
# O(ulp) (tests pin both against the oracle).  Read at trace time.
FLASH_SOFTMAX_SHIFT = "bound"

# Use the chunk-major backward GLUE kernel (flash_gat._make_bwd_glue_kernel):
# one streaming pass replaces the two dst stat broadcasts, the src re-gather,
# the XLA elementwise glue and the 1-column da_dst segment-sum; only the src
# scatter stays a separate kernel.  Falls back to the composed pipeline when
# the packed + stat tables exceed the single-tile VMEM budget (ML-25M scale).
FLASH_BWD_GLUE = True

# Forward-kernel grid layout for flash-GAT ('chunk' | 'block').  'chunk'
# walks edge chunks with the packed table + output accumulator VMEM-resident
# and ids as auto-pipelined block inputs — no manual DMA waits, no boundary
# chunk duplication, no per-block zero/epilogue (bound-shift softmax only;
# falls back to 'block' when the accumulator exceeds the single-tile VMEM
# budget, e.g. the ML-25M regime).  'block' is the original dst-block grid.
FLASH_FWD_GRID = "chunk"

# Flash-GAT dispatch override (None = heuristic, False = always the 5-op
# composed pipeline, True = force where eligible).  Separate from
# FORCE_PALLAS so scale sweeps can A/B the megakernel without losing the
# segment/gather kernels (tools/bench_25m.py gate sweep).
FLASH_GAT = None

# Batched flash-GAT dispatch override for channel groups sharing one edge
# list at small N (ops/batch_gat.py; None = heuristic — TPU + VMEM fit,
# False = always the per-channel/union paths, True = force where legal).
BATCH_GAT = None

# Locality gate for the one-hot src-side kernels (localized gather and the
# flash-GAT megakernels): their work scales with the mean src-window span
# per edge chunk (StepGraph.src_span, measured at graph build).  Past this
# span the XLA row-gather engine wins — measured on v5e: span~32 at ML-25M
# scale runs the localized [2.2M, 66] bf16 gather at 55 ms vs 7.2 ms for
# plain XLA x[src]; span~1.5-2 at bench scale inverts it 8x the other way.
GATHER_SPAN_MAX = 6.0
