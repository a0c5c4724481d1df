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

# Use the one-pass flash-GAT backward megakernel instead of the composed
# broadcast/gather/scatter pipeline (measured slower on v5e at bench scale;
# kept for experimentation and interpret-mode validation).
FLASH_BWD_MEGA = False
