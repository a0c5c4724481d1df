"""Global kernel-backend override for the auto-dispatched ops.

FORCE_PALLAS:
  None  -> per-op heuristics (measured thresholds)
  True  -> always the Pallas TPU kernels
  False -> always the XLA lowering (scatter/gather) — the stock-XLA baseline
           bench.py compares against, and the right setting off-TPU.
Read at trace time; change it before jitting.
"""

FORCE_PALLAS = None


def resolve(use_pallas, default):
    if use_pallas is not None:
        return use_pallas
    if FORCE_PALLAS is not None:
        return FORCE_PALLAS
    return default
