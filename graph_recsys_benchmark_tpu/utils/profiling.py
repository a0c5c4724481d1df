"""Tracing / profiling helpers (SURVEY.md section 5.1: the reference has
none beyond tqdm + cuda-synchronized wall clocks, solvers.py:158-159).

`trace(dir)` wraps a region in a jax.profiler trace (viewable in
TensorBoard / Perfetto); `StepTimer` gives block_until_ready-bracketed
per-step wall times with named `jax.profiler.TraceAnnotation` regions.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with correct device synchronization.

    with StepTimer() as t:
        out = step(...)
        t.block_on(out)
    t.elapsed  # seconds
    """

    def __init__(self, name: str = "step"):
        self.name = name
        self.elapsed = None

    def __enter__(self):
        self._ann = jax.profiler.TraceAnnotation(self.name)
        self._ann.__enter__()
        self._t0 = time.perf_counter()
        return self

    def block_on(self, value):
        jax.block_until_ready(value)

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        self._ann.__exit__(*exc)
        return False


def timed(fn, *args, iters=10, warmup=1):
    """Compile + measure mean seconds/iteration of a jitted callable."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
