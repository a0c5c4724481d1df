"""Capture a device trace of the fused PEAGAT epoch and print the top ops.

Writes the trace under /tmp/jaxtrace and aggregates the perfetto JSON so the
hot ops are visible without TensorBoard."""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from graph_recsys_benchmark_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import importlib

bench = importlib.import_module("bench")


def main():
    trainer, hin = bench.build()
    params, opt_state = trainer.init(seed=2020)
    key = jax.random.PRNGKey(0)
    key, k = jax.random.split(key)
    params, opt_state, loss = trainer.run_epoch(params, opt_state, k)  # compile
    jax.block_until_ready(loss)

    trace_dir = "/tmp/jaxtrace"
    with jax.profiler.trace(trace_dir):
        key, k = jax.random.split(key)
        params, opt_state, loss = trainer.run_epoch(params, opt_state, k)
        jax.block_until_ready(loss)

    files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True))
    if not files:
        print("no perfetto trace found under", trace_dir)
        for f in glob.glob(trace_dir + "/**/*", recursive=True):
            print(" ", f)
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)

    # device-track complete events: aggregate wall time by op name
    durs = defaultdict(float)
    counts = defaultdict(int)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "?")
            durs[name] += ev["dur"]
            counts[name] += 1
    total = sum(durs.values())
    print(f"total traced op-time: {total/1e3:.1f} ms across {len(durs)} op names")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{d/1e3:10.2f} ms  x{counts[name]:<6} {name[:110]}")


if __name__ == "__main__":
    main()
