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

    # resolve process (plane) names so host dispatch isn't conflated with
    # TensorCore execution; aggregate per device plane only
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev.get("args", {}).get("name", "?")

    device_pids = {
        pid
        for pid, name in pid_names.items()
        if "TPU" in name or "TensorCore" in name or "/device" in name.lower()
    }

    durs = defaultdict(float)
    counts = defaultdict(int)
    plane_tot = defaultdict(float)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            plane = pid_names.get(ev.get("pid"), "?")
            plane_tot[plane] += ev["dur"]
            if ev.get("pid") in device_pids:
                name = ev.get("name", "?")
                durs[name] += ev["dur"]
                counts[name] += 1
    print("planes:")
    for p, d in sorted(plane_tot.items(), key=lambda kv: -kv[1]):
        print(f"  {d/1e3:10.1f} ms  {p}")
    total = sum(durs.values())
    print(f"device op-time: {total/1e3:.1f} ms across {len(durs)} op names")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{d/1e3:10.2f} ms  x{counts[name]:<6} {name[:110]}")


if __name__ == "__main__":
    main()
