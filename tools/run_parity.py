"""One-command quality-parity runner against the reference's published table.

Usage (the moment raw data is available — the pod this framework was built
on has zero egress, so the real-data numbers have never been produced):

    python tools/run_parity.py --raw_dir /data/ml-latest-small --dataset ml-latest-small
    python tools/run_parity.py --raw_dir /data/ml-25m --dataset ml-25m --models PEAGAT* PEAGCN
    python tools/run_parity.py --raw_dir /data/yelp --dataset yelp

Each model runs the FULL published recipe (experiments/scripts/*.ps1 —
ml-small: 5 runs x 30 epochs bs1024 'unseen'; ml-25m: 5x30 bs4096 'random';
yelp: 3x20 bs1024 'random'; seeds 2019+run, solvers.py:123), through the
standard CLI/solver (per-run max over epochs, mean over runs), and the
result is diffed against BASELINE.md (reference images/results.png).
A trailing '*' on a PEA model name = entity-aware variant.

Writes PARITY_RESULTS.md next to --out_dir and prints the table.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (model, entity_aware) -> {dataset: (HR@10, NDCG@10)} — BASELINE.md
BASELINE = {
    "NFM": {"ml-latest-small": (0.4770, 0.2668), "ml-25m": (0.8132, 0.5347), "yelp": (0.8595, 0.6062)},
    "CFKG": {"ml-latest-small": (0.4378, 0.2381), "ml-25m": (0.8152, 0.5196), "yelp": (0.8729, 0.5826)},
    "HeRec": {"ml-latest-small": (0.2668, 0.1449), "ml-25m": (0.6070, 0.3291), "yelp": (0.5533, 0.3302)},
    "MetaPath2Vec": {"ml-latest-small": (0.3063, 0.1614), "ml-25m": (0.7956, 0.5051), "yelp": (0.6307, 0.4020)},
    "NGCF": {"ml-latest-small": (0.5016, 0.2755), "ml-25m": (0.7807, 0.4866), "yelp": (0.8068, 0.4810)},
    "KGCN": {"ml-latest-small": (0.5132, 0.2788), "ml-25m": (0.7771, 0.4699), "yelp": (0.8125, 0.4668)},
    "KGAT": {"ml-latest-small": (0.5214, 0.2846), "ml-25m": (0.8147, 0.5236), "yelp": (0.8762, 0.6136)},
    "PEAGCN": {"ml-latest-small": (0.5382, 0.2951), "ml-25m": (0.8185, 0.5344), "yelp": (0.9041, 0.6379)},
    "PEAGCN*": {"ml-latest-small": (0.5576, 0.3036), "ml-25m": (0.8187, 0.5361), "yelp": (0.9125, 0.6443)},
    "PEAGAT": {"ml-latest-small": (0.5375, 0.2983), "ml-25m": (0.8249, 0.5414), "yelp": (0.9057, 0.6382)},
    "PEAGAT*": {"ml-latest-small": (0.5477, 0.3045), "ml-25m": (0.8284, 0.5475), "yelp": (0.9128, 0.6641)},
    "PEASage": {"ml-latest-small": (0.5444, 0.3003), "ml-25m": (0.8176, 0.5383), "yelp": (0.8772, 0.6247)},
    "PEASage*": {"ml-latest-small": (0.5609, 0.3070), "ml-25m": (0.8273, 0.5462), "yelp": (0.8837, 0.6308)},
}

ALL_MODELS = list(BASELINE.keys())


def run_one(model_spec, dataset, raw_dir, out_dir, extra):
    from graph_recsys_benchmark_tpu.cli import main as cli_main

    entity = model_spec.endswith("*")
    model = model_spec.rstrip("*")
    argv = [
        "--model", model,
        "--dataset", dataset,
        "--out_dir", out_dir,
        "--entity_aware", "true" if entity else "false",
    ] + (["--raw_dir", raw_dir] if raw_dir else []) + extra
    overall = cli_main(argv)
    if overall is None:
        return None
    return float(overall["HR"][5]), float(overall["NDCG"][5])


def main():
    ap = argparse.ArgumentParser("run_parity")
    ap.add_argument("--raw_dir", default=None)
    ap.add_argument("--dataset", required=True,
                    choices=["ml-latest-small", "ml-25m", "yelp",
                             "synthetic-ml", "synthetic-ml25m",
                             "synthetic-yelp"])
    ap.add_argument("--models", nargs="*", default=ALL_MODELS,
                    help="subset, e.g. PEAGAT* PEAGCN (default: all)")
    ap.add_argument("--out_dir", default="parity_runs")
    ap.add_argument("--quick", action="store_true",
                    help="1 run x 5 epochs smoke (NOT comparable; pipeline "
                         "check only)")
    ap.add_argument("extra", nargs=argparse.REMAINDER,
                    help="extra CLI flags after '--'")
    args = ap.parse_args()

    extra = [a for a in args.extra if a != "--"]
    if args.quick:
        extra += ["--runs", "1", "--epochs", "5"]

    if args.dataset.startswith("synthetic") and not args.quick:
        print("note: synthetic data — numbers are a pipeline check, not "
              "comparable to BASELINE.md")
    # synthetic datasets borrow the matching real dataset's reference column
    # purely for table layout (marked not comparable above)
    ref_ds = {
        "synthetic-ml": "ml-latest-small",
        "synthetic-ml25m": "ml-25m",
        "synthetic-yelp": "yelp",
    }.get(args.dataset, args.dataset)
    if not args.dataset.startswith("synthetic") and not args.raw_dir:
        raise SystemExit("--raw_dir is required for real datasets")

    rows = []
    for spec in args.models:
        if spec not in BASELINE:
            raise SystemExit(f"unknown model {spec!r}; choices: {ALL_MODELS}")
        ref = BASELINE[spec].get(ref_ds)
        print(f"=== {spec} on {args.dataset} (ref HR@10 {ref[0]:.4f}) ===",
              flush=True)
        got = run_one(spec, args.dataset, args.raw_dir, args.out_dir, extra)
        if got is None:
            rows.append((spec, ref, None, None))
            continue
        rows.append((spec, ref, got, (got[0] - ref[0], got[1] - ref[1])))
        print(f"--- {spec}: HR@10 {got[0]:.4f} (ref {ref[0]:.4f}, "
              f"d={got[0]-ref[0]:+.4f}), NDCG@10 {got[1]:.4f} "
              f"(ref {ref[1]:.4f}, d={got[1]-ref[1]:+.4f})", flush=True)

    lines = [
        f"# Parity results — {args.dataset}"
        + (" (QUICK smoke, NOT comparable)" if args.quick else ""),
        "",
        "| Model | HR@10 | ref | d | NDCG@10 | ref | d |",
        "|---|---|---|---|---|---|---|",
    ]
    for spec, ref, got, d in rows:
        if got is None:
            lines.append(f"| {spec} | FAILED | {ref[0]:.4f} | | | {ref[1]:.4f} | |")
        else:
            lines.append(
                f"| {spec} | {got[0]:.4f} | {ref[0]:.4f} | {d[0]:+.4f} "
                f"| {got[1]:.4f} | {ref[1]:.4f} | {d[1]:+.4f} |"
            )
    report = "\n".join(lines) + "\n"
    os.makedirs(args.out_dir, exist_ok=True)
    path = os.path.join(args.out_dir, f"PARITY_RESULTS_{args.dataset}.md")
    with open(path, "w") as f:
        f.write(report)
    print(report)
    print("written:", path)


if __name__ == "__main__":
    main()
