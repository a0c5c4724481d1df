"""Unified CLI — one entry point for every model and dataset.

Replaces the reference's 9 near-duplicate argparse drivers
(experiments/*_solver_*.py, SURVEY.md section 7.4).  Defaults reproduce the
published recipes (experiments/scripts/*.ps1): ml-small = 5 runs x 30
epochs, bs 1024, 'unseen' sampling; 25m = bs 4096, 'random'; yelp = 3 runs
x 20 epochs, 'random'.

    python -m graph_recsys_benchmark_tpu --model PEAGAT --dataset synthetic-ml
    python -m graph_recsys_benchmark_tpu --model PEAGCN --dataset ml-latest-small \
        --raw_dir /data/ml-latest-small --entity_aware true
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import pickle


def build_parser():
    p = argparse.ArgumentParser("graph_recsys_benchmark_tpu")
    p.add_argument("--model", default="PEAGCN",
                   choices=["PEAGCN", "PEAGAT", "PEASage", "NGCF", "KGAT", "KGCN",
                            "CFKG", "NFM", "MetaPath2Vec", "HeRec"])
    p.add_argument("--dataset", default="synthetic-ml",
                   choices=["synthetic-ml", "synthetic-ml25m", "synthetic-yelp",
                            "ml-latest-small", "ml-25m", "yelp"])
    p.add_argument("--raw_dir", default=None, help="raw data directory for real datasets")
    p.add_argument("--dataset_url", default=None,
                   help="archive URL for --raw_dir auto-download (default: "
                        "the reference's grouplens URL; file:// supported)")
    p.add_argument("--out_dir", default="runs")
    p.add_argument("--num_core", type=int, default=10)
    p.add_argument("--num_feat_core", type=int, default=10)
    p.add_argument("--candidate_mode", default=None, choices=[None, "dense", "rejection"],
                   help="negative-candidate structure: 'dense' padded unseen tables "
                        "(O(U*I)) or 'rejection' seen tables (O(U*K), ml-25m default)")
    p.add_argument("--entity_aware", default="false")
    p.add_argument("--entity_aware_coff", type=float, default=0.1)
    p.add_argument("--emb_dim", type=int, default=64)
    p.add_argument("--hidden_size", type=int, default=64)
    p.add_argument("--repr_dim", type=int, default=16)
    p.add_argument("--num_heads", type=int, default=1)
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--channel_aggr", default="att")
    p.add_argument("--runs", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=1e-3)
    p.add_argument("--opt", default="adam")
    p.add_argument("--num_negative_samples", type=int, default=4)
    p.add_argument("--num_neg_candidates", type=int, default=99)
    p.add_argument("--sampling_strategy", default=None)
    p.add_argument("--init_eval", default="true")
    p.add_argument("--full_ranking", default="false",
                   help="also report full-catalog ranking HR/NDCG at the end "
                        "of each run (north-star extension of the "
                        "99-negative protocol)")
    p.add_argument("--metapath_test", default="false")
    p.add_argument("--save_every_epoch", type=int, default=26)
    p.add_argument("--cache_dir", default=".hin_cache")
    p.add_argument(
        "--message_dtype", default="f32", choices=("f32", "bf16"),
        help="edge message-transport dtype; bf16 halves gather/segment HBM "
        "traffic on TPU (f32 accumulation, ~3 fewer mantissa bits/message)",
    )
    # multi-host runtime (SURVEY.md section 5.8; parallel/multihost.py) —
    # one process per host; also auto-detected from GRB_*/JAX_COORDINATOR_*
    # env vars when the flags are absent
    p.add_argument("--dist_coordinator", default=None,
                   help="host:port of process 0; enables jax.distributed")
    p.add_argument("--dist_nprocs", type=int, default=None)
    p.add_argument("--dist_rank", type=int, default=None)
    # mesh training (parallel/engine.py): epochs/eval/checkpoints run sharded
    # over all visible devices — 'a2a' row-shards the embedding table with
    # all-to-all lookups (north star), 'edge' shards the metapath edge sets
    # (the SP analog), 'dp' shards the batch with a GSPMD row-sharded table
    p.add_argument("--parallel", default="none",
                   choices=["none", "dp", "edge", "a2a"],
                   help="mesh-sharded training for PEA models")
    p.add_argument("--mesh_mp", type=int, default=None,
                   help="model-parallel axis size for --parallel dp "
                        "(row-shards the embedding table; default 2 when "
                        "the device count is even)")
    # walk-stage params (metapath2vec_solver_bpr.py:36-58)
    p.add_argument("--walk_length", type=int, default=100)
    p.add_argument("--context_size", type=int, default=7)
    p.add_argument("--walks_per_node", type=int, default=1000)
    p.add_argument("--rw_negative_samples", type=int, default=5)
    return p


def _bool(s):
    return str(s).lower() == "true"


def _dataset_defaults(name):
    if name in ("ml-25m", "synthetic-ml25m"):
        return dict(runs=5, epochs=30, batch_size=4096, sampling="random")
    if name in ("yelp", "synthetic-yelp"):
        return dict(runs=3, epochs=20, batch_size=1024, sampling="random")
    return dict(runs=5, epochs=30, batch_size=1024, sampling="unseen")


def load_hin(args):
    """Build (or load cached) HINData + metapath edge list for the dataset."""
    from .data import movielens as ML
    from .data import yelp as Y

    key = json.dumps(
        [args.dataset, args.raw_dir, args.num_core, args.num_feat_core,
         getattr(args, "candidate_mode", None)],
        sort_keys=True,
    )
    os.makedirs(args.cache_dir, exist_ok=True)
    cache = os.path.join(
        args.cache_dir, hashlib.sha1(key.encode()).hexdigest()[:16] + ".pkl"
    )
    if os.path.isfile(cache):
        with open(cache, "rb") as f:
            hin = pickle.load(f)
    else:
        hin = _build_hin(args)
        with open(cache, "wb") as f:
            pickle.dump(hin, f, protocol=4)

    if hin.name.startswith("yelp"):
        return hin, Y.yelp_metapath_edges(hin)
    if "25m" in hin.name:
        return hin, ML.ml25m_metapath_edges(hin)
    return hin, ML.mlsmall_metapath_edges(hin)


def _maybe_download(args, required_files):
    """Reference `_download` semantics (datasets/dataset.py:117-123 +
    movielens.py:627-629): when the raw files are missing, fetch the
    dataset archive (default grouplens URL, overridable with
    --dataset_url; file:// works in zero-egress environments) and extract
    it so parse_ml_dir finds reference-identical raw files."""
    from .data.download import DATASET_URLS, ensure_raw_dataset

    url = getattr(args, "dataset_url", None) or DATASET_URLS.get(args.dataset)
    ok = ensure_raw_dataset(args.raw_dir, required_files, url)
    if not ok:
        missing = [
            f for f in required_files
            if not os.path.exists(os.path.join(args.raw_dir, f))
        ]
        hint = (
            f" after extracting {url}" if url else
            " and no --dataset_url was given for this dataset"
        )
        raise FileNotFoundError(
            f"raw dataset files missing under {args.raw_dir!r}{hint}: "
            f"{missing}. Point --raw_dir at the directory that directly "
            "contains these files (conventionally named after the dataset, "
            f"e.g. .../{args.dataset})."
        )


def _build_hin(args):
    from .data import movielens as ML
    from .data import yelp as Y
    from .data import synthetic as S

    nc, nfc = args.num_core, args.num_feat_core
    cm = getattr(args, "candidate_mode", None)

    def _cm(default):
        return {"candidate_mode": cm or default}

    if args.dataset == "synthetic-ml":
        movies, ratings, tagging = S.synthetic_mlsmall_raw(seed=0)
        return ML.build_mlsmall_hin(
            movies, ratings, tagging, min(nc, 3), min(nfc, 2), **_cm("dense")
        )
    if args.dataset == "synthetic-ml25m":
        raw = S.synthetic_ml25m_raw(seed=0)
        return ML.build_ml25m_hin(*raw, min(nc, 3), min(nfc, 2), **_cm("rejection"))
    if args.dataset == "synthetic-yelp":
        b, u, rt = S.synthetic_yelp_raw(seed=0)
        return Y.build_yelp_hin(b, u, rt, num_core=4, **_cm("dense"))
    if args.dataset == "ml-latest-small":
        from .data.ml_raw import parse_ml_dir

        _maybe_download(args, ["movies.csv", "ratings.csv", "tags.csv"])
        movies, ratings, tagging = parse_ml_dir(args.raw_dir)
        return ML.build_mlsmall_hin(
            movies, ratings, tagging, nc, nfc, name="ml-latest-small", **_cm("dense")
        )
    if args.dataset == "ml-25m":
        from .data.ml_raw import parse_ml25m_extras, parse_ml_dir

        _maybe_download(
            args,
            ["movies.csv", "ratings.csv", "tags.csv", "genome-scores.csv"],
        )
        movies, ratings, tagging = parse_ml_dir(args.raw_dir)
        gs, gt = parse_ml25m_extras(args.raw_dir)
        return ML.build_ml25m_hin(
            movies, ratings, tagging, gs, gt, nc, nfc, **_cm("rejection")
        )
    if args.dataset == "yelp":
        from .data.yelp_raw import parse_yelp_dir, preprocess_yelp_raw

        b, u, rv, tp, ck = parse_yelp_dir(args.raw_dir)
        b2, u2, rt = preprocess_yelp_raw(b, u, rv, tp, ck)
        return Y.build_yelp_hin(b2, u2, rt, num_core=nc, **_cm("dense"))
    raise ValueError(args.dataset)


def build_trainer(args, hin, mp_edges):
    from .train.pea_trainer import PEATrainer, TrainConfig

    defaults = _dataset_defaults(args.dataset)
    tcfg = TrainConfig(
        batch_size=args.batch_size or defaults["batch_size"],
        lr=args.lr,
        weight_decay=args.weight_decay,
        opt=args.opt,
        num_negative_samples=args.num_negative_samples,
        num_neg_candidates=args.num_neg_candidates,
        sampling_strategy=args.sampling_strategy or defaults["sampling"],
        epochs=args.epochs or defaults["epochs"],
        runs=args.runs or defaults["runs"],
    )

    model = args.model
    par = getattr(args, "parallel", "none")
    if par != "none":
        pea_ok = model in ("PEAGCN", "PEAGAT", "PEASage")
        kg_ok = model in ("KGAT", "KGCN") and par == "edge"
        if not (pea_ok or kg_ok):
            raise SystemExit(
                f"--parallel {par} supports the PEA family (dp/edge/a2a) and "
                f"KGAT/KGCN (edge); {model} runs single-device (omit --parallel)"
            )
    if model in ("PEAGCN", "PEAGAT", "PEASage"):
        from .models.pea import PEAConfig

        conv = {"PEAGCN": "gcn", "PEAGAT": "gat", "PEASage": "sage"}[model]
        cfg = PEAConfig(
            conv=conv, num_nodes=hin.num_nodes,
            meta_path_steps=(2,) * len(mp_edges),
            emb_dim=args.emb_dim, hidden_size=args.hidden_size,
            repr_dim=args.repr_dim, num_heads=args.num_heads,
            channel_aggr=args.channel_aggr, dropout=args.dropout,
            entity_aware=_bool(args.entity_aware),
            entity_aware_coff=args.entity_aware_coff,
        )
        if getattr(args, "parallel", "none") != "none":
            from .parallel.engine import ShardedPEATrainer
            from .parallel.multihost import make_pod_mesh

            import jax

            n = len(jax.devices())
            if args.parallel == "dp":
                mp = args.mesh_mp or (2 if n % 2 == 0 else 1)
            else:
                mp = 1
            mesh = make_pod_mesh(mp=mp)
            return (
                ShardedPEATrainer(
                    hin, cfg, tcfg, metapath_edges=mp_edges, mesh=mesh,
                    mode=args.parallel,
                ),
                len(mp_edges),
            )
        return PEATrainer(hin, cfg, tcfg, metapath_edges=mp_edges), len(mp_edges)
    if model == "NGCF":
        from .models.ngcf import NGCFConfig
        from .train.baseline_trainers import NGCFTrainer

        cfg = NGCFConfig(
            num_nodes=hin.num_nodes, emb_dim=args.emb_dim,
            hidden_size=args.hidden_size, dropout=args.dropout,
            entity_aware=_bool(args.entity_aware),
            entity_aware_coff=args.entity_aware_coff,
        )
        return NGCFTrainer(hin, cfg, tcfg), 0
    if model in ("KGAT", "KGCN"):
        from .models.kg import KGConfig
        from .train.baseline_trainers import KGTrainer

        cfg = KGConfig(
            variant=model.lower(), num_nodes=hin.num_nodes,
            num_relations=hin.num_edge_types, emb_dim=args.emb_dim,
            hidden_size=args.hidden_size, dropout=args.dropout,
        )
        if par == "edge":
            from .parallel.engine import make_sharded_kg_trainer
            from .parallel.multihost import make_pod_mesh

            return make_sharded_kg_trainer(hin, cfg, tcfg, make_pod_mesh(mp=1)), 0
        return KGTrainer(hin, cfg, tcfg), 0
    if model == "CFKG":
        from .models.cfkg import CFKGConfig
        from .train.baseline_trainers import CFKGTrainer

        cfg = CFKGConfig(
            num_nodes=hin.num_nodes, num_relations=hin.num_edge_types,
            user2item_rel=hin.edge_type_dict["user2item"], emb_dim=args.emb_dim,
        )
        return CFKGTrainer(hin, cfg, tcfg), 0
    if model == "NFM":
        from .models.nfm import NFMConfig
        from .train.baseline_trainers import NFMTrainer

        cfg = NFMConfig(
            num_users=hin.num_users, num_items=hin.num_items,
            emb_dim=args.emb_dim, hidden_size=args.hidden_size,
            dropout=args.dropout if args.dropout else 0.3,
        )
        return NFMTrainer(hin, cfg, tcfg), 0
    if model in ("MetaPath2Vec", "HeRec"):
        from .models.metapath2vec import MP2VConfig
        from .train import walk_trainers as W

        cfg = MP2VConfig(
            embedding_dim=args.emb_dim, walk_length=args.walk_length,
            context_size=args.context_size, walks_per_node=args.walks_per_node,
            num_negative_samples=args.rw_negative_samples,
            start_offset=hin.type_accs[hin.types[0]],
            num_start=hin.num_users, num_nodes=hin.num_nodes,
        )
        yelp = hin.name.startswith("yelp")
        # stage-1 walk embeddings cache one level above the hashed run dirs
        # (keyed by the full stage-1 recipe + seed, walk_trainers.py), like
        # the reference's random_walk_*.pkl (metapath2vec_solver_bpr.py:197)
        rw_cache = os.path.join(args.out_dir, hin.name, args.model)
        if model == "MetaPath2Vec":
            steps = (
                __import__("graph_recsys_benchmark_tpu.data.yelp", fromlist=["YELP_MP2V_STEPS"]).YELP_MP2V_STEPS
                if yelp else W.ML_MP2V_STEPS
            )
            if yelp:
                cfg = MP2VConfig(
                    **{**cfg.__dict__,
                       "start_offset": hin.type_accs["item_reviewcount"],
                       "num_start": hin.num_nodes_dict["item_reviewcount"]},
                )
            return W.MetaPath2VecTrainer(
                hin, cfg, tcfg, relation_steps=steps, cache_dir=rw_cache
            ), 0
        metapaths = (
            __import__("graph_recsys_benchmark_tpu.data.yelp", fromlist=["YELP_HEREC_METAPATHS"]).YELP_HEREC_METAPATHS
            if yelp else W.ML_HEREC_METAPATHS
        )
        return W.HeRecTrainer(
            hin, cfg, tcfg, metapaths=metapaths, cache_dir=rw_cache
        ), 0
    raise ValueError(model)


def main(argv=None):
    args = build_parser().parse_args(argv)
    # must run before anything touches a jax backend
    from .parallel.multihost import initialize_runtime

    initialize_runtime(args.dist_coordinator, args.dist_nprocs, args.dist_rank)
    if args.message_dtype != "f32":
        from .ops import config as ops_config

        ops_config.SEGSUM_TRANSPORT = args.message_dtype
    hin, mp_edges = load_hin(args)
    print(
        f"{hin.name}: {hin.num_nodes} nodes ({hin.num_users} users, "
        f"{hin.num_items} items), {hin.train_pos.shape[0]} train interactions"
    )
    trainer, num_metapaths = build_trainer(args, hin, mp_edges)

    from .train.solver import Solver

    defaults = _dataset_defaults(args.dataset)
    out_dir = os.path.join(
        args.out_dir, hin.name, args.model,
        hashlib.sha1(
            json.dumps(vars(args), sort_keys=True, default=str).encode()
        ).hexdigest()[:12],
    )
    solver = Solver(
        trainer,
        out_dir,
        runs=args.runs or defaults["runs"],
        epochs=args.epochs or defaults["epochs"],
        init_eval=_bool(args.init_eval),
        save_every_epoch=args.save_every_epoch,
        metapath_test=_bool(args.metapath_test) and args.model.startswith("PEA"),
        num_metapaths=num_metapaths,
        full_ranking=_bool(args.full_ranking),
    )
    overall = solver.run()
    if overall:
        print(
            "Overall HR@10: {:.4f}, NDCG@10: {:.4f}, AUC: {:.4f}".format(
                overall["HR"][5], overall["NDCG"][5], float(__import__("numpy").ravel(overall["AUC"])[0])
            )
        )
    return overall


if __name__ == "__main__":
    main()
