"""Job entry point — the `ray job submit` surface of the north rule
(the analogue of the reference's sbatch scripts, scripts/*.sbatch).

    ray job submit -- python -m halvesting_geometric_ray.cli build \
        --pages /data/pages --workdir /data/graph
    ray job submit -- python -m halvesting_geometric_ray.cli pagerank \
        --workdir /data/graph
    python -m halvesting_geometric_ray.cli all --pages ... --workdir ...

Owns the Ray session (auto-connects inside a job via RAY_ADDRESS; falls
back to a local session) and shuts it down on exit.  All state lives in
the workdir: graph layers, CSR shards, per-iteration checkpoints —
re-running any subcommand resumes from what is durable.
"""

from __future__ import annotations

import argparse
import json
import sys


def _session():
    import os

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True,
                  "logging_level": "ERROR"}
        if os.environ.get("RAY_ADDRESS", "local") == "local":
            kwargs["address"] = "local"
        ray.init(**kwargs)
    rd.DataContext.get_current().enable_progress_bars = False
    from .ops._util import tune_block_sizing
    tune_block_sizing()
    return ray


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="halvesting_geometric_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--workdir", required=True)
        sp.add_argument("--num-parts", type=int, default=0)
        # S7: YAML/JSON engine-config file (reference build_metadata.py:84-87
        # + configs/); --num-parts wins over the file value
        sp.add_argument("--config", default=None)

    sp = sub.add_parser("build", help="pages parquet -> graph layers")
    sp.add_argument("--pages", required=True)
    common(sp)

    for name in ("pagerank", "cc", "labelprop", "triangles", "hits",
                 "anf", "walks", "bowtie", "betweenness", "scc",
                 "coreness", "ktruss", "mis", "matching", "coloring",
                 "densest",
                 "sssp", "katz", "eigenvector", "louvain", "node2vec",
                 "localcluster",
                 "embed", "linkpred", "propagate", "salsa", "simrank",
                 "partition", "hdrf", "wl", "triads", "cliques4",
                 "scan", "redirects", "spectral", "backbone",
                 "triangles-apx", "bridges", "summary"):
        sp = sub.add_parser(name)
        common(sp)
        if name == "anf":
            sp.add_argument("--p-bits", type=int, default=7)
            sp.add_argument("--seed", type=int, default=42)
        if name == "walks":
            sp.add_argument("--walk-len", type=int, default=10)
            sp.add_argument("--seed", type=int, default=42)
            sp.add_argument("--restart-prob", type=float, default=0.0)
            sp.add_argument("--walks-per-vertex", type=int, default=1)
        if name == "bowtie":
            sp.add_argument("--pivot", type=int, default=None)
        if name == "betweenness":
            sp.add_argument("--n-samples", type=int, default=None,
                            help="sampled Brandes-Pich estimate; "
                                 "default = exact (all sources)")
            sp.add_argument("--seed", type=int, default=42)
            sp.add_argument("--batch-k", type=int, default=32)
        if name == "pagerank":
            sp.add_argument("--damping", type=float, default=None)
            sp.add_argument("--tol", type=float, default=None)
            sp.add_argument("--max-iters", type=int, default=None)
            sp.add_argument("--checkpoint-interval", type=int, default=1)
            sp.add_argument("--weighted", action="store_true",
                            help="anchor-multiplicity edge weights "
                                 "(weighted_edges -> weight_col='w')")
        if name == "labelprop":
            sp.add_argument("--rounds", type=int, default=5)
        if name == "ktruss":
            sp.add_argument("--k", type=int, default=3)
        if name in ("mis", "matching", "coloring"):
            sp.add_argument("--seed", type=int, default=42)
        if name == "wl":
            sp.add_argument("--max-rounds", type=int, default=20)
        if name == "scan":
            sp.add_argument("--eps", type=float, default=0.5)
            sp.add_argument("--mu", type=int, default=3)
        if name == "redirects":
            sp.add_argument("--rounds", type=int, default=5,
                            help="squarings; hop bound = 2^rounds")
        if name == "spectral":
            sp.add_argument("--k", type=int, default=8)
            sp.add_argument("--tol", type=float, default=1e-8)
            sp.add_argument("--max-iters", type=int, default=100)
            sp.add_argument("--seed", type=int, default=42)
            sp.add_argument("--clusters", type=int, default=0,
                            help="also run spectral k-means with this "
                                 "many clusters (0 = embedding only)")
        if name == "backbone":
            sp.add_argument("--alpha", type=float, default=0.05)
            sp.add_argument("--mode", default="undirected",
                            choices=["directed", "undirected"])
        if name == "triangles-apx":
            sp.add_argument("--k-samples", type=int, default=100_000)
            sp.add_argument("--seed", type=int, default=42)
        if name == "densest":
            sp.add_argument("--eps", type=float, default=0.1)
        if name == "sssp":
            sp.add_argument("--sources", default="0",
                            help="comma-separated source vids")
            sp.add_argument("--weighted", action="store_true",
                            help="anchor-multiplicity 1/w edge weights "
                                 "(default: unit weights)")
        if name == "katz":
            sp.add_argument("--alpha", type=float, default=0.05)
            sp.add_argument("--beta", type=float, default=1.0)
            sp.add_argument("--tol", type=float, default=1e-9)
            sp.add_argument("--normalize", action="store_true")
        if name == "eigenvector":
            sp.add_argument("--tol", type=float, default=1e-9)
            sp.add_argument("--max-iters", type=int, default=None)
        if name == "louvain":
            sp.add_argument("--resolution", type=float, default=1.0)
            sp.add_argument("--max-levels", type=int, default=6)
            sp.add_argument("--seed", type=int, default=42)
            sp.add_argument("--refine", action="store_true",
                            help="Leiden connectivity refinement: split "
                                 "disconnected communities (graph/leiden)")
        if name == "node2vec":
            sp.add_argument("--p", type=float, default=1.0)
            sp.add_argument("--q", type=float, default=1.0)
            sp.add_argument("--walk-len", type=int, default=10)
            sp.add_argument("--walks-per-vertex", type=int, default=1)
            sp.add_argument("--seed", type=int, default=42)
        if name == "embed":
            sp.add_argument("--p", type=float, default=1.0)
            sp.add_argument("--q", type=float, default=1.0)
            sp.add_argument("--walk-len", type=int, default=10)
            sp.add_argument("--walks-per-vertex", type=int, default=1)
            sp.add_argument("--window", type=int, default=2)
            sp.add_argument("--dim", type=int, default=32)
            sp.add_argument("--negatives", type=int, default=5)
            sp.add_argument("--epochs", type=int, default=3)
            sp.add_argument("--lr", type=float, default=0.025)
            sp.add_argument("--seed", type=int, default=42)
        if name == "linkpred":
            sp.add_argument("--test-frac", type=float, default=0.2)
            sp.add_argument("--neg-ratio", type=float, default=2.0)
            sp.add_argument("--dim", type=int, default=32)
            sp.add_argument("--negatives", type=int, default=5)
            sp.add_argument("--epochs", type=int, default=4)
            sp.add_argument("--lr", type=float, default=0.1)
            sp.add_argument("--walk-len", type=int, default=10)
            sp.add_argument("--walks-per-vertex", type=int, default=2)
            sp.add_argument("--window", type=int, default=2)
            sp.add_argument("--seed", type=int, default=17)
        if name == "propagate":
            sp.add_argument("--rounds", type=int, default=2)
            sp.add_argument("--alpha", type=float, default=0.15)
            sp.add_argument("--agg", choices=("mean", "rw"),
                            default="rw")
        if name == "localcluster":
            sp.add_argument("--seed-vid", type=int, required=True)
            sp.add_argument("--alpha", type=float, default=0.15)
            sp.add_argument("--eps", type=float, default=1e-6)
        if name == "partition":
            sp.add_argument("--k", type=int, default=8)
            sp.add_argument("--eps", type=float, default=0.1)
            sp.add_argument("--chunk", type=int, default=4096)
            sp.add_argument("--relabel", action="store_true",
                            help="also write block-major relabeled "
                                 "vertex/edge layers + offsets")
            sp.add_argument("--multilevel", type=int, default=0,
                            metavar="LEVELS",
                            help="match/contract LEVELS times, "
                                 "weighted LDG on the coarse graph, "
                                 "project + refine (0 = flat LDG)")
            sp.add_argument("--seed", type=int, default=42)
        if name == "hdrf":
            sp.add_argument("--k", type=int, default=8)
            sp.add_argument("--lam", type=float, default=1.1)
            sp.add_argument("--eps", type=float, default=0.1)
            sp.add_argument("--chunk", type=int, default=8192)
        if name == "simrank":
            sp.add_argument("--seeds", default=None,
                            help="comma-separated seed vids; default = "
                                 "--top-k highest-out-degree vertices")
            sp.add_argument("--top-k", type=int, default=32)
            sp.add_argument("--c", type=float, default=0.6)
            sp.add_argument("--walk-len", type=int, default=12)
            sp.add_argument("--walks-per-seed", type=int, default=128)
            sp.add_argument("--seed", type=int, default=42)

    sp = sub.add_parser("all", help="build + pagerank + cc + triangles")
    sp.add_argument("--pages", required=True)
    common(sp)

    sp = sub.add_parser("profile", help="one-pass dataset profile: "
                        "row count + per-column nulls/min/max")
    sp.add_argument("--table", required=True, help="parquet path")
    sp.add_argument("--cols", required=True,
                    help="comma-separated column names")

    sp = sub.add_parser("validate", help="data-contract validation: "
                        "run a YAML/JSON rule list against a parquet "
                        "table; exit 1 on violations")
    sp.add_argument("--table", required=True, help="parquet path")
    sp.add_argument("--rules", required=True,
                    help="YAML/JSON file: list of rule arrays, e.g. "
                         "[[not_null, col], [in_range, col, 0, 1], "
                         "[foreign_key, col, ref.parquet, ref_col]]")
    sp.add_argument("--strict", action="store_true",
                    help="exit non-zero when any rule fails")

    sp = sub.add_parser("encode", help="build a frequency vocab and "
                        "encode (doc_id, text) parquet to int32 id lists")
    sp.add_argument("--docs", required=True)
    sp.add_argument("--out", required=True,
                    help="output dir (ids/ + vocab.parquet)")
    sp.add_argument("--vocab-size", type=int, default=65536)

    sp = sub.add_parser("pack", help="pack encoded docs into fixed-"
                        "length training sequences (manifest + ids)")
    sp.add_argument("--docs", required=True,
                    help="(doc_id, text) parquet — token counts")
    sp.add_argument("--enc", required=True,
                    help="encode output dir (ids/ layer)")
    sp.add_argument("--out", required=True)
    sp.add_argument("--seq-len", type=int, default=2048)
    sp.add_argument("--pad-id", type=int, default=None)

    sp = sub.add_parser("semdedup", help="SemDeDup: k-means blocking + "
                        "within-cluster cosine dup groups over an "
                        "embeddings parquet; writes (vec_id, keeper)")
    sp.add_argument("--embeddings", required=True,
                    help="parquet with (vec_id, embedding)")
    sp.add_argument("--out", required=True)
    sp.add_argument("--k", type=int, default=64)
    sp.add_argument("--threshold", type=float, default=0.9)

    sp = sub.add_parser("curate", help="corpus curation: normalize -> "
                        "filter -> pii scrub -> exact dedup [-> neardup] "
                        "-> hive-partitioned parquet")
    sp.add_argument("--docs", required=True,
                    help="parquet with (doc_id, text)")
    sp.add_argument("--out", required=True)
    sp.add_argument("--langs", default=None,
                    help="comma-separated predicted-language allowlist")
    sp.add_argument("--neardup", action="store_true")
    sp.add_argument("--stats", action="store_true")
    common(sp)

    sp = sub.add_parser("index", help="build a BM25 inverted index "
                        "(hive-partitioned postings by term-hash bucket)")
    sp.add_argument("--docs", required=True,
                    help="parquet with (doc_id, text)")
    sp.add_argument("--out", required=True)
    sp.add_argument("--num-buckets", type=int, default=64)

    sp = sub.add_parser("search", help="BM25 top-k from a built index "
                        "(reads only the query terms' buckets)")
    sp.add_argument("--index", required=True)
    sp.add_argument("--query", required=True,
                    help="space-separated query terms")
    sp.add_argument("--k", type=int, default=10)

    sp = sub.add_parser("ann-build", help="build a disk-backed IVF "
                        "vector index (hive-partitioned inverted "
                        "lists; --pq-m stores uint8 PQ codes)")
    sp.add_argument("--embeddings", required=True,
                    help="parquet with (vec_id, embedding)")
    sp.add_argument("--out", required=True)
    sp.add_argument("--n-lists", type=int, default=64)
    sp.add_argument("--pq-m", type=int, default=None)
    sp.add_argument("--force", action="store_true")

    sp = sub.add_parser("ann-search", help="top-k cosine from a built "
                        "IVF index (reads only the probed lists)")
    sp.add_argument("--index", required=True)
    sp.add_argument("--queries", required=True,
                    help="parquet with (vec_id, embedding) query rows")
    sp.add_argument("--k", type=int, default=10)
    sp.add_argument("--nprobe", type=int, default=8)

    args = p.parse_args(argv)
    ray = _session()
    try:
        import ray.data as rd

        from .config import DEFAULT, EngineConfig, config_from_file
        from .graph.build import build_graph, symmetrize

        if args.cmd == "encode":  # no --workdir/--config args
            import os as _os

            import pyarrow.parquet as _pq

            from .functions.encode import build_vocab, encode_docs

            docs = rd.read_parquet(args.docs, columns=["doc_id", "text"])
            vocab, ref = build_vocab(docs, vocab_size=args.vocab_size)
            _os.makedirs(args.out, exist_ok=True)
            _pq.write_table(vocab, _os.path.join(args.out,
                                                 "vocab.parquet"))
            enc = encode_docs(docs, ref)
            enc.write_parquet(_os.path.join(args.out, "ids"),
                              compression="zstd")
            print(json.dumps({"vocab_size": vocab.num_rows,
                              "out": args.out}))
            return 0
        if args.cmd == "pack":  # no --workdir/--config args
            import os as _os

            from .functions.pack import (materialize_sequences,
                                         pack_sequences)

            docs = rd.read_parquet(args.docs, columns=["doc_id", "text"])
            enc = rd.read_parquet(_os.path.join(args.enc, "ids"))
            manifest = pack_sequences(docs, seq_len=args.seq_len)
            seqs = materialize_sequences(
                manifest, enc,
                pad_id=args.pad_id,
                seq_len=args.seq_len if args.pad_id is not None else None)
            seqs.write_parquet(_os.path.join(args.out, "sequences"),
                               compression="zstd")
            n = rd.read_parquet(
                _os.path.join(args.out, "sequences")).count()
            print(json.dumps({"sequences": int(n), "seq_len": args.seq_len,
                              "out": args.out}))
            return 0
        if args.cmd == "profile":  # no --workdir/--config args
            from .ops.profile import profile

            ds = rd.read_parquet(args.table)
            res = profile(ds, args.cols.split(",")).take_all()[0]
            print(json.dumps({k: (str(v) if not isinstance(
                v, (int, float, type(None))) else v)
                for k, v in res.items()}))
            return 0

        if args.cmd == "validate":  # no --workdir/--config args
            from .config import load_config_file
            from .ops.validate import validate

            raw = load_config_file(args.rules)
            rules = []
            for r in (raw if isinstance(raw, list) else raw["rules"]):
                r = list(r)
                if r[0] == "foreign_key":  # ref table path -> Dataset
                    r[2] = rd.read_parquet(r[2])
                rules.append(tuple(r))
            res = validate(rd.read_parquet(args.table),
                           rules).to_pandas()
            print(json.dumps({"validate": res.to_dict("records")}))
            return 0 if (not args.strict or bool(res.ok.all())) else 1

        if args.cmd == "semdedup":  # no --workdir/--config args
            import pyarrow.compute as pc

            from .functions.clustering import semantic_dedup

            emb = rd.read_parquet(args.embeddings,
                                  columns=["vec_id", "embedding"])
            res = semantic_dedup(emb, k=args.k,
                                 threshold=args.threshold).materialize()
            res.write_parquet(args.out)
            n = res.count()
            survivors = res.map_batches(
                lambda b: {"n": [int(pc.sum(pc.equal(
                    b.column("vec_id"), b.column("keeper"))).as_py() or 0)]},
                batch_format="pyarrow").sum("n")
            print(json.dumps({"rows": int(n), "survivors": int(survivors),
                              "dropped": int(n - survivors)}))
            return 0

        if args.cmd == "index":
            from .functions.search import build_index

            ds = rd.read_parquet(args.docs, columns=["doc_id", "text"])
            meta = build_index(ds, args.out,
                               num_buckets=args.num_buckets)
            print(json.dumps({"index": meta}))
            return 0
        if args.cmd == "ann-build":
            from .functions.ann import ivf_build

            ds = rd.read_parquet(args.embeddings)
            meta = ivf_build(ds, args.out, n_lists=args.n_lists,
                             pq_m=args.pq_m, force=args.force)
            print(json.dumps({"ann_index": meta}))
            return 0
        if args.cmd == "ann-search":
            import pyarrow.parquet as _pq

            from .functions.ann import ivf_search

            qt = _pq.read_table(args.queries)
            out = ivf_search(args.index, qt, k=args.k,
                             nprobe=args.nprobe).to_pandas()
            print(json.dumps({"ann_search": {
                "hits": [{"query_id": int(r.query_id),
                          "neighbor_id": int(r.neighbor_id),
                          "rnk": int(r.rnk)}
                         for r in out.itertuples()]}}))
            return 0
        if args.cmd == "search":
            from .functions.search import query_index

            top, sinfo = query_index(args.index, args.query.split(),
                                     k=args.k)
            print(json.dumps({"search": {
                "buckets_read": sinfo["buckets_read"],
                "hits": [{"doc_id": int(r.doc_id),
                          "score": round(float(r.score), 6)}
                         for r in top.itertuples()]}}))
            return 0

        if args.config:
            over = {"num_parts": args.num_parts} if args.num_parts else {}
            cfg = config_from_file(args.config, **over)
        elif args.num_parts:
            cfg = EngineConfig(num_parts=args.num_parts)
        else:
            cfg = DEFAULT

        def load_graph():
            from .graph.build import GraphLayers
            import os

            meta = json.load(open(os.path.join(args.workdir, "_META.json")))
            layers = {k: os.path.join(args.workdir, k)
                      for k in ("extracted", "vertices", "edges")}
            return GraphLayers(args.workdir, layers["extracted"],
                               layers["vertices"], layers["edges"], meta)

        out = {}
        if args.cmd == "curate":
            from .pipelines.curation import curate_corpus

            ds = rd.read_parquet(args.docs, columns=["doc_id", "text"])
            _, info = curate_corpus(
                ds, langs=args.langs.split(",") if args.langs else None,
                neardup=args.neardup, workdir=args.workdir,
                out_path=args.out, collect_stats=args.stats)
            print(json.dumps(info))
            return 0
        if args.cmd in ("build", "all"):
            g = build_graph(args.pages, args.workdir, cfg)
            out["build"] = g.meta
        else:
            g = load_graph()

        from .graph.build import read_layer
        edges = read_layer(g.edges)
        if args.cmd in ("pagerank", "all"):
            from .graph.pagerank import pagerank

            kw = {}
            pr_edges = edges
            if args.cmd == "pagerank":
                kw = {"damping": args.damping, "tol": args.tol,
                      "max_iters": args.max_iters,
                      "checkpoint_interval": args.checkpoint_interval}
                if args.weighted:
                    from .graph.build import weighted_edges

                    pr_edges = weighted_edges(g, cfg)
                    kw.update(weight_col="w", job="pagerank_w")
            _, info = pagerank(pr_edges, g.offsets, args.workdir, cfg, **kw)
            out["pagerank"] = {k: v for k, v in info.items() if k != "iters"}
        if args.cmd in ("cc", "all"):
            from .graph.components import connected_components

            _, info = connected_components(symmetrize(edges, cfg, dedup=False), g.offsets,
                                           args.workdir, cfg)
            out["cc"] = {k: v for k, v in info.items() if k != "iters"}
        if args.cmd == "labelprop":
            from .graph.labelprop import label_propagation

            _, info = label_propagation(
                symmetrize(edges, cfg, drop_self_loops=True, dedup=False), g.offsets,
                args.workdir, cfg, rounds=args.rounds)
            out["labelprop"] = {k: v for k, v in info.items() if k != "iters"}
        if args.cmd == "hits":
            from .graph.hits import hits as run_hits

            ds, info = run_hits(edges, g.offsets,
                                workdir=args.workdir)
            import os

            ds.write_parquet(os.path.join(args.workdir, "hits_scores"))
            out["hits"] = {"num_iters": info["num_iters"],
                           "converged": info["converged"]}
        if args.cmd == "salsa":
            import os

            from .graph.salsa import salsa as run_salsa

            ds, info = run_salsa(edges, g.offsets, args.workdir, cfg)
            ds.write_parquet(os.path.join(args.workdir, "salsa_scores"))
            out["salsa"] = {"n": info["n"],
                            "cc_iters": info["cc_iters"],
                            "total_authority": info["total_authority"],
                            "total_hub": info["total_hub"]}
        if args.cmd == "partition":
            import os

            import numpy as np

            from .graph.build import symmetrize
            from .graph.partition import (ldg_partition, partition_cut,
                                          relabel_by_blocks)

            sym = symmetrize(edges, drop_self_loops=True, dedup=False)
            if args.multilevel > 0:
                from .graph.multilevel import multilevel_partition

                blocks, pinfo = multilevel_partition(
                    sym, g.offsets, args.workdir, cfg, k=args.k,
                    eps=args.eps, chunk=args.chunk,
                    levels=args.multilevel, seed=args.seed)
            else:
                blocks, pinfo = ldg_partition(
                    sym, g.offsets, args.workdir, cfg, k=args.k,
                    eps=args.eps, chunk=args.chunk)
            blocks = blocks.materialize()
            blocks.write_parquet(os.path.join(args.workdir, "blocks"))
            cut = partition_cut(edges, blocks,
                                num_parts=cfg.num_parts)
            out["partition"] = {**pinfo, **cut}
            if args.relabel:
                verts = read_layer(g.vertices,
                                   columns=["url", "vid"])
                v2, e2, off2 = relabel_by_blocks(
                    verts, edges, blocks, args.k,
                    num_parts=cfg.num_parts)
                v2.write_parquet(os.path.join(args.workdir,
                                              "vertices_bm"))
                e2.write_parquet(os.path.join(args.workdir,
                                              "edges_bm"))
                out["partition"]["offsets_bm"] = off2.tolist()
        if args.cmd == "hdrf":
            import os

            from .graph.edgepartition import hdrf_partition

            eb, hinfo = hdrf_partition(edges, g.offsets, args.workdir,
                                       cfg, k=args.k, lam=args.lam,
                                       eps=args.eps, chunk=args.chunk)
            eb.write_parquet(os.path.join(args.workdir, "edge_blocks"))
            out["hdrf"] = {kk: hinfo[kk] for kk in
                           ("k", "lam", "sizes", "replication_factor",
                            "n_edges", "max_over_avg", "n_chunks")}
        if args.cmd == "simrank":
            import os

            import numpy as np

            from .graph.simrank import simrank_mc
            from .ops.agg import grouped_aggregate

            if args.seeds:
                seeds = np.array([int(x) for x in args.seeds.split(",")],
                                 dtype=np.int64)
            else:
                deg = grouped_aggregate(
                    edges.select_columns(["src"]), ["src"],
                    {"deg": ("count", None)}, num_parts=cfg.num_parts)
                seeds = (deg.sort(["deg", "src"],
                                  descending=[True, False])
                         .limit(args.top_k).to_pandas()["src"].to_numpy())
            sim, info = simrank_mc(edges, g.offsets, args.workdir, seeds,
                                   cfg, c=args.c, walk_len=args.walk_len,
                                   walks_per_seed=args.walks_per_seed,
                                   seed=args.seed)
            sim.to_parquet(os.path.join(args.workdir, "simrank.parquet"))
            out["simrank"] = {"n_seeds": info["n_seeds"],
                              "pairs": int(len(sim))}
        if args.cmd == "katz":
            from .graph.katz import katz as run_katz
            import os

            ds, info = run_katz(edges, g.offsets, args.workdir, cfg,
                                alpha=args.alpha, beta=args.beta,
                                tol=args.tol, normalize=args.normalize)
            ds.write_parquet(os.path.join(args.workdir, "katz_scores"))
            out["katz"] = {"num_iters": info["num_iters"],
                           "converged": info["converged"]}
        if args.cmd == "eigenvector":
            from .graph.eigenvector import eigenvector_centrality
            import os

            kw = {}
            if args.max_iters is not None:
                kw["max_iters"] = args.max_iters
            ds, info = eigenvector_centrality(edges, g.offsets,
                                              args.workdir, cfg,
                                              tol=args.tol, **kw)
            ds.write_parquet(os.path.join(args.workdir, "eig_scores"))
            out["eigenvector"] = {"num_iters": info["num_iters"],
                                  "converged": info["converged"]}
        if args.cmd == "node2vec":
            from .graph.node2vec import node2vec_walks
            import os

            ds, info = node2vec_walks(
                edges, g.offsets, args.workdir, cfg,
                p=args.p, q=args.q, walk_len=args.walk_len,
                walks_per_vertex=args.walks_per_vertex, seed=args.seed)
            ds.write_parquet(os.path.join(args.workdir, "node2vec"))
            out["node2vec"] = {"n_walks": info["n_walks"],
                               "n_visits": info["n_visits"],
                               "rounds": info["rounds"]}
        if args.cmd == "embed":
            # the reference's end product — learned node embeddings
            # (link_prediction.py:33-106) — as ONE command:
            # node2vec walks -> skip-gram pairs -> distributed SGNS ->
            # embeddings parquet under the workdir
            import os

            import pyarrow as pa

            from .functions.pack import skipgram_pairs
            from .functions.word2vec import (embeddings_dataset,
                                             sgns_train)
            from .graph.node2vec import node2vec_walks
            from .ops.agg import grouped_aggregate

            walks, winfo = node2vec_walks(
                edges, g.offsets, args.workdir, cfg,
                p=args.p, q=args.q, walk_len=args.walk_len,
                walks_per_vertex=args.walks_per_vertex, seed=args.seed)
            walks = walks.materialize()  # vocab counts AND pairs
            pairs = skipgram_pairs(walks, "walk_id", "step", "vid",
                                   window=args.window, keep_order=True)
            vocab = grouped_aggregate(
                walks.select_columns(["vid"]), ["vid"],
                {"n": ("count", None)})
            vt = pa.concat_tables(
                [pa.table({"token": b.column("vid"),
                           "n": b.column("n")})
                 for b in vocab.iter_batches(batch_format="pyarrow")])
            toks, w_in, _, tinfo = sgns_train(
                pairs, vt, id_cols=("walk_id", "step", "offset"),
                dim=args.dim, negatives=args.negatives, lr=args.lr,
                epochs=args.epochs, seed=args.seed,
                num_parts=cfg.num_parts, workdir=args.workdir)
            emb = embeddings_dataset(toks, w_in)
            emb.write_parquet(os.path.join(args.workdir, "embeddings"))
            out["embed"] = {"n_walks": winfo["n_walks"],
                            "vocab": tinfo["V"],
                            "n_pairs": tinfo["n_pairs"],
                            "dim": args.dim,
                            "epochs": [round(e["mean_abs_update"], 8)
                                       for e in tinfo["epochs"]]}
        if args.cmd == "linkpred":
            # the reference's evaluation entry point
            # (link_prediction.py:33-106): hold out edges, learn on the
            # train graph, report ROC-AUC over held-out positives vs
            # sampled non-edges; scored pairs parquet under the workdir
            import os

            from .graph.linkpred import link_prediction_auc

            auc, scored, info = link_prediction_auc(
                edges, g.offsets, args.workdir, cfg,
                test_frac=args.test_frac, neg_ratio=args.neg_ratio,
                seed=args.seed, dim=args.dim, epochs=args.epochs,
                negatives=args.negatives, lr=args.lr,
                walk_len=args.walk_len,
                walks_per_vertex=args.walks_per_vertex,
                window=args.window, num_parts=cfg.num_parts)
            scored.write_parquet(os.path.join(args.workdir,
                                              "linkpred_scores"))
            out["linkpred"] = {"auc": round(float(auc), 6),
                               "n_test": info["n_test"],
                               "n_neg": info["n_neg"],
                               "n_train": info["n_train"]}
        if args.cmd == "propagate":
            # GNN-style feature smoothing over the built graph:
            # (text_len, n_links) page features, k aggregation rounds
            # on the shared directed CSR cache -> parquet layer
            import os

            from .graph.propagate import (feature_propagation,
                                          page_features)

            prop, pinfo = feature_propagation(
                edges, g.offsets, page_features(g, cfg), args.workdir,
                cfg, col="f", rounds=args.rounds, alpha=args.alpha,
                agg=args.agg)
            prop.write_parquet(os.path.join(args.workdir, "propagated"))
            out["propagate"] = {"rounds": pinfo["rounds"],
                                "agg": pinfo["agg"],
                                "dim": pinfo["dim"],
                                "alpha": args.alpha}
        if args.cmd == "localcluster":
            from .graph.pprpush import local_cluster

            members, phi, info = local_cluster(
                edges, g.offsets, args.workdir,
                seed_vid=args.seed_vid, alpha=args.alpha, eps=args.eps)
            out["localcluster"] = {
                "seed_vid": args.seed_vid,
                "n_members": int(members.size),
                "conductance": round(float(phi), 6),
                "support_size": info["support_size"]}
        if args.cmd == "louvain":
            from .graph.louvain import louvain as run_louvain
            import os

            # the CLI is the long-job surface: sub-round checkpointing
            # on, so a killed run rerun over the same --workdir resumes
            ds, info = run_louvain(edges, g.offsets, args.workdir, cfg,
                                   resolution=args.resolution,
                                   max_levels=args.max_levels,
                                   seed=args.seed, checkpoint=True)
            if args.refine:
                from .graph.leiden import refine_connectivity

                ds, rinfo = refine_connectivity(
                    edges, ds.materialize(), g.offsets, args.workdir,
                    cfg, job="leiden")
                info["refine"] = rinfo
            ds.write_parquet(os.path.join(args.workdir, "louvain"))
            out["louvain"] = {"n_communities": info["n_communities"],
                              "levels": info["levels"]}
            if args.refine:
                out["louvain"]["refine"] = {
                    k: info["refine"][k]
                    for k in ("n_before", "n_after", "n_split")}
        if args.cmd == "anf":
            from .graph.anf import anf
            import os

            ds, info = anf(edges, g.offsets, args.workdir, cfg,
                           p_bits=args.p_bits, seed=args.seed)
            ds.write_parquet(os.path.join(args.workdir, "anf"))
            out["anf"] = {"num_rounds": info["num_rounds"],
                          "nf": info["nf"]}
        if args.cmd == "walks":
            from .graph.walks import random_walks
            import os

            ds, info = random_walks(
                edges, g.offsets, args.workdir, cfg,
                walk_len=args.walk_len, seed=args.seed,
                restart_prob=args.restart_prob,
                walks_per_vertex=args.walks_per_vertex)
            ds.write_parquet(os.path.join(args.workdir, "walks"))
            out["walks"] = {"n_walks": info["n_walks"],
                            "n_visits": info["n_visits"]}
        if args.cmd == "bowtie":
            from .graph.bowtie import bowtie
            import os

            ds, info = bowtie(edges, g.offsets,
                              os.path.join(args.workdir, "bowtie"), cfg,
                              pivot=args.pivot)
            ds.write_parquet(os.path.join(args.workdir, "bowtie_cls"))
            out["bowtie"] = info
        if args.cmd == "scc":
            from .graph.scc import condensation, strongly_connected_components
            from .graph.toposort import topological_levels
            import os

            labels, info = strongly_connected_components(
                edges, g.offsets, args.workdir, cfg)
            labels = labels.materialize()  # feeds the write + condensation
            labels.write_parquet(os.path.join(args.workdir, "scc"))
            lab = labels.select_columns(["vid", "scc"])
            cond = condensation(edges, lab, cfg).materialize()
            cond.write_parquet(os.path.join(args.workdir, "condensation"))
            lv, linfo = topological_levels(
                cond.map_batches(
                    lambda b: b.select(["src_scc", "dst_scc"])
                    .rename_columns(["src", "dst"]),
                    batch_format="pyarrow", zero_copy_batch=True),
                g.offsets, args.workdir, cfg,
                lineage={"kind": "cond"},
                shards_dir=os.path.join(args.workdir, "csr_cond"))
            lv.write_parquet(os.path.join(args.workdir, "scc_levels"))
            out["scc"] = {"n_sccs": info["n_sccs"],
                          "num_outer": info["num_outer"],
                          "dag_depth": linfo["depth"]}
        if args.cmd == "coreness":
            from .graph.coreness import coreness
            import os

            ds, info = coreness(
                symmetrize(edges, cfg, drop_self_loops=True, dedup=False),
                g.offsets, args.workdir, cfg)
            ds.write_parquet(os.path.join(args.workdir, "coreness"))
            out["coreness"] = {"num_iters": info["num_iters"]}
        if args.cmd == "ktruss":
            from .graph.truss import k_truss
            import os

            ds, info = k_truss(edges, args.k, cfg)
            ds.write_parquet(os.path.join(args.workdir,
                                          f"truss_k{args.k}"))
            out["ktruss"] = {"k": args.k, "n_edges": info["n_edges"],
                             "num_rounds": info["num_rounds"]}
        if args.cmd == "mis":
            from .graph.mis import maximal_independent_set
            import os

            ds, info = maximal_independent_set(
                symmetrize(edges, cfg, drop_self_loops=True, dedup=False),
                g.offsets, args.workdir, cfg, seed=args.seed)
            ds.write_parquet(os.path.join(args.workdir, "mis"))
            out["mis"] = {"mis_size": info["mis_size"],
                          "num_rounds": info["num_rounds"]}
        if args.cmd == "wl":
            from .graph.wl import wl_refinement
            import os

            ds, info = wl_refinement(
                symmetrize(edges, cfg, drop_self_loops=True, dedup=False),
                g.offsets, args.workdir, cfg,
                max_rounds=args.max_rounds)
            ds.write_parquet(os.path.join(args.workdir, "wl"))
            out["wl"] = {"n_classes": info["n_classes"],
                         "num_rounds": info["num_rounds"],
                         "converged": info["converged"]}
        if args.cmd == "spectral":
            from .graph.spectral import spectral_clustering, \
                spectral_embedding
            import os

            if args.clusters > 0:
                ds, info = spectral_clustering(
                    edges, g.offsets, args.workdir, cfg,
                    n_clusters=args.clusters, dim=args.k,
                    tol=args.tol, max_iters=args.max_iters,
                    seed=args.seed)
                ds.write_parquet(os.path.join(args.workdir,
                                              "spectral_clusters"))
            else:
                ds, info = spectral_embedding(
                    edges, g.offsets, args.workdir, cfg, k=args.k,
                    tol=args.tol, max_iters=args.max_iters,
                    seed=args.seed)
                ds.write_parquet(os.path.join(args.workdir,
                                              "spectral_embedding"))
            out["spectral"] = {
                "num_iters": info["num_iters"],
                "converged": info["converged"],
                "eigenvalues": [round(e, 9)
                                for e in info["eigenvalues"]]}
        if args.cmd == "backbone":
            from .graph.backbone import disparity_filter
            from .graph.hostgraph import host_graph
            import os
            import pyarrow as _pa

            hv, he, _hoff = host_graph(
                read_layer(g.vertices), edges, cfg)
            sc = disparity_filter(he, cfg, src_col="src_h",
                                  dst_col="dst_h",
                                  weight_col="n_links",
                                  alpha=args.alpha, mode=args.mode)
            sc = sc.materialize()
            sc.write_parquet(os.path.join(args.workdir, "backbone"))

            def _agg(b):
                k = b.column("keep").to_numpy(zero_copy_only=False)
                return _pa.table({"n": _pa.array([b.num_rows]),
                                  "kept": _pa.array([int(k.sum())])})

            parts = sc.map_batches(
                _agg, batch_format="pyarrow").to_pandas()
            out["backbone"] = {"alpha": args.alpha, "mode": args.mode,
                               "n_edges": int(parts.n.sum()),
                               "kept": int(parts.kept.sum())}
        if args.cmd == "triangles-apx":
            from .graph.apxtriangles import approx_triangles

            info, _ = approx_triangles(
                edges, g.offsets, args.workdir, cfg,
                k_samples=args.k_samples, seed=args.seed)
            out["triangles_apx"] = {
                "n_wedges": info["n_wedges"],
                "n_closed": info.get("n_closed", 0),
                "kappa": info.get("kappa", 0.0),
                "triangles_est": info.get("triangles_est", 0.0)}
        if args.cmd == "bridges":
            from .graph.bridges import bridges as _bridges
            import os

            bds, l2, binfo = _bridges(edges, g.offsets, args.workdir,
                                      cfg)
            bds.write_parquet(os.path.join(args.workdir, "bridges"))
            l2.write_parquet(os.path.join(args.workdir, "twoecc"))
            out["bridges"] = {"n_bridges": binfo["n_bridges"],
                              "max_depth": binfo["max_depth"],
                              "n_roots": binfo["n_roots"]}
        if args.cmd == "summary":
            from .graph.metrics import (degree_assortativity,
                                        reciprocity)
            from .graph.triangles import triangles_edges

            rec = reciprocity(edges, cfg)
            assort = degree_assortativity(edges, cfg)
            _pt, ntri = triangles_edges(edges, cfg)
            out["summary"] = {
                "n_vertices": g.num_vertices,
                "n_edges": rec["n_edges"],
                "n_triangles": int(ntri),
                "reciprocity": rec["reciprocity"],
                "assortativity": assort["assortativity"]}
        if args.cmd == "scan":
            from .graph.scan import scan_clusters
            import os

            ds, info = scan_clusters(edges, g.offsets, args.workdir, cfg,
                                     eps=args.eps, mu=args.mu)
            ds.write_parquet(os.path.join(args.workdir, "scan"))
            out["scan"] = {"eps": info["eps"], "mu": info["mu"],
                           "n_cores": info["n_cores"],
                           "n_members": info["n_members"]}
        if args.cmd == "redirects":
            from .graph.redirects import resolve_pointers
            from .ops.agg import grouped_aggregate
            import os

            m = grouped_aggregate(edges, ["src"], {"dst": ("min", "dst")},
                                  num_parts=cfg.num_parts)
            ds = resolve_pointers(m, cfg, key="src", val="dst",
                                  rounds=args.rounds)
            ds.write_parquet(os.path.join(args.workdir, "redirects"))
            out["redirects"] = {"rounds": args.rounds,
                                "hop_bound": 2 ** args.rounds,
                                "n_resolved": ds.count()}
        if args.cmd == "triads":
            from .graph.triads import triad_census

            out["triads"] = triad_census(edges, cfg)
        if args.cmd == "cliques4":
            from .graph.cliques import cliques4_edges
            import os

            ds, total = cliques4_edges(edges, cfg)
            ds.write_parquet(os.path.join(args.workdir, "cliques4"))
            out["cliques4"] = {"total": total}
        if args.cmd == "matching":
            from .graph.matching import maximal_matching
            import os

            ds, info = maximal_matching(
                symmetrize(edges, cfg, drop_self_loops=True, dedup=False),
                g.offsets, args.workdir, cfg, seed=args.seed)
            ds.write_parquet(os.path.join(args.workdir, "matching"))
            out["matching"] = {"n_matched_pairs": info["n_matched_pairs"],
                               "num_rounds": info["num_rounds"]}
        if args.cmd == "coloring":
            from .graph.coloring import greedy_coloring
            import os

            ds, info = greedy_coloring(
                symmetrize(edges, cfg, drop_self_loops=True, dedup=False),
                g.offsets, args.workdir, cfg, seed=args.seed)
            ds.write_parquet(os.path.join(args.workdir, "coloring"))
            out["coloring"] = {"n_colors": info["n_colors"],
                               "num_rounds": info["num_rounds"]}
        if args.cmd == "densest":
            from .graph.densest import densest_subgraph
            import os

            ds, info = densest_subgraph(
                symmetrize(edges, cfg, drop_self_loops=True, dedup=False),
                g.offsets, args.workdir, cfg, eps=args.eps)
            ds.write_parquet(os.path.join(args.workdir, "densest"))
            out["densest"] = {"best_density": info["best_density"],
                              "subgraph_size": info["subgraph_size"]}
        if args.cmd == "sssp":
            import numpy as np
            import os

            from .graph.sssp import sssp as run_sssp

            srcs = np.array([int(x) for x in args.sources.split(",")],
                            dtype=np.int64)
            if args.weighted:
                import pyarrow as pa

                from .graph.build import weighted_edges

                we = weighted_edges(g, cfg)

                def invw(b):
                    w = b.column("w").to_numpy(
                        zero_copy_only=False).astype("float64")
                    return pa.table({"src": b.column("src"),
                                     "dst": b.column("dst"),
                                     "w": pa.array(1.0 / w)})

                wsrc = we.map_batches(invw, batch_format="pyarrow",
                                      zero_copy_batch=True)
                sd = os.path.join(args.workdir, "csr_w_inv")
            else:
                import pyarrow as pa

                def unit(b):
                    return pa.table({
                        "src": b.column("src"), "dst": b.column("dst"),
                        "w": pa.array([1.0] * b.num_rows,
                                      type=pa.float64())})

                wsrc = edges.map_batches(unit, batch_format="pyarrow",
                                         zero_copy_batch=True)
                sd = os.path.join(args.workdir, "csr_w_unit")
            ds, info = run_sssp(wsrc, g.offsets, args.workdir, srcs, cfg,
                                shards_dir=sd)
            ds.write_parquet(os.path.join(args.workdir, "sssp"))
            out["sssp"] = {"num_iters": info["num_iters"],
                           "reached": int(ds.count())}
        if args.cmd == "betweenness":
            from .graph.betweenness import betweenness
            import os

            ds, info = betweenness(edges, g.offsets, args.workdir, cfg,
                                   n_samples=args.n_samples,
                                   seed=args.seed, batch_k=args.batch_k)
            ds.write_parquet(os.path.join(args.workdir, "betweenness"))
            out["betweenness"] = {"n_sources": info["n_sources"],
                                  "scale": info["scale"]}
        if args.cmd in ("triangles", "all"):
            from .graph.triangles import triangles_edges

            per, total = triangles_edges(edges, cfg)
            import os

            per.write_parquet(os.path.join(args.workdir, "triangles"))
            out["triangles"] = {"total": total}
        print(json.dumps(out))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
