"""Curation-chain scaling ladder (BASELINE.md protocol): 600k
synthetic pages as docs, quality_gates=(5,400,30), normalize ->
langid+quality -> PII -> exact dedup, best-of-2, one CPU level per
process:

    python tools/curation_ladder.py 2
    python tools/curation_ladder.py 8 --profile   # per-stage timers

Prints one JSON line {cpus, best, runs, n_docs, survivors[, stages]}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import halvesting_geometric_ray  # noqa: F401  (logging config)
import ray
import ray.data as rd


def main():
    cpus = int(sys.argv[1])
    n_docs = int(os.environ.get("HGR_CURATE_DOCS", "600000"))
    profile = "--profile" in sys.argv
    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False
    from halvesting_geometric_ray.fixtures import ensure_pages_parquet
    from halvesting_geometric_ray.pipelines.curation import curate_corpus

    pages = ensure_pages_parquet(n_docs, 123)  # cached, untimed
    # pages (url, html) -> docs (doc_id, text); cache as parquet so the
    # timed chain starts from a columnar read like the q_ path
    docs_dir = f"/tmp/hgr_curate_ladder/docs_n{n_docs}"
    if not os.path.exists(os.path.join(docs_dir, "_DONE")):
        import pyarrow as pa
        ds = rd.read_parquet(pages, columns=["url", "html"])

        def mk(b):
            from halvesting_geometric_ray.functions.hashing import \
                stable_hash64
            did = stable_hash64(b.column("url")).astype("int64")
            return pa.table({"doc_id": pa.array(did),
                             "text": b.column("html").cast(pa.string())})

        ds.map_batches(mk, batch_format="pyarrow",
                       zero_copy_batch=True).write_parquet(docs_dir)
        open(os.path.join(docs_dir, "_DONE"), "w").write("")
    # warm page cache
    rd.read_parquet(docs_dir, columns=["text"]).map_batches(
        lambda b: {"n": [b.num_rows]}, batch_format="pyarrow").sum("n")

    best, runs, surv = None, [], None
    for _ in range(2):
        docs = rd.read_parquet(docs_dir, columns=["doc_id", "text"])
        t0 = time.time()
        out, info = curate_corpus(docs, quality_gates=(5, 400, 30),
                                  neardup=False)
        surv = out.count()
        t = time.time() - t0
        runs.append(round(t, 2))
        best = t if best is None else min(best, t)
    res = {"cpus": cpus, "best": round(best, 2), "runs": runs,
           "n_docs": n_docs, "survivors": int(surv),
           "docs_per_sec": round(n_docs / best, 0)}
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
