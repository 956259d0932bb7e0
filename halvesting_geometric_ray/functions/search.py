"""Sparse-retrieval index: a searchable BM25 inverted index over the
corpus, as partitioned parquet — the serving-side complement of the
scoring operators in functions/tfidf.py (which rescan the corpus per
query).

Index layout under ``{index_dir}``:

    postings/bucket=<h>/...parquet   (term, doc_id, tf, dl) rows,
                                     hive-partitioned by bucket =
                                     stable_hash64(term) % num_buckets
    df/bucket=<h>/...parquet         (term, df) same bucketing
    meta.json                        {n_docs, avgdl, num_buckets}

Doc length is DENORMALIZED into the postings rows (the classic index
design), so a query never joins against an O(corpus) doc-length table.

Scale shape:
- build: term_doc_stats' zero-exchange tf pass + ONE grouped doc-length
  exchange + the existing hive-partitioned resumable sink; postings
  never gather anywhere.
- query: terms hash to their buckets, so the read touches ONLY
  ``len(query_term_buckets)`` partition directories out of
  ``num_buckets`` — pruning at the read, the 100 TB discipline.  The
  scored per-(term, doc) rows reduce via one tiny grouped sum (docs
  sharing a query term only) and a driver top-k.

BM25 formula matches functions/tfidf.py::bm25_scores exactly
(Robertson/Sparck-Jones idf, parity pinned in tests/test_search.py).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..ops.agg import grouped_aggregate
from ..sources.readers import write_partitioned_parquet
from .hashing import stable_hash64
from .tfidf import term_doc_stats


def build_index(docs, index_dir: str, *, id_col: str = "doc_id",
                text_col: str = "text", num_buckets: int = 64,
                num_parts: int = 16) -> Dict:
    """Build the inverted index; returns the meta dict."""
    if num_buckets < 1:
        raise ValueError("num_buckets must be >= 1")
    n_docs = docs.count()
    tf, df = term_doc_stats(docs, id_col, text_col)
    tf = tf.materialize()  # feeds doc lengths AND the postings join

    dl = grouped_aggregate(tf.select_columns(["doc_id", "tf"]),
                           ["doc_id"], {"dl": ("sum", "tf")},
                           num_parts=num_parts)
    from ..ops.join import hash_join

    tf_schema = pa.schema([("doc_id", pa.int64()), ("term", pa.string()),
                           ("tf", pa.int64())])
    dl_schema = pa.schema([("doc_id", pa.int64()), ("dl", pa.int64())])
    postings = hash_join(tf, dl, on="doc_id", right_on="doc_id",
                         num_parts=num_parts,
                         left_schema=tf_schema, right_schema=dl_schema)

    def bucketed(b: pa.Table) -> pa.Table:
        h = stable_hash64(b.column("term")) % num_buckets
        return b.append_column("bucket",
                               pa.array(h.astype(np.int32)))

    write_partitioned_parquet(
        postings.map_batches(bucketed, batch_format="pyarrow",
                             zero_copy_batch=True),
        os.path.join(index_dir, "postings"), ["bucket"])
    write_partitioned_parquet(
        df.map_batches(bucketed, batch_format="pyarrow",
                       zero_copy_batch=True),
        os.path.join(index_dir, "df"), ["bucket"])

    total_tokens = int(sum(
        r["s"] for r in dl.map_batches(
            lambda t: pa.table({"s": pa.array(
                [int(t.column("dl").to_numpy().sum()) if t.num_rows
                 else 0], type=pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True).take_all()))
    meta = {"n_docs": int(n_docs),
            "avgdl": total_tokens / max(int(n_docs), 1),
            "num_buckets": num_buckets}
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def query_index(index_dir: str, query_terms: Sequence[str], *,
                k: int = 10, k1: float = 1.2, b: float = 0.75
                ) -> Tuple[pd.DataFrame, Dict]:
    """Top-k BM25 hits from a built index.  Reads ONLY the partition
    directories the query terms hash into.  Returns
    (DataFrame(doc_id, score) sorted score desc / doc_id asc, info)."""
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    q = sorted(set(t for t in query_terms if t))
    if not q:
        raise ValueError("query_terms must contain non-empty terms")
    B = meta["num_buckets"]
    h = stable_hash64(pa.array(q, type=pa.string())) % B
    buckets = sorted(set(int(x) for x in h))
    info = {"buckets_read": buckets, "num_buckets": B}

    def dirs(layer: str) -> List[str]:
        # expand to the parquet files inside each touched bucket dir
        # (ray.data.read_parquet takes one dir fine, but a LIST of
        # paths must be files)
        out = []
        for bb in buckets:
            d = os.path.join(index_dir, layer, f"bucket={bb}")
            if os.path.isdir(d):
                out.extend(sorted(
                    os.path.join(d, f) for f in os.listdir(d)
                    if f.endswith(".parquet")))
        return out

    n = meta["n_docs"]
    avgdl = meta["avgdl"]

    def _member(terms: np.ndarray, qa: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(qa, terms)
        ok = pos < len(qa)
        ok[ok] = qa[pos[ok]] == terms[ok]
        return ok

    qarr = np.array(q, dtype=object)
    ddirs = dirs("df")
    dmap: Dict[str, int] = {}
    if ddirs:
        dft = (rd.read_parquet(ddirs, columns=["term", "df"])
               .map_batches(lambda t: t.filter(pa.array(_member(
                   t.column("term").to_numpy(zero_copy_only=False),
                   qarr))),
                   batch_format="pyarrow", zero_copy_batch=True)
               .to_pandas())
        if len(dft):  # empty Ray datasets lose their schema in pandas
            dmap = dict(zip(dft["term"], dft["df"]))
    dfv = np.array([dmap.get(t, 0) for t in q], dtype=np.float64)
    idf = np.log((n - dfv + 0.5) / (dfv + 0.5) + 1.0)

    pdirs = dirs("postings")
    if not pdirs:
        return (pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                              "score": pd.Series([], dtype=np.float64)}),
                info)

    def score(t: pa.Table) -> pa.Table:
        terms = t.column("term").to_numpy(zero_copy_only=False)
        keep = _member(terms, qarr)
        if not keep.any():
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.float64())})
        tt = t.filter(pa.array(keep))
        term = tt.column("term").to_numpy(zero_copy_only=False)
        tfv = tt.column("tf").to_numpy().astype(np.float64)
        dl = tt.column("dl").to_numpy().astype(np.float64)
        pos = np.searchsorted(qarr, term)
        denom = tfv + k1 * (1.0 - b + b * dl / avgdl)
        contrib = idf[pos] * tfv * (k1 + 1.0) / denom
        return pa.table({"doc_id": tt.column("doc_id"),
                         "s": pa.array(contrib, type=pa.float64())})

    scored = rd.read_parquet(
        pdirs, columns=["term", "doc_id", "tf", "dl"]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True)
    per_doc = grouped_aggregate(scored, ["doc_id"], {"score": ("sum", "s")},
                                num_parts=max(4, len(buckets)))
    top = (per_doc.sort(["score", "doc_id"], descending=[True, False])
           .limit(k).to_pandas())
    if not len(top):  # schema-less empty result -> canonical frame
        top = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                            "score": pd.Series([], dtype=np.float64)})
    return top, info
