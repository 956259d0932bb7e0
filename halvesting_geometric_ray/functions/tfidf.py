"""TF-IDF: corpus term statistics + per-document top-k salient terms.

The classic sparse-retrieval / keyword-extraction step a web-text
pipeline runs next to dedup and quality scoring (the reference has no
analogue; its metadata pipeline stops at language filters —
build_metadata.py:35-47).

Scale shape:
- ``term_doc_stats``: tf is EXACT per batch with zero exchanges — one
  document never spans batches, so a polars explode + group inside
  ``map_batches`` finishes each doc's term counts locally.  df needs
  one vocabulary-bounded exchange: grouped count of the tf rows per
  term (ops/agg.grouped_aggregate's combiner shrinks it to
  ~vocab x blocks rows).
- ``tfidf_topk``: the df table (vocab-sized) is ``ray.put`` ONCE as
  sorted term + count arrays; a stateless scoring pass searchsorted-maps
  each batch's terms, computes tf * ln(N/df) and takes per-doc top-k
  with one lexsort — no further shuffles.

Unbounded vocabularies: df is bounded by distinct terms, not documents;
for true open-web vocab (10^9+ terms) swap the broadcast for a bucketed
hash_join of tf against df on term — same df build, different attach.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..ops.agg import grouped_aggregate

_TF_SCHEMA = pa.schema([pa.field("doc_id", pa.int64()),
                        pa.field("term", pa.string()),
                        pa.field("tf", pa.int64())])


def _tf_batch(b: pa.Table, id_col: str, text_col: str) -> pa.Table:
    import polars as pl

    if b.num_rows == 0:
        return _TF_SCHEMA.empty_table()
    df = pl.from_arrow(b.select([id_col, text_col]))
    out = (df.with_columns(pl.col(text_col).str.split(" ").alias("term"))
           .explode("term")
           .filter(pl.col("term").str.len_bytes() > 0)
           .group_by([id_col, "term"]).len().rename({"len": "tf"})
           .with_columns(pl.col("tf").cast(pl.Int64)))
    t = out.to_arrow()
    return pa.table({"doc_id": t.column(id_col).cast(pa.int64()),
                     "term": t.column("term").cast(pa.string()),
                     "tf": t.column("tf")})


def term_doc_stats(docs, id_col: str = "doc_id", text_col: str = "text"):
    """(tf_dataset, df_dataset): tf = (doc_id, term, tf) exact per-batch;
    df = (term, df) via one vocab-bounded grouped count (df = number of
    distinct docs containing term — exact because tf has one row per
    (doc, term))."""
    tf = docs.map_batches(lambda b: _tf_batch(b, id_col, text_col),
                          batch_format="pyarrow", zero_copy_batch=True)
    df = grouped_aggregate(tf.select_columns(["term"]).map_batches(
        lambda b: b.append_column("one", pa.array(
            np.ones(b.num_rows, dtype=np.int64))),
        batch_format="pyarrow", zero_copy_batch=True),
        ["term"], {"df": ("sum", "one")})
    return tf, df


def tfidf_topk(docs, k: int = 3, id_col: str = "doc_id",
               text_col: str = "text", n_docs: int | None = None):
    """Per-document top-k terms by tf * ln(N/df) (ties: term asc).
    Returns (doc_id, term, rnk, score).

    The df table is broadcast ONCE (sorted term + idf arrays via
    ray.put); the scoring pass re-tokenizes each docs batch locally —
    one row = one complete document, so per-doc top-k finishes inside
    the batch with a single lexsort and NO exchange (a groupby here
    would shuffle every (doc, term) row for nothing).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    n = docs.count() if n_docs is None else n_docs
    _, df = term_doc_stats(docs, id_col, text_col)

    parts = [t for t in ray.get(df.to_arrow_refs())
             if t.num_rows > 0]
    if not parts:
        raise ValueError("empty corpus: no terms found")
    dfa = pa.concat_tables(parts)
    terms = dfa.column("term").to_numpy(zero_copy_only=False)
    counts = dfa.column("df").to_numpy(zero_copy_only=False)
    order = np.argsort(terms)
    idf = np.log(float(n) / counts[order].astype(np.float64))
    ref = ray.put((terms[order], idf))

    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "term": pa.array([], type=pa.string()),
                      "rnk": pa.array([], type=pa.int64()),
                      "score": pa.array([], type=pa.float64())})

    def score(b: pa.Table) -> pa.Table:
        tfb = _tf_batch(b, id_col, text_col)
        if tfb.num_rows == 0:
            return empty
        t, iv = ray.get(ref)
        term = tfb.column("term").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(t, term)
        sc = tfb.column("tf").to_numpy().astype(np.float64) * iv[pos]
        doc = tfb.column("doc_id").to_numpy()
        # per-doc top-k: lexsort by (doc asc, score desc, term asc)
        o = np.lexsort((term, -sc, doc))
        d_s = doc[o]
        starts = np.flatnonzero(np.r_[True, d_s[1:] != d_s[:-1]])
        rnk = np.arange(len(d_s)) - np.repeat(
            starts, np.diff(np.r_[starts, len(d_s)])) + 1
        keep = rnk <= k
        sel = o[keep]
        return pa.table({"doc_id": pa.array(doc[sel]),
                         "term": pa.array(term[sel], type=pa.string()),
                         "rnk": pa.array(rnk[keep].astype(np.int64)),
                         "score": pa.array(sc[sel])})

    return docs.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True)


def bm25_scores(docs, query_terms, k1: float = 1.2, b: float = 0.75,
                id_col: str = "doc_id", text_col: str = "text"):
    """BM25 relevance of every document against one query (Robertson/
    Sparck Jones probabilistic idf: ln((N-df+0.5)/(df+0.5) + 1)).

    Returns (doc_id, score), score > 0 only for docs sharing a term
    with the query.  Same scale shape as tfidf_topk: df + avgdl come
    from term_doc_stats' one vocab-bounded exchange plus one grouped
    doc-length pass; the query-term idf table (len(query_terms) floats)
    broadcasts once; scoring is a stateless vectorized pass over docs
    batches with no further exchange.
    """
    q = sorted(set(t for t in query_terms if t))
    if not q:
        raise ValueError("query_terms must contain non-empty terms")
    if k1 < 0 or not 0 <= b <= 1:
        raise ValueError("k1 >= 0 and 0 <= b <= 1 required")

    n = docs.count()
    tf, df = term_doc_stats(docs, id_col, text_col)

    # df for query terms + average doc length (sum tf / n), both from
    # the tf/df datasets (vocab-bounded / single scalar)
    parts = [t for t in ray.get(df.to_arrow_refs()) if t.num_rows > 0]
    dfa = pa.concat_tables(parts) if parts else None
    dmap = {}
    if dfa is not None:
        terms = dfa.column("term").to_numpy(zero_copy_only=False)
        counts = dfa.column("df").to_numpy(zero_copy_only=False)
        dmap = dict(zip(terms.tolist(), counts.tolist()))
    total_tokens = sum(
        r["s"] for r in tf.map_batches(
            lambda t: pa.table({"s": pa.array(
                [int(t.column("tf").to_numpy().sum()) if t.num_rows else 0],
                type=pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True).take_all())
    avgdl = float(total_tokens) / max(n, 1)

    qterms = np.array(q)
    dfv = np.array([dmap.get(t, 0) for t in q], dtype=np.float64)
    idf = np.log((n - dfv + 0.5) / (dfv + 0.5) + 1.0)
    ref = ray.put((qterms, idf))

    def score(bt: pa.Table) -> pa.Table:
        tfb = _tf_batch(bt, id_col, text_col)
        ids = bt.column(id_col).cast(pa.int64())
        if tfb.num_rows == 0:
            return pa.table({"doc_id": ids, "score": pa.array(
                np.zeros(bt.num_rows), type=pa.float64())})
        qt, iv = ray.get(ref)
        doc = tfb.column("doc_id").to_numpy()
        term = tfb.column("term").to_numpy(zero_copy_only=False)
        tfv = tfb.column("tf").to_numpy().astype(np.float64)
        # doc lengths for THIS batch (complete docs per row)
        uids, inv = np.unique(doc, return_inverse=True)
        dl = np.bincount(inv, weights=tfv)
        pos = np.searchsorted(qt, term)
        pos_ok = (pos < len(qt))
        hit = np.zeros(len(term), dtype=bool)
        hit[pos_ok] = qt[pos[pos_ok]] == term[pos_ok]
        denom = tfv + k1 * (1.0 - b + b * dl[inv] / avgdl)
        contrib = np.where(hit, iv[np.minimum(pos, len(qt) - 1)]
                           * tfv * (k1 + 1.0) / denom, 0.0)
        per_doc = np.zeros(len(uids))
        np.add.at(per_doc, inv, contrib)
        # map back to every batch row (docs with no terms score 0)
        idv = ids.to_numpy()
        p2 = np.searchsorted(uids, idv)
        ok = (p2 < len(uids))
        ok[ok] &= uids[p2[ok]] == idv[ok]
        out = np.zeros(len(idv))
        out[ok] = per_doc[p2[ok]]
        return pa.table({"doc_id": ids,
                         "score": pa.array(out, type=pa.float64())})

    return docs.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True)
