"""PMI collocation mining — windowed token-pair pointwise mutual
information over a document corpus.

The classic phrase-extraction signal (Church & Hanks 1990): for an
unordered token pair {a, b} co-occurring within a +-``window`` token
distance, PMI = ln( (c_ab / P) / ((c_a / N) * (c_b / N)) ) with c_ab
the windowed pair count, c_a/c_b corpus unigram counts, P total pair
occurrences and N total tokens.  High-PMI pairs are the multi-word
expressions a tokenizer-training or phrase-joining pass consumes
(word2vec's phrase pass uses the same statistic); the reference has no
collocation machinery (scope: halvesting_geometric's metadata text
passes) — this is engine-added curation surface.

Tokenization is single-space split (Python ``text.split(' ')`` ==
DuckDB ``string_split(text, ' ')``, the repo-wide SQL-parity
convention), and unordered pairs canonicalize lexicographically
(least/greatest — byte order, matching DuckDB's binary collation on
ASCII).

Scale shape: per-batch vectorized pair generation (numpy shifted
views over the batch-concatenated token array, doc boundaries masked)
with IN-BATCH partial counting, then ONE grouped-sum exchange each
for pair and unigram counts; totals are two scalar reduces; the final
PMI pass broadcasts nothing but those two scalars.  Pair-key
cardinality is vocabulary-bounded (pairs with c_ab < min_count are
dropped AFTER the exact grouped sum — counts stay exact).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..ops.agg import grouped_aggregate
from ..ops.join import hash_join

_I64 = pa.int64()


def _batch_tokens(b: pa.Table, text_col: str):
    """Batch -> (tokens 1-D object array, doc index per token)."""
    toks, docs = [], []
    for i, t in enumerate(b.column(text_col).to_pylist()):
        ts = (t or "").split(" ")
        toks.extend(ts)
        docs.append(np.full(len(ts), i, dtype=np.int64))
    return (np.asarray(toks, dtype=object),
            np.concatenate(docs) if docs else np.zeros(0, dtype=np.int64))


def pmi_pairs(ds, text_col: str = "text", window: int = 2,
              min_count: int = 5, num_parts: int = 16):
    """-> Dataset (a, b, n_ab:int64, pmi:float64 rounded 6dp) for
    unordered within-window pairs with n_ab >= min_count."""
    import polars as pl

    if window < 1:
        raise ValueError("window must be >= 1")

    def pair_partials(b: pa.Table) -> pa.Table:
        toks, docs = _batch_tokens(b, text_col)
        outs_a, outs_b = [], []
        for k in range(1, window + 1):
            if len(toks) <= k:
                break
            x, y = toks[:-k], toks[k:]
            m = (docs[:-k] == docs[k:]) & (x != y)
            if not m.any():
                continue
            xa, ya = x[m], y[m]
            lo = np.where(xa < ya, xa, ya)
            hi = np.where(xa < ya, ya, xa)
            outs_a.append(lo)
            outs_b.append(hi)
        if not outs_a:
            return pa.table({"a": pa.array([], type=pa.string()),
                             "b": pa.array([], type=pa.string()),
                             "n": pa.array([], type=_I64)})
        df = pl.DataFrame({"a": np.concatenate(outs_a).astype(str),
                           "b": np.concatenate(outs_b).astype(str)})
        g = df.group_by(["a", "b"]).len().rename({"len": "n"})
        return g.to_arrow().cast(pa.schema([("a", pa.string()),
                                            ("b", pa.string()),
                                            ("n", _I64)]))

    def uni_partials(b: pa.Table) -> pa.Table:
        toks, _ = _batch_tokens(b, text_col)
        if not len(toks):
            return pa.table({"tok": pa.array([], type=pa.string()),
                             "n": pa.array([], type=_I64)})
        df = pl.DataFrame({"tok": toks.astype(str)})
        g = df.group_by("tok").len().rename({"len": "n"})
        return g.to_arrow().cast(pa.schema([("tok", pa.string()),
                                            ("n", _I64)]))

    ds = ds.materialize()  # feeds two independent count passes
    pc = grouped_aggregate(
        ds.map_batches(pair_partials, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["a", "b"], {"n_ab": ("sum", "n")},
        num_parts=num_parts).materialize()
    uni = grouped_aggregate(
        ds.map_batches(uni_partials, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["tok"], {"c": ("sum", "n")}, num_parts=num_parts).materialize()
    P = float(pc.sum("n_ab") or 0)
    N = float(uni.sum("c") or 0)
    if not P or not N:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "a": pa.array([], type=pa.string()),
            "b": pa.array([], type=pa.string()),
            "n_ab": pa.array([], type=_I64),
            "pmi": pa.array([], type=pa.float64())}))

    def keep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pcomp

        return b.filter(pcomp.greater_equal(b.column("n_ab"), min_count))

    pc = pc.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    pc_schema = pa.schema([("a", pa.string()), ("b", pa.string()),
                           ("n_ab", _I64)])
    uni_schema = pa.schema([("tok", pa.string()), ("c", _I64)])
    j = hash_join(pc, uni, on="a", right_on="tok", right_cols=["c"],
                  num_parts=num_parts, left_schema=pc_schema,
                  right_schema=uni_schema)
    j = j.map_batches(lambda b: b.rename_columns(
        list(b.column_names[:-1]) + ["c_a"]),
        batch_format="pyarrow", zero_copy_batch=True)
    j_schema = pc_schema.append(pa.field("c_a", _I64))
    j = hash_join(j, uni, on="b", right_on="tok", right_cols=["c"],
                  num_parts=num_parts, left_schema=j_schema,
                  right_schema=uni_schema)
    j = j.map_batches(lambda b: b.rename_columns(
        list(b.column_names[:-1]) + ["c_b"]),
        batch_format="pyarrow", zero_copy_batch=True)

    def score(b: pa.Table) -> pa.Table:
        n_ab = b.column("n_ab").to_numpy().astype(np.float64)
        c_a = b.column("c_a").to_numpy().astype(np.float64)
        c_b = b.column("c_b").to_numpy().astype(np.float64)
        pmi = np.log((n_ab / P) / ((c_a / N) * (c_b / N)))
        return pa.table({"a": b.column("a"), "b": b.column("b"),
                         "n_ab": b.column("n_ab"),
                         "pmi": pa.array(np.round(pmi, 6),
                                         type=pa.float64())})

    return j.map_batches(score, batch_format="pyarrow",
                         zero_copy_batch=True)
