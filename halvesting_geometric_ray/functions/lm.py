"""Unigram-LM quality scoring — the data-engine analogue of the KenLM
perplexity filter used by CCNet/RedPajama-style corpus pipelines: score
each document by its cross-entropy under a smoothed unigram model
estimated from the corpus itself (or a reference corpus), then filter
on the score.

Two passes, both scale-shaped:

1. MODEL — per-batch combined token counts -> one grouped sum -> global
   top-``vocab_size`` vocabulary (deterministic tie-break by token) and
   the TOTAL token count (per-block partials, no second shuffle).  The
   broadcast model is the sorted token-hash array + log-probability
   array — ``O(vocab)`` bytes shipped once via ``ray.put``, never per
   batch.
2. SCORE — stateless ``map_batches``: tokens hash, ``searchsorted``
   membership, OOV mass from add-alpha smoothing over ``vocab+1``
   classes (every out-of-vocabulary token shares one UNK class):

       p(tok) = (count + alpha) / (T + alpha * (V + 1))
       p(UNK) = alpha         / (T + alpha * (V + 1))
       score  = -mean log p   (nats/token; empty docs score 0)

Exact semantics pinned against a DuckDB + NumPy oracle in
tests/test_lm.py.  At 10^12 pages the vocabulary is capped (top-V), so
the model broadcast stays fixed-size while the count pass is the same
grouped exchange every frequency analysis already pays.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..functions.hashing import stable_hash64
from ..ops.agg import grouped_aggregate


def unigram_model(docs, text_col: str = "text", *, vocab_size: int = 65536,
                  alpha: float = 0.5, num_parts: int = 16,
                  hash_seed: int = 42):
    """Estimate the smoothed unigram model.  Returns
    (model_ref, info) where model_ref is a ray.put of
    (sorted token-hash array, logp array, logp_unk)."""
    import polars as pl

    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    if alpha <= 0:
        raise ValueError("alpha must be > 0")

    def tok_partial(b: pa.Table) -> pa.Table:
        df = (pl.from_arrow(b.select([text_col]))
              .with_columns(pl.col(text_col).str.extract_all(r"\S+")
                            .alias("__t"))
              .select(pl.col("__t").explode().alias("tok"))
              .drop_nulls()
              .group_by("tok").len(name="n"))
        return df.to_arrow().cast(pa.schema([
            pa.field("tok", pa.string()), pa.field("n", pa.int64())]))

    counts = grouped_aggregate(
        docs.map_batches(tok_partial, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["tok"], {"n": ("sum", "n")}, num_parts=num_parts)

    # total tokens + distinct: per-block partials, driver-summed
    def totals(b: pa.Table) -> pa.Table:
        return pa.table({"t": pa.array([int(np.sum(b.column("n").to_numpy()))]),
                         "d": pa.array([b.num_rows])})

    # top-V by (count desc, token asc) — per-block candidate pruning
    def top_partial(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).sort(["n", "tok"], descending=[True, False])
        return df.head(vocab_size).to_arrow().cast(b.schema)

    counts = counts.materialize()  # feeds totals AND top-V
    tot = counts.map_batches(totals, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    T = int(tot["t"].sum()) if len(tot) else 0
    n_distinct = int(tot["d"].sum()) if len(tot) else 0
    top = (counts.map_batches(top_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
           .to_pandas())
    if len(top):
        top = (top.sort_values(["n", "tok"], ascending=[False, True])
               .head(vocab_size))
        toks = top["tok"].to_numpy()
        cnts = top["n"].to_numpy().astype(np.float64)
    else:
        toks = np.empty(0, dtype=object)
        cnts = np.empty(0, dtype=np.float64)
    V = len(toks)
    denom = T + alpha * (V + 1)
    h = stable_hash64(pa.array(toks, type=pa.string()), seed=hash_seed) \
        if V else np.empty(0, dtype=np.int64)
    order = np.argsort(h, kind="stable")
    logp = np.log((cnts + alpha) / denom)
    logp_unk = float(np.log(alpha / denom))
    model_ref = ray.put((h[order], logp[order], logp_unk))
    info = {"total_tokens": T, "distinct_tokens": n_distinct,
            "vocab_size": V, "alpha": alpha, "denom": float(denom)}
    return model_ref, info


def lm_scores(docs, model_ref, id_col: str = "doc_id",
              text_col: str = "text", hash_seed: int = 42):
    """Score documents under a broadcast unigram model:
    (id_col, n_tokens, oov_tokens, cross_entropy)."""
    import polars as pl

    def score(b: pa.Table) -> pa.Table:
        hv, lp, lp_unk = ray.get(model_ref)
        s = pl.from_arrow(b.column(text_col))
        if isinstance(s, pl.DataFrame):
            s = s.to_series()
        ls = s.str.extract_all(r"\S+")
        lens = ls.list.len().fill_null(0).to_numpy().astype(np.int64)
        flat = ls.explode().drop_nulls()
        th = stable_hash64(flat.to_arrow(), seed=hash_seed)
        if hv.size:
            j = np.searchsorted(hv, th)
            j_cl = np.minimum(j, hv.size - 1)
            hit = hv[j_cl] == th
            tok_lp = np.where(hit, lp[j_cl], lp_unk)
        else:
            hit = np.zeros(th.size, dtype=bool)
            tok_lp = np.full(th.size, lp_unk)
        rowidx = np.repeat(np.arange(b.num_rows, dtype=np.int64), lens)
        n_rows = b.num_rows
        tot_lp = np.bincount(rowidx, weights=tok_lp, minlength=n_rows)
        oov = np.bincount(rowidx, weights=(~hit).astype(np.float64),
                          minlength=n_rows).astype(np.int64)
        ce = np.where(lens > 0, -tot_lp / np.maximum(lens, 1), 0.0)
        return pa.table({
            id_col: b.column(id_col),
            "n_tokens": pa.array(lens),
            "oov_tokens": pa.array(oov),
            "cross_entropy": pa.array(ce),
        })

    return docs.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True)
