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


_UNK_H = np.int64(-1)  # UNK sentinel; stable_hash64 outputs are >= 0
_BACKOFF = 0.4         # Brants et al. 2007 stupid-backoff constant


def _map_vocab(th: np.ndarray, hv: np.ndarray) -> np.ndarray:
    """Token hashes -> vocab hash or the UNK sentinel."""
    if hv.size == 0:
        return np.full(th.size, _UNK_H)
    j = np.minimum(np.searchsorted(hv, th), hv.size - 1)
    return np.where(hv[j] == th, th, _UNK_H)


def _doc_pairs(lens: np.ndarray):
    """Valid (prev, cur) pair positions of a flattened token stream:
    pair p joins flat[p] -> flat[p+1]; pairs crossing document
    boundaries are masked out."""
    total = int(lens.sum())
    if total < 2:
        return np.zeros(max(total - 1, 0), dtype=bool)
    mask = np.ones(total - 1, dtype=bool)
    ends = np.cumsum(lens)[:-1]
    idx = ends[(ends > 0) & (ends < total)]
    mask[idx - 1] = False
    return mask


def bigram_model(docs, text_col: str = "text", *,
                 vocab_size: int = 65536, num_bigrams: int = 1 << 20,
                 alpha: float = 0.5, num_parts: int = 16,
                 hash_seed: int = 42):
    """Stupid-backoff bigram model (Brants et al. 2007 — the web-scale
    LM scoring recipe: no discount normalization, so estimation is one
    grouped sum over (prev, cur) pairs):

        s(w2 | w1) = c(w1, w2) / c(w1)        if the bigram is kept
                   = 0.4 * p_uni(w2)           otherwise

    over the UNK-mapped token stream (tokens outside the top-V unigram
    vocabulary collapse to one UNK class, bounding bigram cardinality
    at V^2 in theory and corpus-observed types in practice), keeping
    the top-``num_bigrams`` bigrams by (count desc, (prev, cur) asc).
    c(w1) is the pair-history marginal of the FULL (pre-truncation)
    count table — one more grouped sum over bigram-type-cardinality
    data, so kept bigrams score exactly.  Returns (model_ref, info);
    model_ref is a ray.put of (sorted bigram key array, logp12,
    unigram hv, logp, logp_unk)."""
    import polars as pl

    from ..functions.hashing import stable_hash_pair64

    if num_bigrams < 1:
        raise ValueError("num_bigrams must be >= 1")
    uni_ref, uni_info = unigram_model(
        docs, text_col, vocab_size=vocab_size, alpha=alpha,
        num_parts=num_parts, hash_seed=hash_seed)
    hv, lp, lp_unk = ray.get(uni_ref)

    def pair_partial(b: pa.Table) -> pa.Table:
        s = pl.from_arrow(b.column(text_col))
        if isinstance(s, pl.DataFrame):
            s = s.to_series()
        ls = s.str.extract_all(r"\S+")
        lens = ls.list.len().fill_null(0).to_numpy().astype(np.int64)
        flat = ls.explode().drop_nulls()
        th = _map_vocab(stable_hash64(flat.to_arrow(), seed=hash_seed), hv)
        mask = _doc_pairs(lens)
        prev, cur = th[:-1][mask], th[1:][mask]
        # combine per (prev, cur) inside the batch
        order = np.lexsort((cur, prev))
        pv, cv = prev[order], cur[order]
        new = np.r_[True, (pv[1:] != pv[:-1]) | (cv[1:] != cv[:-1])]
        starts = np.flatnonzero(new)
        n = np.diff(np.r_[starts, pv.size])
        return pa.table({"prev": pa.array(pv[starts]),
                         "cur": pa.array(cv[starts]),
                         "n": pa.array(n.astype(np.int64))})

    counts = grouped_aggregate(
        docs.map_batches(pair_partial, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["prev", "cur"], {"n": ("sum", "n")},
        num_parts=num_parts).materialize()
    # full-history marginal c(w1): bounded by V + 1 rows
    marg = grouped_aggregate(counts, ["prev"], {"c1": ("sum", "n")},
                             num_parts=num_parts).to_pandas()
    pm = dict(zip(marg["prev"].to_numpy(), marg["c1"].to_numpy())) \
        if len(marg) else {}

    def top_pairs(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).sort(["n", "prev", "cur"],
                                   descending=[True, False, False])
        return df.head(num_bigrams).to_arrow().cast(b.schema)

    top = counts.map_batches(top_pairs, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    if len(top):
        top = (top.sort_values(["n", "prev", "cur"],
                               ascending=[False, True, True])
               .head(num_bigrams))
        prev = top["prev"].to_numpy()
        cur = top["cur"].to_numpy()
        bn = top["n"].to_numpy().astype(np.float64)
        c1 = np.array([pm[p] for p in prev], dtype=np.float64)
        bk = stable_hash_pair64(prev, cur)
        order = np.argsort(bk, kind="stable")
        bk = bk[order]
        logp12 = np.log(bn / c1)[order]
    else:
        bk = np.empty(0, dtype=np.int64)
        logp12 = np.empty(0, dtype=np.float64)
    model_ref = ray.put((bk, logp12, hv, lp, lp_unk))
    info = dict(uni_info)
    info.update({"num_bigrams": int(bk.size), "backoff": _BACKOFF})
    return model_ref, info


def bigram_scores(docs, model_ref, id_col: str = "doc_id",
                  text_col: str = "text", hash_seed: int = 42):
    """Score documents under a broadcast stupid-backoff bigram model:
    (id_col, n_tokens, bigram_hits, cross_entropy) — first token of a
    document scores under the unigram; transitions score
    log s(w2|w1)."""
    import polars as pl

    from ..functions.hashing import stable_hash_pair64

    def score(b: pa.Table) -> pa.Table:
        bk, logp12, hv, lp, lp_unk = ray.get(model_ref)
        s = pl.from_arrow(b.column(text_col))
        if isinstance(s, pl.DataFrame):
            s = s.to_series()
        ls = s.str.extract_all(r"\S+")
        lens = ls.list.len().fill_null(0).to_numpy().astype(np.int64)
        flat = ls.explode().drop_nulls()
        th_raw = stable_hash64(flat.to_arrow(), seed=hash_seed)
        th = _map_vocab(th_raw, hv)
        # unigram logp of every token (the backoff target + doc heads)
        if hv.size:
            j = np.minimum(np.searchsorted(hv, th), hv.size - 1)
            hit = hv[j] == th
            uni_lp = np.where(hit, lp[np.minimum(j, lp.size - 1)], lp_unk)
        else:
            uni_lp = np.full(th.size, lp_unk)
        total = th.size
        tok_lp = uni_lp.copy()  # doc-head default
        bigram_hit = np.zeros(total, dtype=bool)
        if total >= 2:
            mask = _doc_pairs(lens)
            prev, cur = th[:-1][mask], th[1:][mask]
            k = stable_hash_pair64(prev, cur)
            if bk.size:
                jj = np.minimum(np.searchsorted(bk, k), bk.size - 1)
                bhit = bk[jj] == k
            else:
                bhit = np.zeros(k.size, dtype=bool)
            pos = np.arange(1, total)[mask]  # positions scored as pairs
            pair_lp = np.where(bhit, logp12[np.minimum(jj, max(logp12.size - 1, 0))]
                               if logp12.size else 0.0,
                               np.log(_BACKOFF) + uni_lp[pos])
            tok_lp[pos] = pair_lp
            bigram_hit[pos] = bhit
        rowidx = np.repeat(np.arange(b.num_rows, dtype=np.int64), lens)
        tot_lp = np.bincount(rowidx, weights=tok_lp, minlength=b.num_rows)
        bh = np.bincount(rowidx, weights=bigram_hit.astype(np.float64),
                         minlength=b.num_rows).astype(np.int64)
        ce = np.where(lens > 0, -tot_lp / np.maximum(lens, 1), 0.0)
        return pa.table({
            id_col: b.column(id_col),
            "n_tokens": pa.array(lens),
            "bigram_hits": pa.array(bh),
            "cross_entropy": pa.array(ce)})

    return docs.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True)


def dsir_log_weights(docs, target_ref, raw_ref, id_col: str = "doc_id",
                     text_col: str = "text", hash_seed: int = 42):
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): per document

        log w(x) = log p_target(x) - log p_raw(x)

    under two broadcast unigram models (hashed-feature bag-of-words —
    the paper's estimator).  One stateless pass, both models looked up
    per token; feeds ops/sample.py::weighted_sample (A-ES exponential
    keys) for the actual resampling.  Returns
    (id_col, n_tokens, log_weight)."""
    import polars as pl

    def score(b: pa.Table) -> pa.Table:
        hv_t, lp_t, unk_t = ray.get(target_ref)
        hv_r, lp_r, unk_r = ray.get(raw_ref)
        s = pl.from_arrow(b.column(text_col))
        if isinstance(s, pl.DataFrame):
            s = s.to_series()
        ls = s.str.extract_all(r"\S+")
        lens = ls.list.len().fill_null(0).to_numpy().astype(np.int64)
        flat = ls.explode().drop_nulls()
        th = stable_hash64(flat.to_arrow(), seed=hash_seed)

        def lookup(hv, lp, unk):
            if hv.size == 0:
                return np.full(th.size, unk)
            j = np.minimum(np.searchsorted(hv, th), hv.size - 1)
            return np.where(hv[j] == th, lp[j], unk)

        diff = lookup(hv_t, lp_t, unk_t) - lookup(hv_r, lp_r, unk_r)
        rowidx = np.repeat(np.arange(b.num_rows, dtype=np.int64), lens)
        logw = np.bincount(rowidx, weights=diff, minlength=b.num_rows)
        return pa.table({
            id_col: b.column(id_col),
            "n_tokens": pa.array(lens),
            "log_weight": pa.array(logw)})

    return docs.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True)


def kneser_ney_bigrams(docs, text_col: str = "text", *,
                       discount: float = 0.75, min_count: int = 3,
                       num_parts: int = 16, round_to: int = 9):
    """Interpolated Kneser-Ney bigram probability table estimated
    distributed — the smoothing the n-gram LM literature settled on
    (Kneser & Ney 1995; Chen & Goodman 1998) and the MapReduce LM
    estimation shape of Brants et al. 2007 ("Large language models in
    machine translation"):

        P_KN(w2 | w1) = max(c(w1,w2) - D, 0) / c(w1 .)
                      + D * N1+(w1, .) / c(w1 .) * Pcont(w2)
        Pcont(w2)     = N1+(. , w2) / N1+(. , .)

    where c(w1 .) is the left-context bigram mass, N1+(w1, .) the
    distinct-successor count, N1+(., w2) the distinct-predecessor
    (continuation) count and N1+(.,.) the number of bigram types.

    Tokenization is the repo convention text.split(' ') == DuckDB
    string_split (bigrams never cross documents).  Plan: one grouped
    bigram-count exchange (in-batch polars combine first), then two
    vocab-bounded grouped sums off the materialized bigram layer, one
    scalar type count, and two bucketed joins back onto the
    ``min_count``-filtered bigrams.  All inputs to the probability are
    exact int64 counts; the finish follows the oracle's literal
    left-to-right float evaluation, rounded ``round_to`` dp on both
    sides.  Returns (w1, w2, c, p_kn).
    """
    import polars as pl

    from ..ops.join import hash_join

    if not (0.0 < discount < 1.0):
        raise ValueError("discount must be in (0, 1)")

    def pair_partial(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([text_col]))
        df = df.with_columns(pl.col(text_col).str.split(" ").alias("__l"))
        df = df.select(
            pl.col("__l").list.slice(
                0, pl.col("__l").list.len() - 1).alias("w1"),
            pl.col("__l").list.slice(1).alias("w2"))
        df = df.explode(["w1", "w2"]).drop_nulls()
        out = df.group_by(["w1", "w2"]).len(name="n")
        return out.to_arrow().cast(pa.schema(
            [pa.field("w1", pa.string()), pa.field("w2", pa.string()),
             pa.field("n", pa.int64())]))

    bg = grouped_aggregate(
        docs.map_batches(pair_partial, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["w1", "w2"], {"c": ("sum", "n")},
        num_parts=num_parts).materialize()  # referenced 4x below

    lt = grouped_aggregate(bg, ["w1"],
                           {"cw1": ("sum", "c"),
                            "n1p_fwd": ("count", None)},
                           num_parts=num_parts)
    rt = grouped_aggregate(bg.select_columns(["w2"]), ["w2"],
                           {"n1p_rev": ("count", None)},
                           num_parts=num_parts)
    n_types = float(bg.count())

    bgf = bg.filter(expr=f"c >= {int(min_count)}")
    bg_schema = pa.schema([pa.field("w1", pa.string()),
                           pa.field("w2", pa.string()),
                           pa.field("c", pa.int64())])
    lt_schema = pa.schema([pa.field("w1", pa.string()),
                           pa.field("cw1", pa.int64()),
                           pa.field("n1p_fwd", pa.int64())])
    rt_schema = pa.schema([pa.field("w2", pa.string()),
                           pa.field("n1p_rev", pa.int64())])
    j = hash_join(bgf, lt, on="w1", right_on="w1",
                  right_cols=["cw1", "n1p_fwd"], num_parts=num_parts,
                  left_schema=bg_schema, right_schema=lt_schema)
    j_schema = pa.schema(list(bg_schema) + [pa.field("cw1", pa.int64()),
                                            pa.field("n1p_fwd", pa.int64())])
    j = hash_join(j, rt, on="w2", right_on="w2", right_cols=["n1p_rev"],
                  num_parts=num_parts, left_schema=j_schema,
                  right_schema=rt_schema)

    D = float(discount)

    def fin(b: pa.Table) -> pa.Table:
        c = b.column("c").to_numpy().astype(np.float64)
        cw1 = b.column("cw1").to_numpy().astype(np.float64)
        nf = b.column("n1p_fwd").to_numpy().astype(np.float64)
        nr = b.column("n1p_rev").to_numpy().astype(np.float64)
        # literal oracle evaluation order (left-to-right):
        # max(c-D,0)/cw1 + D*nf/cw1*(nr/n_types)
        p = np.maximum(c - D, 0.0) / cw1 + D * nf / cw1 * (nr / n_types)
        return pa.table({"w1": b.column("w1"), "w2": b.column("w2"),
                         "c": b.column("c"),
                         "p_kn": pa.array(np.round(p, round_to),
                                          type=pa.float64())})

    return j.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)
