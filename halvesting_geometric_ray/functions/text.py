"""Text-analysis operators for training-data pipelines.

Language-ID (marker-token heuristic), token/type counting, quality
scoring, and document fingerprinting — each a vectorized ``map_batches``
UDF over the `documents`-shaped table, with integer-valued outputs so
the DuckDB oracles compare exactly (see queries_text.py).
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa

# marker tokens scored by the language-ID heuristic, alphabetical order
# (tie break = first in this order); synthetic corpora use a closed
# vocabulary, so markers are corpus words — swap for real stopword lists
# on natural text.
LANG_MARKERS = ["a", "data", "spark", "the"]

_FP_BASE = 257
_FP_MOD = (1 << 61) - 1


def token_lists(texts) -> "object":
    import polars as pl

    s = pl.Series("text", texts) if not isinstance(texts, pl.Series) else texts
    return s.str.split(" ")


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, n_uniq) — whitespace tokens and distinct types."""
    import polars as pl

    df = pl.from_arrow(batch.select(["doc_id", "text"]))
    out = df.select(
        pl.col("doc_id"),
        pl.col("text").str.split(" ").list.len().cast(pl.Int64).alias("n_tokens"),
        pl.col("text").str.split(" ").list.n_unique().cast(pl.Int64).alias("n_uniq"),
    )
    return out.to_arrow().cast(pa.schema([
        pa.field("doc_id", pa.int64()), pa.field("n_tokens", pa.int64()),
        pa.field("n_uniq", pa.int64())]))


def langid_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, pred_lang): argmax of marker-token counts, ties -> first
    marker in LANG_MARKERS order, all-zero -> 'none'."""
    import polars as pl

    df = pl.from_arrow(batch.select(["doc_id", "text"]))
    toks = df.select(pl.col("doc_id"),
                     pl.col("text").str.split(" ").alias("t"))
    counts = toks.select(
        pl.col("doc_id"),
        *[pl.col("t").list.count_matches(m).cast(pl.Int64).alias(f"c_{m}")
          for m in LANG_MARKERS])
    arr = np.stack([counts[f"c_{m}"].to_numpy() for m in LANG_MARKERS], axis=1)
    best = np.argmax(arr, axis=0) if arr.ndim == 1 else arr.argmax(axis=1)
    pred = np.array(LANG_MARKERS, dtype=object)[best]
    pred[arr.max(axis=1) == 0] = "none"
    return pa.table({"doc_id": counts["doc_id"].to_numpy(),
                     "pred_lang": pa.array(list(pred), type=pa.string())})


def quality_batch(batch: pa.Table, min_tokens: int = 20,
                  max_tokens: int = 400, min_ttr: int = 30) -> pa.Table:
    """(doc_id, n_chars, n_tokens, ttr_pct, keep) — length + type-token
    ratio gates, integers/bool only.  Defaults match the SQL-oracled
    q_quality thresholds; callers tune them per corpus (the curation
    pipeline exposes them as quality_gates)."""
    import polars as pl

    df = pl.from_arrow(batch.select(["doc_id", "text"]))
    stats = df.select(
        pl.col("doc_id"),
        pl.col("text").str.len_chars().cast(pl.Int64).alias("n_chars"),
        pl.col("text").str.split(" ").list.len().cast(pl.Int64).alias("n_tokens"),
        pl.col("text").str.split(" ").list.n_unique().cast(pl.Int64).alias("n_uniq"),
    )
    t = stats["n_tokens"].to_numpy()
    u = stats["n_uniq"].to_numpy()
    ttr = np.floor(100.0 * u / np.maximum(t, 1)).astype(np.int64)
    keep = (t >= min_tokens) & (t <= max_tokens) & (ttr >= min_ttr)
    return pa.table({
        "doc_id": stats["doc_id"].to_numpy(),
        "n_chars": stats["n_chars"].to_numpy(),
        "n_tokens": t,
        "ttr_pct": ttr,
        "keep": pa.array(keep),
    })


def fingerprint_one(text: str) -> int:
    """Polynomial rolling hash of the utf-8 bytes, mod 2^61-1."""
    h = 0
    for b in text.encode("utf-8"):
        h = (h * _FP_BASE + b) % _FP_MOD
    return h


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    fps = np.fromiter((fingerprint_one(t) for t in texts), dtype=np.int64,
                      count=len(texts))
    return pa.table({"doc_id": batch.column("doc_id"),
                     "fingerprint": pa.array(fps)})


# ---- PII scrubbing / repetition (Gopher-style) -------------------------

# Conservative patterns valid in BOTH the Rust regex engine (polars) and
# RE2 (DuckDB) with identical greedy semantics, so the SQL oracle
# hash-matches the distributed kernel exactly.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?\d[\d-]{7,}\d"


def pii_scrub_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, clean_text, n_emails, n_phones): emails then phones
    replaced by typed placeholders; counts from the ORIGINAL text."""
    import polars as pl

    df = pl.from_arrow(batch.select(["doc_id", "text"]))
    out = df.select(
        pl.col("doc_id"),
        pl.col("text").str.replace_all(EMAIL_RE, "<EMAIL>")
        .str.replace_all(PHONE_RE, "<PHONE>").alias("clean_text"),
        pl.col("text").str.count_matches(EMAIL_RE).cast(pl.Int64)
        .alias("n_emails"),
        pl.col("text").str.count_matches(PHONE_RE).cast(pl.Int64)
        .alias("n_phones"),
    )
    return out.to_arrow().cast(pa.schema([
        pa.field("doc_id", pa.int64()), pa.field("clean_text", pa.string()),
        pa.field("n_emails", pa.int64()), pa.field("n_phones", pa.int64())]))


def repetition_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, top_tok_n, top_ratio_pct): most-frequent-token
    share — the cheap Gopher-style repetition screen."""
    import polars as pl

    df = pl.from_arrow(batch.select(["doc_id", "text"]))
    counts = (df.with_columns(pl.col("text").str.split(" ").alias("tok"))
              .select(["doc_id", "tok"]).explode("tok")
              .group_by(["doc_id", "tok"]).len())
    agg = (counts.group_by("doc_id")
           .agg(pl.col("len").max().cast(pl.Int64).alias("top_tok_n"),
                pl.col("len").sum().cast(pl.Int64).alias("n_tokens")))
    t = agg["n_tokens"].to_numpy()
    top = agg["top_tok_n"].to_numpy()
    pct = np.floor(100.0 * top / np.maximum(t, 1)).astype(np.int64)
    return pa.table({"doc_id": agg["doc_id"].to_numpy().astype(np.int64),
                     "n_tokens": pa.array(t),
                     "top_tok_n": pa.array(top),
                     "top_ratio_pct": pa.array(pct)})


def normalize_text_batch(batch: pa.Table, text_col: str = "text", *,
                         nfc: bool = True, lowercase: bool = True,
                         strip_accents: bool = False,
                         strip_control: bool = True,
                         collapse_ws: bool = True) -> pa.Table:
    """Unicode text normalization — the canonicalizer applied before
    hashing/dedup/tokenization in web-corpus pipelines (NFC so visually
    identical strings hash identically; optional casefold, accent
    strip, control removal, whitespace collapse).

    Entirely polars Rust kernels (str.normalize / replace_all with
    Unicode classes) — no Python per-row work.  NOTE pyarrow 16's
    ``utf8_normalize(form="NFC")`` does NOT compose (e + U+0301 stays
    decomposed — verified), so the NFC steps go through polars.  Exact
    semantics are pinned against a pure-Python unicodedata oracle in
    tests/test_normalize.py; strip_accents = NFD -> drop \\p{Mn} -> NFC
    (the standard diacritic fold).  Output column: ``text_norm``.
    """
    import polars as pl

    s = pl.from_arrow(batch.column(text_col))
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    if strip_control:
        # Cc/Cf except \t \n \r (kept for collapse_ws to treat)
        s = s.str.replace_all(
            r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F\x80-\x9F]|\p{Cf}", "")
    if nfc or strip_accents:
        s = s.str.normalize("NFC")
    if strip_accents:
        s = (s.str.normalize("NFD").str.replace_all(r"\p{Mn}", "")
             .str.normalize("NFC"))
    if lowercase:
        s = s.str.to_lowercase()
    if collapse_ws:
        s = s.str.replace_all(r"\s+", " ").str.strip_chars()
    cols = {n: batch.column(n) for n in batch.column_names
            if n != text_col}
    cols[text_col] = batch.column(text_col)
    cols["text_norm"] = s.to_arrow().cast(pa.string())
    return pa.table(cols)


def compressibility_batch(batch: pa.Table, level: int = 6) -> pa.Table:
    """(doc_id, n_bytes, z_bytes, ratio_pct) — deflate compressibility:
    boilerplate/repetitive text compresses far below natural prose, so
    a low ratio_pct (= 100 * compressed/original) flags machine-
    generated or template pages (the Gopher/C4-adjacent quality
    signal).  zlib is deterministic for a fixed level, so the metric is
    engine-exact; the per-doc zlib.compress call is C-speed (same
    per-row-cost class as fingerprint_batch).  Empty docs get ratio 0.
    """
    import zlib

    texts = batch.column("text").to_pylist()
    nb = np.empty(len(texts), dtype=np.int64)
    zb = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        raw = t.encode("utf-8")
        nb[i] = len(raw)
        zb[i] = len(zlib.compress(raw, level)) if raw else 0
    ratio = np.where(nb > 0, np.floor(100.0 * zb / np.maximum(nb, 1)),
                     0).astype(np.int64)
    return pa.table({"doc_id": batch.column("doc_id"),
                     "n_bytes": pa.array(nb),
                     "z_bytes": pa.array(zb),
                     "ratio_pct": pa.array(ratio)})


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have",
                    "with")


def gopher_rules_batch(batch: pa.Table, *, min_words: int = 20,
                       max_words: int = 100_000,
                       min_mean_len: float = 3.0,
                       max_mean_len: float = 10.0,
                       max_symbol_ratio: float = 0.1,
                       min_alpha_frac: float = 0.8,
                       min_stop_hits: int = 2) -> pa.Table:
    """Gopher quality rules (Rae et al. 2021, 'Scaling Language
    Models', table A1) as one vectorized pass: word count band, mean
    word length band, symbol-to-word ratio ('#' + '...'), fraction of
    words with an alphabetic character, and >= min_stop_hits of the 8
    Gopher stopwords present.  Tokenization is the repo single-space
    convention (== DuckDB string_split).  Counts are exact integers;
    the two ratios are one division each, so the SQL oracle
    (q_gopher_rules) compares hash-exact after fixed rounding.
    min_words defaults to 20 (not the paper's 50) so the synthetic
    gate corpus exercises both branches; the paper thresholds are one
    kwarg away."""
    import polars as pl

    df = pl.from_arrow(batch.select(["doc_id", "text"]))
    toks = pl.col("text").str.split(" ")
    stats = df.select(
        pl.col("doc_id"),
        toks.list.len().cast(pl.Int64).alias("n_words"),
        pl.col("text").str.replace_all(" ", "", literal=True)
        .str.len_chars().cast(pl.Int64).alias("word_chars"),
        pl.col("text").str.count_matches("#", literal=True)
        .cast(pl.Int64).alias("n_hash"),
        pl.col("text").str.count_matches("...", literal=True)
        .cast(pl.Int64).alias("n_ellipsis"),
        toks.list.eval(
            pl.element().str.contains("[A-Za-z]").cast(pl.Int64))
        .list.sum().cast(pl.Int64).alias("n_alpha_words"),
        pl.sum_horizontal(*[
            toks.list.contains(w).cast(pl.Int64)
            for w in GOPHER_STOPWORDS]).cast(pl.Int64)
        .alias("stop_hits"),
    )
    n = stats["n_words"].to_numpy()
    wc = stats["word_chars"].to_numpy()
    sym = stats["n_hash"].to_numpy() + stats["n_ellipsis"].to_numpy()
    alpha = stats["n_alpha_words"].to_numpy()
    hits = stats["stop_hits"].to_numpy()
    nn = np.maximum(n, 1)
    mean_len = wc / nn
    sym_ratio = sym / nn
    alpha_frac = alpha / nn
    keep = ((n >= min_words) & (n <= max_words)
            & (mean_len >= min_mean_len) & (mean_len <= max_mean_len)
            & (sym_ratio < max_symbol_ratio)
            & (alpha_frac > min_alpha_frac)
            & (hits >= min_stop_hits))
    return pa.table({
        "doc_id": stats["doc_id"].to_numpy(),
        "n_words": n,
        "mean_word_len": np.round(mean_len, 6),
        "symbol_ratio": np.round(sym_ratio, 9),
        "alpha_frac": np.round(alpha_frac, 9),
        "stop_hits": hits,
        "keep": pa.array(keep),
    })
