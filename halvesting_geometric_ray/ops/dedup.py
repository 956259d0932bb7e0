"""Exact distinct / dedup — the D1/D2 operators of SURVEY.md section 2.6.

Reference: ``drop_duplicates()`` on edge pairs and node rows
(link_prediction_metadata.py:228,250-252,277,383,393,403,418).

Scale pattern: a cheap per-batch local dedup first (combiner — shrinks
the shuffle), then hash-partition on the key set and dedup per partition.
Skewed keys are irrelevant for distinct (each partition holds distinct
rows only), so no salting needed here.
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa

from ..functions.hashing import stable_hash64, stable_hash_pair64
from ._util import cast_like, pre_shuffle

_PART_COL = "__part"


def _local_distinct(batch: pa.Table, keys: List[str]) -> pa.Table:
    import polars as pl

    return cast_like(pl.from_arrow(batch).unique(subset=keys, keep="any").to_arrow(),
                     batch.schema)


def _add_key_part(batch: pa.Table, keys: List[str], num_parts: int) -> pa.Table:
    if len(keys) == 1:
        h = stable_hash64(batch.column(keys[0]))
    else:
        h = stable_hash_pair64(batch.column(keys[0]), batch.column(keys[1]))
        for k in keys[2:]:
            h = stable_hash_pair64(pa.array(h), batch.column(k))
    return batch.append_column(_PART_COL, pa.array(h % num_parts, type=pa.int32()))


def distinct(ds, keys: List[str], num_parts: int = 16,
             select: Optional[List[str]] = None, sort_within: bool = True):
    """Globally exact distinct rows by `keys` (keeping only `keys`/`select`
    columns).  Deterministic output set under any parallelism."""
    cols = select or keys

    def prep(b: pa.Table) -> pa.Table:
        b = b.select(cols)
        b = _local_distinct(b, keys)
        return _add_key_part(b, keys, num_parts)

    def per_part(g: pa.Table) -> pa.Table:
        import polars as pl

        out = pl.from_arrow(g.select(cols)).unique(subset=keys, keep="any")
        if sort_within:
            out = out.sort(keys)
        return cast_like(out.to_arrow(), g.schema)

    prepped = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return (pre_shuffle(prepped).groupby(_PART_COL)
            .map_groups(per_part, batch_format="pyarrow",
                        retry_exceptions=True))


def line_dedup(docs, id_col: str = "doc_id", text_col: str = "text",
               sep: str = "\n", num_parts: int = 16):
    """C4-style cross-document LINE dedup (the "three-sentence span"
    dedup of the C4 paper, at line granularity): each distinct non-blank
    line is kept only at its FIRST in-document occurrence in the
    document with the MINIMAL id; every other copy corpus-wide is
    dropped.  Documents retaining zero lines are omitted.

    Returns (id_col, text_dedup) where text_dedup re-joins the kept
    lines in original order.

    Scale shape — two key-partitioned exchanges, both combined first:
    1. explode lines vectorized (polars split/explode; a document's
       lines never span batches, so in-document first-occurrence dedup
       is batch-local), then a batch-level WINNOW: within a batch only
       the min-id copy of each line can win globally (any other copy
       already loses to it), so the shuffle carries at most one row per
       (batch, line) — boilerplate lines collapse before they move;
    2. hash-partition by line -> min-id winner per line (one
       `sort + unique` per partition — no join back: the winner row
       already carries its document position);
    3. hash-partition by id -> re-join kept lines per document in
       position order.
    """
    import polars as pl

    def explode_winnow(b: pa.Table) -> pa.Table:
        df = (pl.from_arrow(b.select([id_col, text_col]))
              .with_columns(pl.col(text_col).str.split(sep).alias("__ls"))
              .with_columns(pl.int_ranges(pl.col("__ls").list.len())
                            .alias("__pos"))
              .explode(["__ls", "__pos"])
              .rename({"__ls": "line", "__pos": "pos"})
              .filter(pl.col("line").str.strip_chars().str.len_bytes() > 0)
              # in-document first occurrence (explode preserves order)
              .unique(subset=[id_col, "line"], keep="first",
                      maintain_order=True)
              # batch winnow: min-id copy per line
              .sort(id_col, maintain_order=True)
              .unique(subset=["line"], keep="first", maintain_order=True)
              .select([id_col, "line", "pos"]))
        want = pa.schema([pa.field(id_col, pa.int64()),
                          pa.field("line", pa.string()),
                          pa.field("pos", pa.int64())])
        return _add_key_part(cast_like(df.to_arrow(), want), ["line"],
                             num_parts)

    def winners(g: pa.Table) -> pa.Table:
        df = (pl.from_arrow(g.drop_columns([_PART_COL]))
              .sort(id_col, maintain_order=True)
              .unique(subset=["line"], keep="first", maintain_order=True))
        t = cast_like(df.to_arrow(), g.schema.remove(
            g.schema.get_field_index(_PART_COL)))
        return _add_key_part(t, [id_col], num_parts)

    def rebuild(g: pa.Table) -> pa.Table:
        df = (pl.from_arrow(g.drop_columns([_PART_COL]))
              .sort([id_col, "pos"])
              .group_by(id_col, maintain_order=True)
              .agg(pl.col("line"))
              .with_columns(pl.col("line").list.join(sep)
                            .alias("text_dedup"))
              .select([id_col, "text_dedup"])
              .sort(id_col))
        want = pa.schema([pa.field(id_col, pa.int64()),
                          pa.field("text_dedup", pa.string())])
        return cast_like(df.to_arrow(), want)

    exploded = docs.map_batches(explode_winnow, batch_format="pyarrow",
                                zero_copy_batch=True)
    won = (pre_shuffle(exploded).groupby(_PART_COL)
           .map_groups(winners, batch_format="pyarrow",
                       retry_exceptions=True))
    return (pre_shuffle(won).groupby(_PART_COL)
            .map_groups(rebuild, batch_format="pyarrow",
                        retry_exceptions=True))


def _flat_tokens(ids, texts):
    """Whitespace-tokenize a batch: returns (doc_row per token, token
    strings as a polars Series, tokens-per-doc lengths)."""
    import numpy as np
    import polars as pl

    s = pl.Series("t", texts).str.extract_all(r"\S+")
    lens = s.list.len().fill_null(0).to_numpy().astype(np.int64)
    flat = s.explode().drop_nulls()
    rowidx = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
    return rowidx, flat, lens


def _gram_hashes(tok_hash, doc_row, n: int):
    """Polynomial n-gram hashes over the flattened token-hash array;
    windows crossing document boundaries are dropped.  Returns
    (gram:int64 view, window start flat index, valid mask over starts)."""
    import numpy as np

    T = tok_hash.size
    if T < n:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    with np.errstate(over="ignore"):
        B = np.uint64(0x100000001B3)
        powers = np.empty(n, dtype=np.uint64)
        powers[n - 1] = 1
        for j in range(n - 2, -1, -1):
            powers[j] = powers[j + 1] * B
        W = np.lib.stride_tricks.sliding_window_view(
            tok_hash.astype(np.uint64), n)
        gram = (W * powers).sum(axis=1).view(np.int64)
    valid = doc_row[: T - n + 1] == doc_row[n - 1:]
    starts = np.flatnonzero(valid)
    return gram[starts], starts


def span_dedup(docs, n: int = 5, min_count: int = 2,
               id_col: str = "doc_id", text_col: str = "text",
               num_parts: int = 16, hash_seed: int = 42):
    """Duplicate n-gram SPAN dedup — the scalable variant of exact
    substring deduplication (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better"; RefinedWeb/MassiveText use the
    same shape): any whitespace n-gram occurring >= ``min_count`` times
    corpus-wide is removed from every document EXCEPT its one keeper
    occurrence — the globally-first (min doc id, then min position) —
    so exactly one copy of each duplicated span survives.

    Exact semantics certified by the pytest oracle
    (tests/test_text_dedup.py): coverage is the UNION of all hot
    non-keeper windows [i, i+n); a keeper's tokens can still fall to an
    OVERLAPPING hot occurrence.  Output text re-joins kept tokens with
    single spaces (whitespace-canonical).  Token identity is a 64-bit
    stable hash; gram identity a 64-bit polynomial over token hashes —
    collisions are ~2^-64 per pair and would only ever remove a
    non-duplicated span (conservative direction for training data).

    Scale shape:
    1. count pass — per-batch VECTORIZED grams (sliding window over the
       flattened token-hash array, document-boundary windows masked)
       combined per batch (one row per distinct gram per batch), then
       one key-partitioned grouped aggregate {count: sum, keeper: min};
    2. the hot set (count >= min_count) is collected and broadcast via
       ``ray.put`` as two sorted arrays — at web scale boilerplate
       n-grams are a tiny fraction of distinct n-grams; if the hot set
       outgrows a broadcast, swap in ops/sketch.bloom_build (documented
       fallback, false-positives remove a few extra spans);
    3. mask pass — searchsorted membership per window, coverage via a
       diff/cumsum over the flat token array, per-document string
       rebuild in polars (Rust list.join).

    Returns (id_col, text_dedup, kept_tokens, removed_tokens) — one row
    per input document (fully-removed documents keep an empty string).
    """
    import numpy as np
    import polars as pl
    import pyarrow as pa
    import ray

    from .agg import grouped_aggregate

    KEY_POS_BITS = 32

    def gram_partial(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy()
        if ids.size and (ids.min() < 0 or ids.max() >= (1 << 62 - KEY_POS_BITS)):
            raise ValueError("doc ids must fit the keeper key encoding")
        rowidx, flat, lens = _flat_tokens(ids, b.column(text_col))
        th = stable_hash64(flat.to_arrow(), seed=hash_seed)
        gram, starts = _gram_hashes(th, rowidx, n)
        empty = pa.table({"gram": pa.array([], type=pa.int64()),
                          "cnt": pa.array([], type=pa.int64()),
                          "keeper": pa.array([], type=pa.int64())})
        if gram.size == 0:
            return empty
        # position of each window start within its document
        doc_start = np.concatenate([[0], np.cumsum(lens)])[:-1]
        pos = starts - doc_start[rowidx[starts]]
        if pos.size and int(pos.max()) >= (1 << KEY_POS_BITS):
            raise ValueError("document too long for keeper key encoding")
        keeper = (ids[rowidx[starts]] << KEY_POS_BITS) | pos
        df = (pl.DataFrame({"gram": gram, "keeper": keeper})
              .group_by("gram")
              .agg(cnt=pl.len().cast(pl.Int64), keeper=pl.col("keeper").min()))
        return df.select(["gram", "cnt", "keeper"]).to_arrow().cast(empty.schema)

    partials = docs.map_batches(gram_partial, batch_format="pyarrow",
                                zero_copy_batch=True)
    hot_tbl = (grouped_aggregate(partials, ["gram"],
                                 {"cnt": ("sum", "cnt"),
                                  "keeper": ("min", "keeper")},
                                 num_parts=num_parts)
               .map_batches(lambda t: t.filter(
                   pa.compute.greater_equal(t["cnt"], min_count)),
                   batch_format="pyarrow", zero_copy_batch=True))
    hot_pdf = hot_tbl.to_pandas()
    if len(hot_pdf) == 0:  # empty datasets can drop their schema
        hg = np.empty(0, dtype=np.int64)
        hk = np.empty(0, dtype=np.int64)
    else:
        hg = hot_pdf["gram"].to_numpy()
        hk = hot_pdf["keeper"].to_numpy()
    order = np.argsort(hg, kind="stable")
    hot_ref = ray.put((hg[order], hk[order]))

    def mask(b: pa.Table) -> pa.Table:
        hot_gram, hot_keeper = ray.get(hot_ref)
        ids = b.column(id_col).to_numpy()
        rowidx, flat, lens = _flat_tokens(ids, b.column(text_col))
        th = stable_hash64(flat.to_arrow(), seed=hash_seed)
        gram, starts = _gram_hashes(th, rowidx, n)
        T = th.size
        covered = np.zeros(T + 1, dtype=np.int64)
        if gram.size and hot_gram.size:
            j = np.searchsorted(hot_gram, gram)
            j_cl = np.minimum(j, hot_gram.size - 1)
            is_hot = hot_gram[j_cl] == gram
            doc_start = np.concatenate([[0], np.cumsum(lens)])[:-1]
            pos = starts - doc_start[rowidx[starts]]
            key = (ids[rowidx[starts]] << KEY_POS_BITS) | pos
            remove = is_hot & (hot_keeper[j_cl] != key)
            s = starts[remove]
            np.add.at(covered, s, 1)
            np.add.at(covered, s + n, -1)
        cov = np.cumsum(covered[:-1]) > 0
        kept_mask = ~cov
        kept_per_doc = np.bincount(rowidx[kept_mask], minlength=len(ids)) \
            if T else np.zeros(len(ids), dtype=np.int64)
        rebuilt = (pl.DataFrame({"__row": rowidx[kept_mask],
                                 "__tok": flat.filter(
                                     pl.Series(kept_mask))})
                   .group_by("__row", maintain_order=False)
                   .agg(pl.col("__tok").str.join(" ").alias("text_dedup")))
        texts = np.full(len(ids), "", dtype=object)
        texts[rebuilt["__row"].to_numpy()] = rebuilt["text_dedup"].to_numpy()
        return pa.table({
            id_col: b.column(id_col),
            "text_dedup": pa.array(texts, type=pa.string()),
            "kept_tokens": pa.array(kept_per_doc.astype(np.int64)),
            "removed_tokens": pa.array((lens - kept_per_doc).astype(np.int64)),
        })

    return docs.map_batches(mask, batch_format="pyarrow",
                            zero_copy_batch=True)


def _flat_chars(ids, texts):
    """Per-batch flattened Unicode codepoint stream: returns
    (rowidx int64, flat_cp uint32, lens int64) — the character-level
    analogue of _flat_tokens (utf-32 decode is a C-level codec pass
    per document)."""
    import numpy as np

    tl = texts.to_pylist()
    arrs = [np.frombuffer((t or "").encode("utf-32-le"), dtype=np.uint32)
            for t in tl]
    lens = np.fromiter((a.size for a in arrs), dtype=np.int64,
                       count=len(arrs))
    flat = np.concatenate(arrs) if arrs else np.empty(0, dtype=np.uint32)
    rowidx = np.repeat(np.arange(len(arrs), dtype=np.int64), lens)
    return rowidx, flat, lens


def substring_dedup(docs, min_len: int = 50, min_count: int = 2,
                    id_col: str = "doc_id", text_col: str = "text",
                    num_parts: int = 16, hash_seed: int = 42):
    """EXACT substring deduplication at character granularity — the
    distributed formulation of Lee et al. 2022's suffix-array dedup
    ("Deduplicating Training Data Makes Language Models Better",
    their ExactSubstr at threshold ``min_len``).

    Anchor identity: a duplicated substring of length >= min_len
    contains, at every alignment, a duplicated min_len-gram — so
    marking every occurrence of each corpus-duplicated min_len-gram
    EXCEPT its globally-first (min doc id, then min position) keeper,
    and removing the union of the marked [pos, pos + min_len) windows,
    yields output in which no substring of length >= min_len occurs
    twice (keeper occurrences aside) — the same guarantee the
    suffix-array scan provides, without materializing suffixes.  A
    suffix array is O(8x corpus) memory on one machine; this is two
    streaming passes and ONE grouped exchange of per-batch-combined
    (gram, count, keeper) triples, so it shards like every other
    operator here.

    Semantics pinned by the independent per-position pytest oracle
    (tests/test_substring_dedup.py): coverage is the union of hot
    non-keeper windows; keepers can still lose characters to
    OVERLAPPING hot windows (exactly as in span_dedup / Lee et al.'s
    interval cutting).  Gram identity is a 64-bit polynomial over
    per-character stable hashes — a collision (~2^-64 per pair) only
    ever removes a non-duplicated span, the conservative direction for
    training data.

    Returns one row per document:
    (id_col, text_dedup, kept_chars, removed_chars).
    """
    import numpy as np
    import polars as pl
    import pyarrow as pa
    import ray

    from .agg import grouped_aggregate

    if min_len < 2:
        raise ValueError("min_len must be >= 2")
    KEY_POS_BITS = 32
    n = min_len

    def gram_partial(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy()
        if ids.size and (ids.min() < 0
                         or ids.max() >= (1 << 62 - KEY_POS_BITS)):
            raise ValueError("doc ids must fit the keeper key encoding")
        rowidx, flat, lens = _flat_chars(ids, b.column(text_col))
        empty = pa.table({"gram": pa.array([], type=pa.int64()),
                          "cnt": pa.array([], type=pa.int64()),
                          "keeper": pa.array([], type=pa.int64())})
        if flat.size < n:
            return empty
        ch = stable_hash64(flat, seed=hash_seed)
        gram, starts = _gram_hashes(ch, rowidx, n)
        if gram.size == 0:
            return empty
        doc_start = np.concatenate([[0], np.cumsum(lens)])[:-1]
        pos = starts - doc_start[rowidx[starts]]
        if pos.size and int(pos.max()) >= (1 << KEY_POS_BITS):
            raise ValueError("document too long for keeper key encoding")
        keeper = (ids[rowidx[starts]] << KEY_POS_BITS) | pos
        df = (pl.DataFrame({"gram": gram, "keeper": keeper})
              .group_by("gram")
              .agg(cnt=pl.len().cast(pl.Int64),
                   keeper=pl.col("keeper").min()))
        return df.select(["gram", "cnt", "keeper"]).to_arrow().cast(
            empty.schema)

    partials = docs.map_batches(gram_partial, batch_format="pyarrow",
                                zero_copy_batch=True)
    hot_tbl = (grouped_aggregate(partials, ["gram"],
                                 {"cnt": ("sum", "cnt"),
                                  "keeper": ("min", "keeper")},
                                 num_parts=num_parts)
               .map_batches(lambda t: t.filter(
                   pa.compute.greater_equal(t["cnt"], min_count)),
                   batch_format="pyarrow", zero_copy_batch=True))
    hot_pdf = hot_tbl.to_pandas()
    if len(hot_pdf) == 0:  # empty datasets can drop their schema
        hg = np.empty(0, dtype=np.int64)
        hk = np.empty(0, dtype=np.int64)
    else:
        hg = hot_pdf["gram"].to_numpy()
        hk = hot_pdf["keeper"].to_numpy()
    order = np.argsort(hg, kind="stable")
    hot_ref = ray.put((hg[order], hk[order]))

    def mask(b: pa.Table) -> pa.Table:
        hot_gram, hot_keeper = ray.get(hot_ref)
        ids = b.column(id_col).to_numpy()
        rowidx, flat, lens = _flat_chars(ids, b.column(text_col))
        T = flat.size
        covered = np.zeros(T + 1, dtype=np.int64)
        if T >= n and hot_gram.size:
            ch = stable_hash64(flat, seed=hash_seed)
            gram, starts = _gram_hashes(ch, rowidx, n)
            if gram.size:
                j = np.searchsorted(hot_gram, gram)
                j_cl = np.minimum(j, hot_gram.size - 1)
                is_hot = hot_gram[j_cl] == gram
                doc_start = np.concatenate([[0], np.cumsum(lens)])[:-1]
                pos = starts - doc_start[rowidx[starts]]
                key = (ids[rowidx[starts]] << KEY_POS_BITS) | pos
                remove = is_hot & (hot_keeper[j_cl] != key)
                s = starts[remove]
                np.add.at(covered, s, 1)
                np.add.at(covered, s + n, -1)
        kept_mask = np.cumsum(covered[:-1]) <= 0
        kept_per_doc = np.bincount(
            rowidx[kept_mask], minlength=len(ids)).astype(np.int64) \
            if T else np.zeros(len(ids), dtype=np.int64)
        doc_start = np.concatenate([[0], np.cumsum(lens)])
        texts = []
        for i in range(len(ids)):
            seg = flat[doc_start[i]:doc_start[i + 1]]
            km = kept_mask[doc_start[i]:doc_start[i + 1]]
            texts.append(seg[km].tobytes().decode("utf-32-le"))
        return pa.table({
            id_col: b.column(id_col),
            "text_dedup": pa.array(texts, type=pa.string()),
            "kept_chars": pa.array(kept_per_doc),
            "removed_chars": pa.array(
                (lens - kept_per_doc).astype(np.int64)),
        })

    return docs.map_batches(mask, batch_format="pyarrow",
                            zero_copy_batch=True)


def keep_min_by(ds, key_cols: List[str], order_col,
                num_parts: int = 16):
    """Keep, per distinct `key_cols` value, exactly the row with the
    MINIMAL `order_col` (the deterministic-winner subset-key dedup:
    "first copy by id wins").  `order_col` may be a list of columns for
    a lexicographic order (e.g. Boruvka's (w, u, v) total edge order).
    One key-partitioned exchange; the combiner keeps only each batch's
    local winner per key, so duplicate mass collapses before it moves.
    Full rows pass through."""
    import polars as pl

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    ords = [order_col] if isinstance(order_col, str) else list(order_col)

    def local(b: pa.Table) -> pa.Table:
        df = (pl.from_arrow(b).sort(keys + ords)
              .unique(subset=keys, keep="first", maintain_order=True))
        t = cast_like(df.to_arrow(), b.schema)
        return _add_key_part(t, keys, num_parts)

    def per_part(g: pa.Table) -> pa.Table:
        df = (pl.from_arrow(g.drop_columns([_PART_COL]))
              .sort(keys + ords)
              .unique(subset=keys, keep="first", maintain_order=True))
        want = g.schema.remove(g.schema.get_field_index(_PART_COL))
        return cast_like(df.to_arrow(), want)

    prepped = ds.map_batches(local, batch_format="pyarrow",
                             zero_copy_batch=True)
    return (pre_shuffle(prepped).groupby(_PART_COL)
            .map_groups(per_part, batch_format="pyarrow",
                        retry_exceptions=True))


def subset_dup_losers(ds, key_cols, order_col: str, num_parts: int = 16):
    """The LOSER ids of a deterministic-winner subset dedup: for every
    distinct `key_cols` value, each row's `order_col` EXCEPT the
    minimum.  Project to (keys, order_col) before calling — only those
    columns move, so deduping a corpus never ships the payload (pair
    with a broadcast anti semi-join on the loser set; see
    pipelines/curation.py).

    Combiner insight: a row that is not even its BATCH's minimum for
    its key is already a global loser — it is emitted locally and never
    shuffled; only per-batch winners (≈ distinct keys per batch rows)
    enter the exchange, where the global minimum wins and the rest
    drain as losers."""
    import polars as pl

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    cols = keys + [order_col]

    out_schema = pa.schema([pa.field(order_col, pa.int64())])

    def local(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select(cols))
        win = (df.sort(cols).unique(subset=keys, keep="first",
                                    maintain_order=True)
               .with_columns(pl.lit(False).alias("__loser")))
        lose = df.join(win.select(keys + [order_col]), on=cols,
                       how="anti").with_columns(
            pl.lit(True).alias("__loser"))
        t = pl.concat([win, lose]).to_arrow()
        t = cast_like(t, pa.schema(
            [b.schema.field(c) for c in cols]
            + [pa.field("__loser", pa.bool_())]))
        return _add_key_part(t, keys, num_parts)

    def per_part(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g.drop_columns([_PART_COL]))
        sure = df.filter(pl.col("__loser")).select([order_col])
        cand = df.filter(~pl.col("__loser"))
        lose2 = (cand.sort(cols)
                 .with_columns((pl.int_range(pl.len()).over(keys) > 0)
                               .alias("__l"))
                 .filter(pl.col("__l")).select([order_col]))
        out = pl.concat([sure, lose2]).to_arrow()
        return cast_like(out, out_schema)

    prepped = ds.map_batches(local, batch_format="pyarrow",
                             zero_copy_batch=True)
    return (pre_shuffle(prepped).groupby(_PART_COL)
            .map_groups(per_part, batch_format="pyarrow",
                        retry_exceptions=True))


def ngram_decontaminate(docs, bench, *, n: int = 13,
                        id_col: str = "doc_id", text_col: str = "text",
                        hash_seed: int = 42):
    """Benchmark decontamination at n-gram granularity — the GPT-3 /
    PaLM method (Brown et al. 2020 appendix C: drop training docs
    sharing any 13-gram with an eval example; q_decontaminate's
    whole-document fingerprint only catches verbatim copies).

    bench: the benchmark/eval document table (same id/text columns).
    Returns (id_col, contaminated: bool, n_hits: int64) — one row per
    input doc; n_hits = number of contaminated n-gram windows.

    Scale shape: the benchmark side collapses to its DISTINCT gram
    hashes per batch (one combine) and is collected + broadcast once
    via ray.put — eval suites are tiny next to a crawl; if a benchmark
    ever outgrows a broadcast, build a Bloom over the same hashes
    (ops/sketch.py::bloom_build, false positives drop extra docs —
    conservative).  The corpus side is one stateless vectorized pass:
    sliding-window gram hashes + searchsorted membership.  Gram
    identity is the 64-bit polynomial over token hashes shared with
    span_dedup — collisions (~2^-64/pair) only ever REMOVE a clean doc.
    """
    import numpy as np

    import ray

    if n < 1:
        raise ValueError("n must be >= 1")

    def bench_grams(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy()
        rowidx, flat, _ = _flat_tokens(ids, b.column(text_col))
        th = stable_hash64(flat.to_arrow(), seed=hash_seed)
        gram, _ = _gram_hashes(th, rowidx, n)
        return pa.table({"gram": pa.array(np.unique(gram))})

    parts = []
    for t in bench.map_batches(bench_grams, batch_format="pyarrow",
                               zero_copy_batch=True).iter_batches(
                                   batch_format="pyarrow"):
        if t.num_rows:
            parts.append(t.column("gram").to_numpy())
    bg = np.unique(np.concatenate(parts)) if parts else \
        np.empty(0, dtype=np.int64)
    ref = ray.put(bg)

    def flag(b: pa.Table) -> pa.Table:
        bench_set = ray.get(ref)
        ids = b.column(id_col).to_numpy()
        hits = np.zeros(ids.size, dtype=np.int64)
        if ids.size and bench_set.size:
            rowidx, flat, lens = _flat_tokens(ids, b.column(text_col))
            th = stable_hash64(flat.to_arrow(), seed=hash_seed)
            gram, starts = _gram_hashes(th, rowidx, n)
            if gram.size:
                ix = np.searchsorted(bench_set, gram)
                ok = (ix < bench_set.size) & \
                    (bench_set[np.minimum(ix, bench_set.size - 1)] == gram)
                np.add.at(hits, rowidx[starts[ok]], 1)
        return pa.table({id_col: b.column(id_col),
                         "contaminated": pa.array(hits > 0),
                         "n_hits": pa.array(hits)})

    return docs.map_batches(flag, batch_format="pyarrow",
                            zero_copy_batch=True)


def boilerplate_strip(docs, group_col: str = "source",
                      id_col: str = "doc_id", text_col: str = "text",
                      min_docs: int = 2, sep: str = "\n",
                      num_parts: int = 16,
                      broadcast_cap: int = 20_000_000):
    """Group-scoped boilerplate-line removal — the template-stripping
    pass of web curation (nav bars, footers, cookie banners: lines
    repeated across a HOST's pages, cf. the C4/RefinedWeb cleaning
    recipes).  A non-blank line is boilerplate within a `group_col`
    value (host / source / template family) when it occurs in >=
    `min_docs` DISTINCT documents of that group; every copy of a
    boilerplate line is stripped from that group's documents (unlike
    line_dedup, which keeps one global winner copy).  Documents
    retaining zero lines are omitted.  Returns (id_col, text_clean)
    with kept lines re-joined in original order.

    Scale shape: the counting side moves only per-batch PARTIAL
    (group, line, ndocs) rows (a document's lines never span batches,
    so distinct-doc partials sum exactly) into one combiner-backed
    grouped sum; the boilerplate key set — frequent lines only, tiny
    relative to the corpus — broadcasts for an anti semi-join under
    `broadcast_cap`, falling back to a bucketed hash-join anti past
    it; one final id-partitioned exchange reassembles documents.
    Driver state is bounded by the broadcast cap, never O(corpus).
    """
    import polars as pl

    from .agg import grouped_aggregate
    from .join import broadcast_semi, hash_join

    sepcol = "\x00"  # cannot appear inside a line (line split on sep)

    def explode(b: pa.Table) -> pa.Table:
        df = (pl.from_arrow(b.select([group_col, id_col, text_col]))
              .with_columns(pl.col(text_col).str.split(sep).alias("__ls"))
              .with_columns(pl.int_ranges(pl.col("__ls").list.len())
                            .alias("__pos"))
              .explode(["__ls", "__pos"])
              .rename({"__ls": "line", "__pos": "pos"})
              .filter(pl.col("line").str.strip_chars().str.len_bytes() > 0)
              .with_columns((pl.col(group_col) + pl.lit(sepcol)
                             + pl.col("line")).alias("__k"))
              .select([id_col, "line", "pos", "__k"]))
        want = pa.schema([pa.field(id_col, pa.int64()),
                          pa.field("line", pa.string()),
                          pa.field("pos", pa.int64()),
                          pa.field("__k", pa.string())])
        return cast_like(df.to_arrow(), want)

    exploded = docs.map_batches(explode, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()

    def partials(b: pa.Table) -> pa.Table:
        df = (pl.from_arrow(b.select([id_col, "__k"]))
              .unique(subset=[id_col, "__k"])
              .group_by("__k").agg(pl.len().cast(pl.Int64).alias("nd")))
        return cast_like(df.to_arrow(),
                         pa.schema([pa.field("__k", pa.string()),
                                    pa.field("nd", pa.int64())]))

    counts = grouped_aggregate(
        exploded.map_batches(partials, batch_format="pyarrow",
                             zero_copy_batch=True),
        ["__k"], {"ndocs": ("sum", "nd")}, num_parts=num_parts)
    boiler = counts.filter(expr=f"ndocs >= {int(min_docs)}") \
                   .select_columns(["__k"]).materialize()

    n_boiler = boiler.count()
    if n_boiler == 0:  # nothing repeated: every exploded row survives
        kept = exploded
    elif n_boiler <= broadcast_cap:
        kept = broadcast_semi(exploded, "__k",
                              pa.concat_tables(list(boiler.iter_batches(
                                  batch_format="pyarrow"))),
                              "__k", anti=True)
    else:  # bucketed anti: left join an indicator, keep the misses
        marked = boiler.map_batches(
            lambda b: b.append_column(
                "__hit", pa.array([1] * b.num_rows, type=pa.int64())),
            batch_format="pyarrow", zero_copy_batch=True)
        j = hash_join(
            exploded, marked, on="__k", right_on="__k",
            join_type="left", num_parts=num_parts,
            left_schema=pa.schema([pa.field(id_col, pa.int64()),
                                   pa.field("line", pa.string()),
                                   pa.field("pos", pa.int64()),
                                   pa.field("__k", pa.string())]),
            right_schema=pa.schema([pa.field("__k", pa.string()),
                                    pa.field("__hit", pa.int64())]))

        def misses(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return b.filter(pc.is_null(b.column("__hit"))) \
                    .drop_columns(["__hit"])

        kept = j.map_batches(misses, batch_format="pyarrow",
                             zero_copy_batch=True)

    def to_parts(b: pa.Table) -> pa.Table:
        return _add_key_part(b.drop_columns(["__k"]), [id_col], num_parts)

    def rebuild(g: pa.Table) -> pa.Table:
        df = (pl.from_arrow(g.drop_columns([_PART_COL]))
              .sort([id_col, "pos"])
              .group_by(id_col, maintain_order=True)
              .agg(pl.col("line"))
              .with_columns(pl.col("line").list.join(sep)
                            .alias("text_clean"))
              .select([id_col, "text_clean"])
              .sort(id_col))
        want = pa.schema([pa.field(id_col, pa.int64()),
                          pa.field("text_clean", pa.string())])
        return cast_like(df.to_arrow(), want)

    parts = kept.map_batches(to_parts, batch_format="pyarrow",
                             zero_copy_batch=True)
    return (pre_shuffle(parts).groupby(_PART_COL)
            .map_groups(rebuild, batch_format="pyarrow",
                        retry_exceptions=True))
