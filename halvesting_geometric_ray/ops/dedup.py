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
