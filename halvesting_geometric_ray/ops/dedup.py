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
