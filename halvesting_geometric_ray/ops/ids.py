"""Deterministic dense id assignment (I1 of SURVEY.md section 2.6).

The reference assigns ids with ``df.index`` after reset_index — which it
itself documents as wrong across dask partitions
(reference link_prediction_metadata.py:349-353,385,395,404,420).  We make
ids a deterministic bijection `key -> 0..N-1` under ANY parallelism:

hash mode (the scale path):
  1. hash-partition keys into `num_parts` buckets (stable hash);
  2. per bucket: global distinct + sort + local_rank (one shuffle);
  3. tiny per-bucket counts -> driver prefix-sum -> per-bucket offsets;
  4. id = offset[bucket] + local_rank (map-side, no second shuffle).
  Ids are dense 0..N-1 and each bucket owns a CONTIGUOUS id range —
  which is exactly the vertex-ownership scheme the CSR shards and the
  iterative analytics use (owner(vid) = searchsorted(offsets, vid)).

sorted mode (small/dimension tables only):
  global sort by key then zip-with-index; ids equal the SQL
  ``row_number() over (order by key) - 1`` — used where an ANSI-SQL
  oracle must reproduce the ids exactly.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa

from ..functions.hashing import stable_hash64
from ._util import cast_like, pre_shuffle

PART_COL = "part"
LOCAL_RANK = "__local_rank"


def assign_dense_ids_hash(ds, key: str, num_parts: int,
                          id_col: str = "vid") -> Tuple["object", np.ndarray]:
    """Returns (ids_ds, offsets) where ids_ds has columns
    (id_col:int64, key, part:int32) and offsets is an int64 array of
    length num_parts+1 with part p owning ids [offsets[p], offsets[p+1]).
    """

    def prep(b: pa.Table) -> pa.Table:
        import polars as pl

        b = b.select([key])
        b = cast_like(pl.from_arrow(b).unique(subset=[key]).to_arrow(), b.schema)  # local combine
        part = stable_hash64(b.column(key)) % num_parts
        return b.append_column(PART_COL, pa.array(part, type=pa.int32()))

    def per_part(g: pa.Table) -> pa.Table:
        import polars as pl

        out = pl.from_arrow(g).unique(subset=[key]).sort(key)
        out = out.with_columns(
            pl.int_range(0, pl.len(), dtype=pl.Int64).alias(LOCAL_RANK)
        )
        return cast_like(out.to_arrow(), g.schema.append(pa.field(LOCAL_RANK, pa.int64())))

    ranked = (
        pre_shuffle(ds.map_batches(prep, batch_format="pyarrow",
                                   zero_copy_batch=True))
        .groupby(PART_COL)
        .map_groups(per_part, batch_format="pyarrow", retry_exceptions=True)
        .materialize()
    )

    # tiny per-batch partial counts -> driver offsets
    def counts(b: pa.Table) -> pa.Table:
        import polars as pl

        c = pl.from_arrow(b.select([PART_COL])).group_by(PART_COL).len()
        return c.rename({"len": "n"}).to_arrow()

    parts_pdf = ranked.map_batches(counts, batch_format="pyarrow").to_pandas()
    sizes = np.zeros(num_parts, dtype=np.int64)
    if len(parts_pdf):  # empty input: zero sizes (offsets all-zero)
        by_part = parts_pdf.groupby(PART_COL)["n"].sum()
        sizes[by_part.index.to_numpy()] = by_part.to_numpy()
    offsets = np.zeros(num_parts + 1, dtype=np.int64)
    np.cumsum(sizes, out=offsets[1:])

    off = offsets  # broadcast via closure capture (tiny)

    def finalize(b: pa.Table) -> pa.Table:
        p = b.column(PART_COL).to_numpy()
        lr = b.column(LOCAL_RANK).to_numpy()
        vid = off[p] + lr
        out = b.drop_columns([LOCAL_RANK])
        return out.append_column(id_col, pa.array(vid, type=pa.int64()))

    ids = ranked.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)
    return ids, offsets


def assign_dense_ids_sorted(ds, key: str, id_col: str = "vid"):
    """Small-data path: ids equal row_number() over (order by key) - 1.

    Coalesces to one block — use only for dimension-scale inputs where
    SQL-identical ids are required (documented trade-off, SURVEY 2.6 I1).
    """
    import polars as pl

    def assign(b: pa.Table) -> pa.Table:
        out = pl.from_arrow(b).unique(subset=[key]).sort(key)
        out = out.with_columns(pl.int_range(0, pl.len(), dtype=pl.Int64).alias(id_col))
        return cast_like(out.to_arrow(), b.schema.append(pa.field(id_col, pa.int64())))

    from .dedup import distinct

    # global distinct first (scales), then a single-block zip-with-index
    d = distinct(ds, [key])
    return d.repartition(1).map_batches(assign, batch_format="pyarrow", batch_size=None)


def owner_of(vids: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Owning partition of each vid under contiguous-range ownership."""
    return (np.searchsorted(offsets, vids, side="right") - 1).astype(np.int32)
