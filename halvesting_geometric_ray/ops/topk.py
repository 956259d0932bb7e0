"""Grouped top-k — top `k` rows per key by an order column.

Two-level plan (the same combiner discipline as ops/agg): each batch
keeps only its own per-key top-k candidates (shrinking the shuffle to
<= k x keys x blocks rows), then a hash-partitioned final selects the
global per-key top-k.  Deterministic total order: (order_col desc|asc,
then the tie-break columns asc), matching SQL
``row_number() OVER (PARTITION BY keys ORDER BY ...)``.
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa

from ..functions.hashing import stable_hash64, stable_hash_pair64
from ._util import cast_like, pre_shuffle

_PART = "__tk_part"


def grouped_top_k(ds, keys: List[str], order_col: str, k: int,
                  descending: bool = True,
                  tie_break: Optional[List[str]] = None,
                  num_parts: int = 16, rank_col: str = "rnk"):
    """Returns the input columns + `rank_col` (1..k per key group).

    `tie_break`: columns that make the order total (ascending); REQUIRED
    for deterministic output when order_col has duplicates.

    CONTRACT: `order_col` must be non-null — polars cum_count skips
    nulls and polars/DuckDB place nulls at opposite sort ends, so null
    order values would break the documented row_number parity.
    """
    import polars as pl

    tb = tie_break or []
    sort_cols = [order_col] + tb
    sort_desc = [descending] + [False] * len(tb)

    def local(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        out = (df.sort(sort_cols, descending=sort_desc)
               .group_by(keys, maintain_order=True).head(k))
        t = cast_like(out.to_arrow(), b.schema)
        if len(keys) == 1:
            h = stable_hash64(t.column(keys[0]))
        else:
            h = stable_hash_pair64(t.column(keys[0]), t.column(keys[1]))
            for c in keys[2:]:
                h = stable_hash_pair64(pa.array(h), t.column(c))
        return t.append_column(_PART, pa.array(h % num_parts, type=pa.int32()))

    def final(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g.drop_columns([_PART]))
        out = (df.sort(sort_cols, descending=sort_desc)
               .group_by(keys, maintain_order=True).head(k)
               .with_columns(pl.col(order_col).cum_count().over(keys)
                             .cast(pl.Int64).alias(rank_col)))
        return cast_like(out.to_arrow(),
                         g.drop_columns([_PART]).schema
                         .append(pa.field(rank_col, pa.int64())))

    prepped = ds.map_batches(local, batch_format="pyarrow",
                             zero_copy_batch=True)
    return (pre_shuffle(prepped).groupby(_PART)
            .map_groups(final, batch_format="pyarrow",
                        retry_exceptions=True))
