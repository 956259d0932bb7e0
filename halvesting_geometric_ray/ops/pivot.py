"""Pivot (long -> wide conditional aggregation) and unpivot (melt).

The reference's closest shape is the per-language layer split in
build_metadata (one output per language config); pivot generalizes it to
"one COLUMN per category value" — the standard report / feature-matrix
step (tokens-per-language-per-source, events-per-type-per-user).

Scale shape:
- ``pivot``: conditional aggregation — each batch partial-aggregates to
  the wide layout inside ``map_batches`` (the combiner: output rows are
  bounded by distinct index keys per batch, not input rows), then ONE
  hash-partitioned grouped merge via ops/agg.grouped_aggregate.  The
  category domain must be known; pass ``values`` explicitly at scale
  (the discovery fallback runs a distinct pass whose result must fit on
  the driver — fine for enum-ish columns, wrong for unbounded ones, so
  it is capped and errors loudly).
- ``unpivot``: a pure per-batch melt — zero shuffles, rows fan out
  len(value_cols)x.
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa

from .agg import grouped_aggregate

_MAX_DISCOVERED = 1024


def pivot(ds, index, pivot_col: str, value_col: Optional[str] = None,
          agg: str = "count", values: Optional[List] = None,
          prefix: str = "", fill_zero: bool = True, num_parts: int = 16):
    """SQL ``SELECT index, AGG(CASE WHEN pivot_col=v THEN value_col END)
    AS <prefix>v, ... GROUP BY index`` for every v in ``values``.

    agg in {count, sum, min, max}; count needs no value_col.  With
    ``fill_zero`` (default) count/sum cells with no contributing rows
    are 0 (SQL: count(...) / COALESCE(sum(...), 0)); min/max keep NULL.
    """
    import polars as pl

    if agg not in ("count", "sum", "min", "max"):
        raise ValueError(f"unsupported pivot agg {agg!r}")
    if agg != "count" and value_col is None:
        raise ValueError(f"agg={agg!r} requires value_col")

    keys = [index] if isinstance(index, str) else list(index)

    if values is None:
        vals = ds.select_columns([pivot_col]).unique(pivot_col)
        if len(vals) > _MAX_DISCOVERED:
            raise ValueError(
                f"pivot discovered {len(vals)} distinct {pivot_col!r} "
                f"values (cap {_MAX_DISCOVERED}); pass values= explicitly")
        values = sorted(v for v in vals if v is not None)

    names = [f"{prefix}{v}" for v in values]
    if len(set(names)) != len(names):
        raise ValueError("pivot values collide after string conversion")

    def _expr(v):
        flt = pl.col(pivot_col) == v
        if agg == "count":
            return flt.sum().cast(pl.Int64)
        e = pl.col(value_col).filter(flt)
        return {"sum": e.sum(), "min": e.min(), "max": e.max()}[agg]

    cols = list(dict.fromkeys(
        keys + ([value_col] if value_col else []) + [pivot_col]))

    def widen(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select(cols))
        out = df.group_by(keys).agg(
            [_expr(v).alias(n) for v, n in zip(values, names)])
        if agg in ("sum", "count") and fill_zero:
            out = out.with_columns([pl.col(n).fill_null(0) for n in names])
        return out.to_arrow()

    wide = ds.map_batches(widen, batch_format="pyarrow",
                          zero_copy_batch=True)
    merge_op = "sum" if agg in ("count", "sum") else agg
    return grouped_aggregate(wide, keys,
                             {n: (merge_op, n) for n in names},
                             num_parts=num_parts)


def unpivot(ds, id_cols: List[str], value_cols: List[str],
            var_name: str = "variable", value_name: str = "value"):
    """Melt wide columns to (id_cols..., var_name, value_name) rows —
    SQL ``UNPIVOT`` / a UNION ALL of one SELECT per value column.
    Mixed value-column types are promoted to float64."""
    if not value_cols:
        raise ValueError("unpivot needs at least one value column")

    def melt(b: pa.Table) -> pa.Table:
        types = {str(b.schema.field(c).type) for c in value_cols}
        vtype = b.schema.field(value_cols[0]).type if len(types) == 1 \
            else pa.float64()
        parts = []
        for c in value_cols:
            v = b.column(c)
            if v.type != vtype:
                v = v.cast(vtype)
            cols = {k: b.column(k) for k in id_cols}
            cols[var_name] = pa.array([c] * b.num_rows, type=pa.string())
            cols[value_name] = v
            parts.append(pa.table(cols))
        return pa.concat_tables(parts) if parts else b.select(id_cols)

    return ds.map_batches(melt, batch_format="pyarrow",
                          zero_copy_batch=True)
