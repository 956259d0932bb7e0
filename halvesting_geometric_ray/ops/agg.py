"""Fast grouped aggregation: per-batch combiner + hash-partitioned final.

Ray Data's built-in ``groupby().aggregate(...)`` runs a row-oriented
reduce that measures ~20x slower than a vectorized two-level plan
(39s vs 2s on 3M rows / 32 CPUs, measured).  This is the engine's
standard aggregate: polars partial aggregation inside each batch (the
combiner — shrinks the shuffle to ~num_groups x num_blocks rows), then
hash-partition on the key and a polars final merge per partition.

Supported ops: count, sum, min, max (count partials re-aggregate with
sum).  Output column names are exactly the caller's aliases.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import pyarrow as pa

from ..functions.hashing import stable_hash64, stable_hash_pair64
from ._util import cast_like, pre_shuffle

_PART = "__agg_part"

_PARTIAL_FINAL = {
    "count": ("count", "sum"),
    "sum": ("sum", "sum"),
    "min": ("min", "min"),
    "max": ("max", "max"),
}


def grouped_aggregate(ds, keys: List[str],
                      aggs: Dict[str, Tuple[str, Optional[str]]],
                      num_parts: int = 16):
    """aggs: {out_name: (op, col)} with op in count/sum/min/max
    (col=None for count).  Returns a Dataset with columns keys + aliases."""
    import polars as pl

    def _exprs(stage: int):
        out = []
        for name, (op, col) in aggs.items():
            pop, fop = _PARTIAL_FINAL[op]
            o = pop if stage == 0 else fop
            src = name if stage == 1 else col
            if stage == 0 and op == "count":
                out.append(pl.len().cast(pl.Int64).alias(name))
            else:
                e = pl.col(src)
                e = {"sum": e.sum(), "min": e.min(), "max": e.max(),
                     "count": e.len()}[o]
                out.append(e.alias(name))
        return out

    def partial(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        out = df.group_by(keys).agg(_exprs(0))
        t = cast_like(out.to_arrow(), b.schema)
        if len(keys) == 1:
            h = stable_hash64(t.column(keys[0]))
        else:
            h = stable_hash_pair64(t.column(keys[0]), t.column(keys[1]))
            for k in keys[2:]:
                h = stable_hash_pair64(pa.array(h), t.column(k))
        return t.append_column(_PART, pa.array(h % num_parts, type=pa.int32()))

    def final(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g.drop_columns([_PART]))
        out = df.group_by(keys).agg(_exprs(1))
        return cast_like(out.to_arrow(), g.schema)

    prepped = ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
    return (pre_shuffle(prepped).groupby(_PART)
            .map_groups(final, batch_format="pyarrow",
                        retry_exceptions=True))


def rollup_aggregate(ds, keys: List[str],
                     aggs: Dict[str, Tuple[str, Optional[str]]],
                     num_parts: int = 16):
    """SQL ``GROUP BY ROLLUP(keys...)``: the aggregate at every key
    PREFIX — (k1, k2, ..., kn), (k1, ..., k(n-1)), ..., (k1), () — with
    nulls in the rolled-up columns.

    Scale shape: the finest level runs the normal two-level
    grouped_aggregate over the DATA once; every coarser level
    re-aggregates the PREVIOUS level's (group-cardinality-sized) output
    — sum/min/max/count re-aggregate losslessly (count partials re-sum,
    matching _PARTIAL_FINAL), so the raw data is read exactly once.
    """
    if not keys:
        raise ValueError("rollup needs at least one key")
    for name, (op, _col) in aggs.items():
        if op not in _PARTIAL_FINAL:
            raise ValueError(f"unsupported rollup op {op!r} for {name}")

    levels = []
    # materialize: the union below would otherwise RE-EXECUTE the full
    # raw-data lineage once per level (Ray Data shares no common
    # subplans); the finest level is group-cardinality-sized, so
    # pinning it in the object store is safe at any data scale
    finest = grouped_aggregate(ds, keys, aggs,
                               num_parts=num_parts).materialize()
    levels.append(finest)
    # coarser levels: re-aggregate the previous level's output, with
    # count partials re-summed (the standard partial/final split)
    reagg = {name: (_PARTIAL_FINAL[op][1], name)
             for name, (op, _c) in aggs.items()}
    prev = finest
    for i in range(len(keys) - 1, -1, -1):
        sub = keys[:i]
        if sub:
            lvl = grouped_aggregate(prev, sub, reagg, num_parts=num_parts)
        else:
            import polars as pl

            def total(b: pa.Table, _names=tuple(reagg)) -> pa.Table:
                df = pl.from_arrow(b)
                exprs = []
                for name in _names:
                    fop = reagg[name][0]
                    e = pl.col(name)
                    exprs.append({"sum": e.sum(), "min": e.min(),
                                  "max": e.max()}[fop].alias(name))
                return df.select(exprs).to_arrow().cast(
                    pa.schema([b.schema.field(n) for n in _names]))

            lvl = prev.repartition(1).map_batches(
                total, batch_format="pyarrow", batch_size=None,
                zero_copy_batch=True)
        levels.append(lvl)
        prev = lvl

    # align schemas: missing key columns become typed nulls
    finest_schema = None

    def pad(level_keys):
        def fn(b: pa.Table) -> pa.Table:
            cols = {}
            for k in keys:
                if k in level_keys:
                    cols[k] = b.column(k)
                else:
                    cols[k] = pa.nulls(b.num_rows,
                                       type=finest_schema.field(k).type)
            for name in aggs:
                cols[name] = b.column(name)
            return pa.table(cols)
        return fn

    # key types come from the INPUT schema (metadata-only for parquet
    # reads); probing finest.schema() would execute part of the plan
    in_schema = ds.schema().base_schema
    finest_schema = pa.schema([in_schema.field(k) for k in keys])
    out = levels[0]
    for i, lvl in enumerate(levels[1:]):
        lk = keys[:len(keys) - 1 - i]
        out = out.union(lvl.map_batches(pad(lk), batch_format="pyarrow",
                                        zero_copy_batch=True))
    return out


def grouped_collect(ds, keys: List[str], col: str, *,
                    as_string: bool = False, sep: str = ",",
                    sort_items: bool = True, max_items: int = 0,
                    out_col: str = "items", num_parts: int = 16):
    """SQL ``list(col ORDER BY col)`` / ``string_agg(col, sep ORDER BY
    col)`` per group: collect each group's values into a list column
    (or a sep-joined string with ``as_string`` — the engine-exact form
    a SQL oracle can hash).

    One key-partitioned exchange of (keys, col) rows; assembly is a
    vectorized lexsort + reduceat per partition.  ``max_items`` > 0
    truncates each group's SORTED list (top-by-order guard for hub
    keys — 0 = unbounded, the caller owns the skew risk)."""
    if not keys:
        raise ValueError("grouped_collect needs at least one key")

    import numpy as np
    import polars as pl

    def local(b: pa.Table) -> pa.Table:
        t = b.select(keys + [col])
        if len(keys) == 1:
            h = stable_hash64(t.column(keys[0]))
        else:
            h = stable_hash_pair64(t.column(keys[0]), t.column(keys[1]))
            for k in keys[2:]:
                h = stable_hash_pair64(pa.array(h), t.column(k))
        return t.append_column(_PART, pa.array(
            np.asarray(h) % num_parts, type=pa.int32()))

    def per_part(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g.drop_columns([_PART]))
        expr = pl.col(col)
        if sort_items:
            expr = expr.sort()
        if max_items > 0:
            expr = expr.head(max_items)
        out = df.group_by(keys).agg(expr.alias(out_col))
        if as_string:
            out = out.with_columns(
                pl.col(out_col).list.eval(
                    pl.element().cast(pl.String)).list.join(sep))
        t = out.to_arrow()
        want_fields = [g.schema.field(k) for k in keys] + [
            pa.field(out_col, pa.string() if as_string
                     else pa.list_(g.schema.field(col).type))]
        return cast_like(t, pa.schema(want_fields))

    prepped = ds.map_batches(local, batch_format="pyarrow",
                             zero_copy_batch=True)
    return (pre_shuffle(prepped).groupby(_PART)
            .map_groups(per_part, batch_format="pyarrow",
                        retry_exceptions=True))


def grouping_sets_aggregate(ds, keys: List[str], sets: List[List[str]],
                            aggs: Dict[str, Tuple[str, Optional[str]]],
                            num_parts: int = 16):
    """SQL ``GROUP BY GROUPING SETS / CUBE``: the aggregate at each
    requested key subset, with nulls in the absent key columns.

    Same lossless re-aggregation plan as rollup_aggregate: the full key
    set runs the two-level grouped_aggregate over the DATA once; every
    requested subset re-aggregates that group-cardinality-sized output
    (sum/min/max re-apply, count partials re-SUM), so the raw data is
    read exactly once no matter how many sets are requested.  CUBE(k...)
    is ``sets=[all subsets]`` (see cube_aggregate below).

    Scale shape: cost = one data pass + len(sets) aggregations over
    tables of at most num_groups rows — at web scale the subsets are
    effectively free next to the data pass."""
    if not keys:
        raise ValueError("grouping sets need at least one key")
    seen = set()
    norm_sets = []
    for s in sets:
        s = list(s)
        if not set(s) <= set(keys):
            raise ValueError(f"grouping set {s} not a subset of {keys}")
        key = tuple(sorted(s))
        if key in seen:
            raise ValueError(f"duplicate grouping set {s}")
        seen.add(key)
        norm_sets.append(s)
    for name, (op, _col) in aggs.items():
        if op not in _PARTIAL_FINAL:
            raise ValueError(f"unsupported grouping-sets op {op!r} for {name}")

    # materialized for the same reason as rollup_aggregate: every
    # requested set's union branch would re-read the raw data otherwise
    finest = grouped_aggregate(ds, keys, aggs,
                               num_parts=num_parts).materialize()
    reagg = {name: (_PARTIAL_FINAL[op][1], name)
             for name, (op, _c) in aggs.items()}

    from ._util import arrow_schema_of

    in_schema = arrow_schema_of(ds)
    key_schema = pa.schema([in_schema.field(k) for k in keys])

    def pad(level_keys):
        def fn(b: pa.Table) -> pa.Table:
            cols = {}
            for k in keys:
                if k in level_keys:
                    cols[k] = b.column(k)
                else:
                    cols[k] = pa.nulls(b.num_rows,
                                       type=key_schema.field(k).type)
            for name in aggs:
                cols[name] = b.column(name)
            return pa.table(cols)
        return fn

    import polars as pl

    def total(b: pa.Table, _names=tuple(reagg)) -> pa.Table:
        df = pl.from_arrow(b)
        exprs = []
        for name in _names:
            fop = reagg[name][0]
            e = pl.col(name)
            exprs.append({"sum": e.sum(), "min": e.min(),
                          "max": e.max()}[fop].alias(name))
        return df.select(exprs).to_arrow().cast(
            pa.schema([b.schema.field(n) for n in _names]))

    out = None
    for s in norm_sets:
        if set(s) == set(keys):
            lvl = finest
        elif s:
            lvl = grouped_aggregate(finest, s, reagg, num_parts=num_parts)
        else:
            lvl = finest.repartition(1).map_batches(
                total, batch_format="pyarrow", batch_size=None,
                zero_copy_batch=True)
        padded = lvl.map_batches(pad(s), batch_format="pyarrow",
                                 zero_copy_batch=True)
        out = padded if out is None else out.union(padded)
    return out


def cube_aggregate(ds, keys: List[str],
                   aggs: Dict[str, Tuple[str, Optional[str]]],
                   num_parts: int = 16):
    """SQL ``GROUP BY CUBE(keys...)``: all 2^len(keys) grouping sets."""
    from itertools import combinations

    sets = [list(c) for r in range(len(keys), -1, -1)
            for c in combinations(keys, r)]
    return grouping_sets_aggregate(ds, keys, sets, aggs,
                                   num_parts=num_parts)
