"""Partitioned window functions — lead/lag/row_number over
(PARTITION BY k ORDER BY o) windows.

The reference is pure batch with no window operators; these complete
the relational surface next to the existing tumbling/sliding/session
windows (queries_relational.py) and grouped top-k (ops/topk.py, the
rank-with-cutoff special case).

Scale shape: ONE key-partitioned exchange — partition keys hash into
``num_parts`` groups (all rows of a window key co-locate; different
keys share a group harmlessly), then polars computes the window inside
each group with Rust ``shift().over()`` / ``int_range().over()``
kernels.  Results are deterministic iff (order_by + tie_break) totally
orders each window — same contract as ops/topk.grouped_top_k.

Skew note: one window key's rows all land in one group task (inherent
to window semantics); a pathological hot key (one user with 10^9
events) needs range-splitting ON order_by with boundary stitching —
out of scope, raise the issue at the caller (same guidance as the
reference-era sessionize operator).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import pyarrow as pa

from ._util import cast_like, pre_shuffle
from ..functions.hashing import stable_hash64, stable_hash_pair64

_PART = "__wpart"


def _add_part(b: pa.Table, keys: List[str], num_parts: int) -> pa.Table:
    # parquet-read tables carry b'pandas' schema metadata that this
    # pyarrow version can't hash — Ray's sort-reduce schema dedup then
    # warns "Failed to hash the schemas" on every merge; strip it.
    b = b.replace_schema_metadata(None)
    if len(keys) == 1:
        h = stable_hash64(b.column(keys[0]))
    else:
        h = stable_hash_pair64(b.column(keys[0]), b.column(keys[1]))
        for k in keys[2:]:
            h = stable_hash_pair64(pa.array(h), b.column(k))
    return b.append_column(_PART, pa.array(h % num_parts, type=pa.int32()))


def lead_lag(ds, partition_by, order_by, shifts: Dict[str, int],
             tie_break: Optional[List[str]] = None, num_parts: int = 16):
    """SQL ``lead/lag(col, n) OVER (PARTITION BY ... ORDER BY ...)``.

    ``shifts``: {output_name: (col, n)} with n > 0 = lag (previous
    rows), n < 0 = lead.  Appends one column per entry (null at window
    edges).  ``tie_break`` extends order_by to a total order.
    """
    import polars as pl

    pkeys = [partition_by] if isinstance(partition_by, str) \
        else list(partition_by)
    okeys = [order_by] if isinstance(order_by, str) else list(order_by)
    sort_keys = okeys + list(tie_break or [])

    for name, (col, n) in shifts.items():
        if not isinstance(n, int) or n == 0:
            raise ValueError(f"shift for {name} must be a non-zero int")

    def per_part(g: pa.Table) -> pa.Table:
        df = (pl.from_arrow(g.drop_columns([_PART]))
              .sort(pkeys + sort_keys, maintain_order=True))
        df = df.with_columns([
            pl.col(col).shift(n).over(pkeys).alias(name)
            for name, (col, n) in shifts.items()])
        want = g.schema.remove(g.schema.get_field_index(_PART))
        for name, (col, n) in shifts.items():
            want = want.append(pa.field(name, g.schema.field(col).type))
        return cast_like(df.to_arrow(), want)

    prepped = ds.map_batches(lambda b: _add_part(b, pkeys, num_parts),
                             batch_format="pyarrow", zero_copy_batch=True)
    return (pre_shuffle(prepped).groupby(_PART)
            .map_groups(per_part, batch_format="pyarrow",
                        retry_exceptions=True))


def sessionize(ds, partition_by, order_by, gap_us: int,
               tie_break: Optional[List[str]] = None,
               num_parts: int = 16, out_col: str = "session_idx"):
    """Gap-based sessionization: within each partition key, rows
    ordered by ``order_by`` (a timestamp column) start a NEW session
    whenever the gap to the previous row exceeds ``gap_us``
    microseconds (strict >).  Appends ``out_col`` = 0-based session
    index per key — the classic web-log session operator.

    Same one-exchange scale shape and determinism contract as
    lead_lag above (order_by + tie_break must totally order each key's
    rows).  gap comparisons are integer microseconds, so semantics are
    exact and match the SQL ``lag(ts) ... CASE WHEN ts - prev >
    INTERVAL`` oracle form bit-for-bit.
    """
    import polars as pl

    pkeys = [partition_by] if isinstance(partition_by, str) \
        else list(partition_by)
    okeys = [order_by] if isinstance(order_by, str) else list(order_by)
    if len(okeys) != 1:
        raise ValueError("sessionize orders by exactly one timestamp col")
    tcol = okeys[0]
    if gap_us <= 0:
        raise ValueError("gap_us must be positive")
    sort_keys = okeys + list(tie_break or [])

    def per_part(g: pa.Table) -> pa.Table:
        df = (pl.from_arrow(g.drop_columns([_PART]))
              .sort(pkeys + sort_keys, maintain_order=True))
        prev = pl.col(tcol).shift(1).over(pkeys)
        brk = ((pl.col(tcol) - prev).dt.total_microseconds()
               > gap_us).fill_null(True)
        df = df.with_columns(
            (brk.cast(pl.Int64).cum_sum().over(pkeys) - 1)
            .alias(out_col))
        want = g.schema.remove(g.schema.get_field_index(_PART)) \
            .append(pa.field(out_col, pa.int64()))
        return cast_like(df.to_arrow(), want)

    prepped = ds.map_batches(lambda b: _add_part(b, pkeys, num_parts),
                             batch_format="pyarrow", zero_copy_batch=True)
    return (pre_shuffle(prepped).groupby(_PART)
            .map_groups(per_part, batch_format="pyarrow",
                        retry_exceptions=True))


def merge_intervals(ds, partition_by, start_col: str, end_col: str, *,
                    gap: int = 0, num_parts: int = 16,
                    out_cols=("span_start", "span_end", "n_merged")):
    """Flatten overlapping intervals per key (SQL gaps-and-islands):
    sort each key's intervals by (start, end) and chain-merge every
    interval whose start <= running max(end) + gap; emit one row per
    merged span with (min start, max end, source-interval count).
    The classic crawl-window / session-span / IP-range coalescer.

    Exact island semantics (matches the DuckDB window-function oracle
    bit-for-bit): new island iff the running max of PRIOR ends is null
    or start > prev_max + gap — so touching intervals (start == prior
    end) merge at gap=0, and end < start rows degrade gracefully to
    the same formula.  NULL start/end rows are dropped (SQL aggregate
    semantics).  start/end may be any numeric type or timestamp[us]
    (timestamps compute on epoch microseconds internally — ``gap`` is
    then microseconds — and round-trip to the input dtype).

    Scale shape: one key-partitioned exchange of (keys, start, end)
    rows; every key's intervals land in ONE hash bucket and the merge
    is a vectorized segmented cum_max/cum_sum — no per-group loop, no
    second shuffle.  Output is one row per merged span (<= input).
    """
    import polars as pl

    pkeys = [partition_by] if isinstance(partition_by, str) \
        else list(partition_by)
    if not pkeys:
        raise ValueError("merge_intervals needs at least one key")
    if start_col == end_col:
        raise ValueError("start_col and end_col must differ")
    s_out, e_out, n_out = out_cols

    def per_part(g: pa.Table) -> pa.Table:
        src = g.drop_columns([_PART]).select(pkeys + [start_col, end_col])
        want = pa.schema(
            [src.schema.field(k) for k in pkeys] +
            [pa.field(s_out, src.schema.field(start_col).type),
             pa.field(e_out, src.schema.field(end_col).type),
             pa.field(n_out, pa.int64())])
        df = (pl.from_arrow(src)
              .drop_nulls(subset=[start_col, end_col]))
        if df.height == 0:
            return want.empty_table()
        temporal = []
        for c in (start_col, end_col):  # temporal -> epoch us ints
            if isinstance(df.schema[c], pl.Datetime):
                temporal.append(c)
                df = df.with_columns(
                    pl.col(c).cast(pl.Datetime("us"))
                    .dt.timestamp("us").alias(c))
        df = (df.sort(pkeys + [start_col, end_col], maintain_order=True)
              .with_columns(pl.col(end_col).cum_max().shift(1)
                            .over(pkeys).alias("__pm"))
              .with_columns((pl.col(start_col) > pl.col("__pm") + gap)
                            .fill_null(True).alias("__new"))
              .with_columns(pl.col("__new").cast(pl.Int64).cum_sum()
                            .over(pkeys).alias("__isl")))
        out = (df
               .group_by(pkeys + ["__isl"], maintain_order=True)
               .agg(pl.col(start_col).min().alias(s_out),
                    pl.col(end_col).max().alias(e_out),
                    pl.len().cast(pl.Int64).alias(n_out))
               .drop("__isl"))
        # epoch-us ints back to Datetime("us"); cast_like then widens
        # to the input's own unit (int64 -> timestamp would otherwise
        # reinterpret the integers in the target unit)
        redo = [o for c, o in ((start_col, s_out), (end_col, e_out))
                if c in temporal]
        if redo:
            out = out.with_columns(
                [pl.col(o).cast(pl.Datetime("us")) for o in redo])
        return cast_like(out.to_arrow(), want)

    prepped = ds.map_batches(lambda b: _add_part(b, pkeys, num_parts),
                             batch_format="pyarrow", zero_copy_batch=True)
    return (pre_shuffle(prepped).groupby(_PART)
            .map_groups(per_part, batch_format="pyarrow",
                        retry_exceptions=True))


def row_number(ds, partition_by, order_by, descending: bool = False,
               tie_break: Optional[List[str]] = None,
               out_col: str = "rn", num_parts: int = 16,
               method: str = "row_number"):
    """SQL ``row_number() / rank() / dense_rank() OVER (PARTITION BY ...
    ORDER BY ...)`` (1-based; pick with ``method``).  row_number needs a
    tie_break for determinism; rank/dense_rank are tie-stable without
    one.  For rank-with-cutoff use ops/topk.grouped_top_k (bounded
    exchange)."""
    import polars as pl

    if method not in ("row_number", "rank", "dense_rank"):
        raise ValueError(f"unknown window method {method!r}")

    pkeys = [partition_by] if isinstance(partition_by, str) \
        else list(partition_by)
    okeys = [order_by] if isinstance(order_by, str) else list(order_by)
    ties = list(tie_break or [])

    def per_part(g: pa.Table) -> pa.Table:
        df = (pl.from_arrow(g.drop_columns([_PART]))
              .sort(pkeys + okeys + ties,
                    descending=[False] * len(pkeys)
                    + [descending] * len(okeys) + [False] * len(ties),
                    maintain_order=True))
        if method == "row_number":
            expr = pl.int_range(pl.len()).over(pkeys) + 1
        else:
            # rank the struct of order columns (ties = equal order key,
            # regardless of tie_break sorting)
            key = pl.struct([pl.col(c) for c in okeys])
            meth = "min" if method == "rank" else "dense"
            expr = key.rank(meth, descending=descending).over(pkeys)
        df = df.with_columns(expr.cast(pl.Int64).alias(out_col))
        want = g.schema.remove(g.schema.get_field_index(_PART)).append(
            pa.field(out_col, pa.int64()))
        return cast_like(df.to_arrow(), want)

    prepped = ds.map_batches(lambda b: _add_part(b, pkeys, num_parts),
                             batch_format="pyarrow", zero_copy_batch=True)
    return (pre_shuffle(prepped).groupby(_PART)
            .map_groups(per_part, batch_format="pyarrow",
                        retry_exceptions=True))


def ntile(ds, partition_by, order_by, n: int,
          tie_break: Optional[List[str]] = None, out_col: str = "tile",
          descending: bool = False, num_parts: int = 16):
    """SQL ``ntile(n) OVER (PARTITION BY ... ORDER BY ...)`` (1-based):
    rows of each window split into n rank bands, larger bands first —
    same one-exchange shape as row_number."""
    import polars as pl

    if n < 1:
        raise ValueError("n must be >= 1")

    pkeys = [partition_by] if isinstance(partition_by, str) \
        else list(partition_by)
    okeys = [order_by] if isinstance(order_by, str) else list(order_by)
    ties = list(tie_break or [])

    def per_part(g: pa.Table) -> pa.Table:
        df = (pl.from_arrow(g.drop_columns([_PART]))
              .sort(pkeys + okeys + ties,
                    descending=[False] * len(pkeys)
                    + [descending] * len(okeys) + [False] * len(ties),
                    maintain_order=True))
        # SQL ntile: first (cnt % n) tiles get ceil(cnt/n) rows
        rn = pl.int_range(pl.len()).over(pkeys)
        cnt = pl.len().over(pkeys)
        base, rem = cnt // n, cnt % n
        big = rem * (base + 1)
        tile = pl.when(rn < big).then(rn // (base + 1)) \
            .otherwise(rem + (rn - big) // pl.max_horizontal(base, 1)) + 1
        df = df.with_columns(tile.cast(pl.Int64).alias(out_col))
        want = g.schema.remove(g.schema.get_field_index(_PART)).append(
            pa.field(out_col, pa.int64()))
        return cast_like(df.to_arrow(), want)

    prepped = ds.map_batches(lambda b: _add_part(b, pkeys, num_parts),
                             batch_format="pyarrow", zero_copy_batch=True)
    return (pre_shuffle(prepped).groupby(_PART)
            .map_groups(per_part, batch_format="pyarrow",
                        retry_exceptions=True))


def cumulative(ds, partition_by, order_by, aggs: Dict[str, tuple],
               tie_break: Optional[List[str]] = None, num_parts: int = 16):
    """Running window aggregates — SQL ``sum/min/max/count(col) OVER
    (PARTITION BY k ORDER BY o ROWS UNBOUNDED PRECEDING)``.

    ``aggs``: {output_name: (col, fn)} with fn in {"sum", "min", "max",
    "count", "mean"}.  Same one-exchange scale shape as lead_lag.
    """
    import polars as pl

    fns = {"sum": lambda c: c.cum_sum(), "min": lambda c: c.cum_min(),
           "max": lambda c: c.cum_max(),
           "count": lambda c: c.cum_count().cast(pl.Int64),
           "mean": lambda c: c.cum_sum() / c.cum_count()}
    for name, (col, fn) in aggs.items():
        if fn not in fns:
            raise ValueError(f"unknown cumulative fn {fn!r} for {name}")

    pkeys = [partition_by] if isinstance(partition_by, str) \
        else list(partition_by)
    okeys = [order_by] if isinstance(order_by, str) else list(order_by)
    sort_keys = okeys + list(tie_break or [])

    def per_part(g: pa.Table) -> pa.Table:
        df = (pl.from_arrow(g.drop_columns([_PART]))
              .sort(pkeys + sort_keys, maintain_order=True))
        df = df.with_columns([
            fns[fn](pl.col(col)).over(pkeys).alias(name)
            for name, (col, fn) in aggs.items()])
        out = df.to_arrow()
        want = g.schema.remove(g.schema.get_field_index(_PART))
        for name, (col, fn) in aggs.items():
            want = want.append(pa.field(name, out.schema.field(name).type))
        return cast_like(out, want)

    prepped = ds.map_batches(lambda b: _add_part(b, pkeys, num_parts),
                             batch_format="pyarrow", zero_copy_batch=True)
    return (pre_shuffle(prepped).groupby(_PART)
            .map_groups(per_part, batch_format="pyarrow",
                        retry_exceptions=True))


def relative_rank(ds, partition_by, order_by,
                  method="percent_rank",
                  out_col: Optional[str] = None, descending: bool = False,
                  num_parts: int = 16):
    """SQL ``percent_rank() / cume_dist() OVER (PARTITION BY ... ORDER
    BY ...)``.  ``method`` is either one function name (output column
    ``out_col or method``) or a {out_col: method} dict computing several
    relative ranks in ONE exchange.

    percent_rank = (rank_min - 1) / (window_rows - 1)  (0.0 for a
    single-row window, the Postgres/DuckDB convention); cume_dist =
    rank_max / window_rows.  Both are ratios of small ints computed in
    float64, so they hash-match any engine evaluating the same formula
    — no rounding discipline needed (unlike the moment aggregates).
    Tie rows receive identical values by construction, so no tie_break
    is required for determinism.  Same one-exchange scale shape as
    row_number above."""
    import polars as pl

    if isinstance(method, str):
        outs = {out_col or method: method}
    else:  # {out_col: method} — both functions in ONE exchange
        outs = dict(method)
    for m in outs.values():
        if m not in ("percent_rank", "cume_dist"):
            raise ValueError(f"unknown relative rank method {m!r}")

    pkeys = [partition_by] if isinstance(partition_by, str) \
        else list(partition_by)
    okeys = [order_by] if isinstance(order_by, str) else list(order_by)

    def per_part(g: pa.Table) -> pa.Table:
        df = (pl.from_arrow(g.drop_columns([_PART]))
              .sort(pkeys + okeys,
                    descending=[False] * len(pkeys)
                    + [descending] * len(okeys), maintain_order=True))
        key = pl.struct([pl.col(c) for c in okeys])
        n = pl.len().over(pkeys).cast(pl.Float64)
        exprs = []
        for name, m in outs.items():
            if m == "percent_rank":
                r = key.rank("min", descending=descending).over(pkeys) \
                       .cast(pl.Float64)
                e = pl.when(n > 1).then((r - 1.0) / (n - 1.0)).otherwise(0.0)
            else:
                r = key.rank("max", descending=descending).over(pkeys) \
                       .cast(pl.Float64)
                e = r / n
            exprs.append(e.alias(name))
        df = df.with_columns(exprs)
        want = g.schema.remove(g.schema.get_field_index(_PART))
        for name in outs:
            want = want.append(pa.field(name, pa.float64()))
        return cast_like(df.to_arrow(), want)

    prepped = ds.map_batches(lambda b: _add_part(b, pkeys, num_parts),
                             batch_format="pyarrow", zero_copy_batch=True)
    return (pre_shuffle(prepped).groupby(_PART)
            .map_groups(per_part, batch_format="pyarrow",
                        retry_exceptions=True))


def window_value(ds, partition_by, order_by, cols,
                 which: str = "first",
                 tie_break: Optional[List[str]] = None,
                 descending: bool = False, num_parts: int = 16):
    """SQL ``first_value(col) / last_value(col) OVER (PARTITION BY ...
    ORDER BY ... ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED
    FOLLOWING)`` — every row of a window receives the partition's
    first/last value under the (order_by + tie_break) total order.

    The FULL frame is used deliberately: SQL's default frame makes
    ``last_value`` the current row (the classic gotcha); the
    unbounded frame is the semantics people actually want and the one
    an oracle must spell out explicitly.  ``cols`` is a column name, a
    {out_col: col} dict, or a {out_col: (col, "first"|"last")} dict
    mixing both kinds — all computed in ONE exchange.  Same
    one-key-partitioned-exchange scale shape as row_number."""
    import polars as pl

    if which not in ("first", "last"):
        raise ValueError(f"unknown window_value kind {which!r}")
    if isinstance(cols, str):
        outs = {f"{which}_{cols}": (cols, which)}
    else:
        outs = {name: (v if isinstance(v, tuple) else (v, which))
                for name, v in cols.items()}
    for _, (_, kk) in outs.items():
        if kk not in ("first", "last"):
            raise ValueError(f"unknown window_value kind {kk!r}")
    pkeys = [partition_by] if isinstance(partition_by, str) \
        else list(partition_by)
    okeys = [order_by] if isinstance(order_by, str) else list(order_by)
    ties = list(tie_break or [])

    def per_part(g: pa.Table) -> pa.Table:
        df = (pl.from_arrow(g.drop_columns([_PART]))
              .sort(pkeys + okeys + ties,
                    descending=[False] * len(pkeys)
                    + [descending] * len(okeys) + [False] * len(ties),
                    maintain_order=True))
        exprs = []
        for name, (c, kk) in outs.items():
            e = pl.col(c).first() if kk == "first" else pl.col(c).last()
            exprs.append(e.over(pkeys).alias(name))
        df = df.with_columns(exprs)
        want = g.schema.remove(g.schema.get_field_index(_PART))
        for name, (c, _) in outs.items():
            want = want.append(pa.field(name, g.schema.field(c).type))
        return cast_like(df.to_arrow(), want)

    prepped = ds.map_batches(lambda b: _add_part(b, pkeys, num_parts),
                             batch_format="pyarrow", zero_copy_batch=True)
    return (pre_shuffle(prepped).groupby(_PART)
            .map_groups(per_part, batch_format="pyarrow",
                        retry_exceptions=True))
