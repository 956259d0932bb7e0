"""Funnel analysis — ordered multi-step conversion over an event log.

The classic product-analytics operator: given events (user, type, ts)
and an ordered step list [A, B, ...], a user "reaches" step i when an
event of type steps[i] occurs STRICTLY AFTER their earliest completion
of step i-1 (earliest-completion semantics: t_0 = min ts of A, t_i =
min ts of steps[i] with ts > t_{i-1}); an optional ``within_us``
conversion window additionally requires t_i <= t_0 + within_us.  The
semantics are the standard "windowFunnel" definition and are exactly
expressible in SQL as a chain of min-aggregation joins, which is the
DuckDB oracle form q_funnel_events certifies against.

Scale shape: ONE key-partitioned exchange (hash on the user column —
every user's events co-locate; the reference-era sessionize shape),
then per-bucket polars: k-1 in-bucket join+min passes for a k-step
funnel.  Per-user output is one row; funnel_counts reduces that to a
<= k-row table via per-bucket partial counts + one tiny groupby — no
driver-side iteration over users.  The reference has no event
operators; this completes the web-log family next to sessionize /
tumbling / retention (reference scope: halvesting_geometric's batch
metadata passes, link_prediction_metadata.py).
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa

from ._util import pre_shuffle
from .window import _add_part, _PART


def funnel_users(ds, user_col: str, type_col: str, ts_col: str,
                 steps: List[str], within_us: Optional[int] = None,
                 num_parts: int = 16):
    """Per-user funnel depth: one row per user that reached step 1,
    columns (user_col, step_reached:int64 in 1..len(steps),
    t_first:ts of step-1 completion, t_last:ts of deepest completion).
    """
    import polars as pl

    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct")
    if within_us is not None and within_us <= 0:
        raise ValueError("within_us must be positive")
    steps = list(steps)

    def per_part(g: pa.Table) -> pa.Table:
        ev = pl.from_arrow(g.drop_columns([_PART])).select(
            [user_col, type_col, ts_col])
        # step 1: earliest occurrence per user
        cur = (ev.filter(pl.col(type_col) == steps[0])
               .group_by(user_col)
               .agg(pl.col(ts_col).min().alias("__t")))
        cur = cur.with_columns(pl.col("__t").alias("__t0"),
                               pl.lit(1, dtype=pl.Int64).alias("__step"))
        out = cur
        for i, s in enumerate(steps[1:], start=2):
            cand = (ev.filter(pl.col(type_col) == s)
                    .join(cur.select([user_col, "__t", "__t0"]),
                          on=user_col, how="inner")
                    .filter(pl.col(ts_col) > pl.col("__t")))
            if within_us is not None:
                cand = cand.filter(
                    (pl.col(ts_col) - pl.col("__t0"))
                    .dt.total_microseconds() <= within_us)
            cur = (cand.group_by(user_col)
                   .agg(pl.col(ts_col).min().alias("__t"),
                        pl.col("__t0").first())
                   .with_columns(pl.lit(i, dtype=pl.Int64)
                                 .alias("__step")))
            if not len(cur):
                break
            # deepest step wins: replace rows for users that advanced
            out = pl.concat([out.filter(
                ~pl.col(user_col).is_in(cur.get_column(user_col))), cur])
        out = out.sort(user_col).rename(
            {"__step": "step_reached", "__t0": "t_first", "__t": "t_last"})
        ts_t = g.schema.field(ts_col).type
        want = pa.schema([g.schema.field(user_col),
                          pa.field("step_reached", pa.int64()),
                          pa.field("t_first", ts_t),
                          pa.field("t_last", ts_t)])
        from ._util import cast_like

        return cast_like(
            out.select([user_col, "step_reached", "t_first", "t_last"])
            .to_arrow(), want)

    prepped = ds.map_batches(lambda b: _add_part(b, [user_col], num_parts),
                             batch_format="pyarrow", zero_copy_batch=True)
    return (pre_shuffle(prepped).groupby(_PART)
            .map_groups(per_part, batch_format="pyarrow",
                        retry_exceptions=True))


def funnel_counts(ds, user_col: str, type_col: str, ts_col: str,
                  steps: List[str], within_us: Optional[int] = None,
                  num_parts: int = 16):
    """Step-level conversion table: (step:int64 1-based, step_name,
    n_users = users whose depth >= step).  Monotone non-increasing by
    construction.  Returns a pyarrow Table (<= len(steps) rows — post-
    reduction, driver-safe)."""
    import numpy as np

    per_user = funnel_users(ds, user_col, type_col, ts_col, steps,
                            within_us=within_us, num_parts=num_parts)

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        agg = pa.TableGroupBy(
            b.select(["step_reached"]), "step_reached").aggregate(
            [("step_reached", "count")])
        return pa.table({
            "step_reached": agg.column("step_reached"),
            "n": pc.cast(agg.column("step_reached_count"), pa.int64())})

    partials = per_user.map_batches(partial, batch_format="pyarrow",
                                    zero_copy_batch=True)
    small = partials.groupby("step_reached").sum("n").to_pandas()
    depth_n = dict(zip(small["step_reached"].astype(int),
                       small["sum(n)"].astype(int)))
    k = len(steps)
    reached = np.zeros(k + 1, dtype=np.int64)
    for d, n in depth_n.items():
        reached[int(d)] = n
    # n_users at step i = users with depth >= i (suffix sum)
    suffix = np.cumsum(reached[::-1])[::-1]
    return pa.table({
        "step": pa.array(np.arange(1, k + 1), type=pa.int64()),
        "step_name": pa.array(steps, type=pa.string()),
        "n_users": pa.array(suffix[1:], type=pa.int64())})
