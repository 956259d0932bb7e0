"""Relational operator conformance queries over the driver testdata.

One entry per operator family of SURVEY.md section 2 (filters F1-F4,
projections P1, joins J1-J7, dedup D1/D2, union U1, id-assign I1,
aggregates G2/G3, explode M1/M6, top-k).  Each Ray pipeline has a
matching ANSI-SQL oracle in ORACLE (same column NAMES — the driver's
compare is order-insensitive but name-sensitive).

Float discipline: aggregate outputs are either integral (counts, keys)
or rounded to 2 decimals on BOTH sides, since the driver value-hashes
exact values and summation order differs between engines.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd
from ray.data.aggregate import Count, Max, Sum

from .config import DEFAULT
from .functions.hashing import stable_hash64
from .ops.agg import grouped_aggregate
from .ops.dedup import distinct
from .ops.ids import assign_dense_ids_sorted
from .ops.join import broadcast_lookup, broadcast_semi, hash_join

QUERIES: Dict[str, Callable] = {}
ORACLE: Dict[str, str] = {}


def _q(name: str, sql: str = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


def _t(sf_dir: str, name: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def _to_cents(ds, cols):
    """Money aggregates -> integer cents (driver value-hashes exactly;
    float summation order differs between engines, ints do not)."""
    def fn(b: pa.Table) -> pa.Table:
        for c in cols:
            v = np.rint(b.column(c).to_numpy() * 100).astype(np.int64)
            b = b.set_column(b.column_names.index(c), c, pa.array(v))
        return b

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---- filters / projections (F2-F4, P1) ---------------------------------

@_q("q_filter_lang",
    "SELECT doc_id, lang, n_chars FROM documents WHERE lang IN ('en','fr')")
def q_filter_lang(sf_dir: str):
    ds = _t(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    return ds.map_batches(
        lambda b: b.filter(pc.is_in(b["lang"], value_set=pa.array(["en", "fr"]))),
        batch_format="pyarrow", zero_copy_batch=True)


@_q("q_filter_daterange",
    "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem "
    "WHERE l_shipdate >= TIMESTAMP '1995-01-01' "
    "AND l_shipdate < TIMESTAMP '1996-01-01'")
def q_filter_daterange(sf_dir: str):
    ds = _t(sf_dir, "lineitem",
            columns=["l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"])
    lo = pa.scalar(np.datetime64("1995-01-01", "us"))
    hi = pa.scalar(np.datetime64("1996-01-01", "us"))

    def fn(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b["l_shipdate"], lo),
                    pc.less(b["l_shipdate"], hi))
        return b.filter(m).select(["l_orderkey", "l_linenumber", "l_quantity"])

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---- grouped aggregate (G3; TPC-H Q1 shape) ----------------------------

@_q("q_pricing_summary",
    "SELECT l_returnflag, l_linestatus, "
    "CAST(round(sum(l_quantity) * 100) AS BIGINT) AS sum_qty, "
    "CAST(round(sum(l_extendedprice) * 100) AS BIGINT) AS sum_base_price, "
    "CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS sum_disc_price, "
    "count(*) AS count_order FROM lineitem GROUP BY l_returnflag, l_linestatus")
def q_pricing_summary(sf_dir: str):
    ds = _t(sf_dir, "lineitem",
            columns=["l_returnflag", "l_linestatus", "l_quantity",
                     "l_extendedprice", "l_discount"])

    def add_rev(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(1.0, b["l_discount"]))
        return b.append_column("disc_price", rev)

    out = grouped_aggregate(
        ds.map_batches(add_rev, batch_format="pyarrow", zero_copy_batch=True),
        ["l_returnflag", "l_linestatus"],
        {"sum_qty": ("sum", "l_quantity"),
         "sum_base_price": ("sum", "l_extendedprice"),
         "sum_disc_price": ("sum", "disc_price"),
         "count_order": ("count", None)})
    return _to_cents(out, ["sum_qty", "sum_base_price", "sum_disc_price"])


# ---- dimension joins (J1-J5: broadcast small side) ---------------------

@_q("q_region_suppliers",
    "SELECT r.r_name AS region, count(*) AS n_suppliers FROM supplier s "
    "JOIN nation n ON s.s_nationkey = n.n_nationkey "
    "JOIN region r ON n.n_regionkey = r.r_regionkey GROUP BY r.r_name")
def q_region_suppliers(sf_dir: str):
    sup = _t(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet",
                           columns=["r_regionkey", "r_name"])
    j = broadcast_lookup(sup, "s_nationkey", nation, "n_nationkey", ["n_regionkey"])
    j = broadcast_lookup(j, "n_regionkey", region, "r_regionkey", ["r_name"])
    out = grouped_aggregate(j, ["r_name"], {"n_suppliers": ("count", None)})
    return out.map_batches(
        lambda b: b.rename_columns(["region", "n_suppliers"]),
        batch_format="pyarrow", zero_copy_batch=True)


# ---- big-big join (J6/J7) ---------------------------------------------

@_q("q_priority_revenue",
    "SELECT o.o_orderpriority AS priority, "
    "CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)) * 100) AS BIGINT) AS revenue, "
    "count(*) AS n_items FROM orders o JOIN lineitem l "
    "ON o.o_orderkey = l.l_orderkey GROUP BY o.o_orderpriority")
def q_priority_revenue(sf_dir: str):
    orders = _t(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    li = _t(sf_dir, "lineitem",
            columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def add_rev(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(1.0, b["l_discount"]))
        return pa.table({"l_orderkey": b["l_orderkey"], "rev": rev})

    li = li.map_batches(add_rev, batch_format="pyarrow", zero_copy_batch=True)
    j = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                  num_parts=DEFAULT.num_parts,
                  left_schema=pa.schema([pa.field("l_orderkey", pa.int64()),
                                         pa.field("rev", pa.float64())]))
    out = grouped_aggregate(j, ["o_orderpriority"],
                            {"revenue": ("sum", "rev"),
                             "n_items": ("count", None)})
    out = _to_cents(out, ["revenue"])
    return out.map_batches(
        lambda b: b.rename_columns(["priority", "revenue", "n_items"]),
        batch_format="pyarrow", zero_copy_batch=True)


# ---- semi join (F1') ---------------------------------------------------

@_q("q_customers_with_orders",
    "SELECT c_nationkey AS nationkey, count(*) AS n_customers FROM customer "
    "WHERE c_custkey IN (SELECT o_custkey FROM orders) GROUP BY c_nationkey")
def q_customers_with_orders(sf_dir: str):
    cust = _t(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    okeys = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    # o_custkey set is customer-cardinality (small side) -> broadcast semi
    sj = broadcast_semi(cust, "c_custkey", okeys, "o_custkey")
    out = grouped_aggregate(sj, ["c_nationkey"], {"n_customers": ("count", None)})
    return out.map_batches(
        lambda b: b.rename_columns(["nationkey", "n_customers"]),
        batch_format="pyarrow", zero_copy_batch=True)


# ---- exact dedup (D1/D2) ----------------------------------------------

@_q("q_edges_distinct",
    "SELECT DISTINCT l_partkey AS src, l_suppkey AS dst FROM lineitem")
def q_edges_distinct(sf_dir: str):
    ds = _t(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    ds = ds.map_batches(lambda b: b.rename_columns(["src", "dst"]),
                        batch_format="pyarrow", zero_copy_batch=True)
    return distinct(ds, ["src", "dst"], num_parts=DEFAULT.num_parts)


@_q("q_first_event_per_user",
    "SELECT user_id, min(ts) AS first_ts, count(*) AS n_events "
    "FROM events GROUP BY user_id")
def q_first_event_per_user(sf_dir: str):
    ds = _t(sf_dir, "events", columns=["user_id", "ts"])
    return grouped_aggregate(ds, ["user_id"],
                             {"first_ts": ("min", "ts"),
                              "n_events": ("count", None)})


@_q("q_upsert_events",
    "WITH delta AS (SELECT event_id, ts, user_id, "
    "'updated' AS event_type, value * 2 AS value, props "
    "FROM events WHERE event_id % 7 = 0) "
    "SELECT * FROM delta UNION ALL SELECT e.* FROM events e "
    "WHERE e.event_id NOT IN (SELECT event_id FROM delta)")
def q_upsert_events(sf_dir: str):
    """Keyed MERGE (ops/merge.py::upsert): a synthetic recrawl delta
    (every 7th event re-observed with doubled value) replaces its base
    rows; everything else passes through one bucketed anti-join.
    check_exact vs the DuckDB oracle."""
    import pyarrow.compute as pc

    from .ops.merge import upsert

    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    base = _t(sf_dir, "events", columns=cols)

    def mk_delta(b: pa.Table) -> pa.Table:
        eid = b.column("event_id").to_numpy()
        t = b.filter(pa.array(eid % 7 == 0))
        return pa.table({
            "event_id": t.column("event_id"),
            "ts": t.column("ts"),
            "user_id": t.column("user_id"),
            "event_type": pa.array(["updated"] * t.num_rows),
            "value": pc.multiply(t.column("value"), 2.0),
            "props": t.column("props")})

    delta = base.map_batches(mk_delta, batch_format="pyarrow",
                             zero_copy_batch=True)
    return upsert(base, delta, "event_id")


@_q("q_snapshot_diff",
    "WITH b AS (SELECT event_id, event_type, value FROM events "
    "WHERE event_id % 5 <> 0), "
    "d AS (SELECT event_id, event_type, CASE WHEN event_id % 3 = 0 "
    "THEN value * 2 ELSE value END AS value FROM events "
    "WHERE event_id % 7 <> 0) "
    "SELECT coalesce(b.event_id, d.event_id) AS event_id, "
    "CASE WHEN b.event_id IS NULL THEN 'added' "
    "WHEN d.event_id IS NULL THEN 'removed' "
    "WHEN b.event_type = d.event_type AND b.value = d.value "
    "THEN 'unchanged' ELSE 'changed' END AS status "
    "FROM b FULL JOIN d ON d.event_id = b.event_id")
def q_snapshot_diff(sf_dir: str):
    """Recrawl snapshot diff (ops/merge.py::snapshot_diff): two
    synthetic crawls of the events table (the old one missing every
    5th key, the new one missing every 7th and re-observing every 3rd
    with doubled value) classified added/removed/changed/unchanged per
    key — one bucketed full-outer exchange moving only keys + compared
    columns.  check_exact vs the DuckDB full-join oracle."""
    import pyarrow.compute as pc

    from .ops.merge import snapshot_diff

    cols = ["event_id", "event_type", "value"]
    ev = _t(sf_dir, "events", columns=cols)

    def mk_base(b: pa.Table) -> pa.Table:
        eid = b.column("event_id").to_numpy()
        return b.filter(pa.array(eid % 5 != 0))

    def mk_delta(b: pa.Table) -> pa.Table:
        eid = b.column("event_id").to_numpy()
        t = b.filter(pa.array(eid % 7 != 0))
        eid = t.column("event_id").to_numpy()
        v = t.column("value").to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": t.column("event_id"),
            "event_type": t.column("event_type"),
            "value": pa.array(np.where(eid % 3 == 0, v * 2.0, v))})

    sch = pa.schema([("event_id", pa.int64()),
                     ("event_type", pa.string()),
                     ("value", pa.float64())])
    return snapshot_diff(
        ev.map_batches(mk_base, batch_format="pyarrow",
                       zero_copy_batch=True),
        ev.map_batches(mk_delta, batch_format="pyarrow",
                       zero_copy_batch=True),
        "event_id", cmp_cols=["event_type", "value"],
        base_schema=sch, delta_schema=sch)


@_q("q_scd2_history",
    "WITH f AS (SELECT user_id, value AS v, ts, row_number() OVER "
    "(PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events), "
    "l AS (SELECT user_id, value AS v, ts, row_number() OVER "
    "(PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn "
    "FROM events), "
    "base AS (SELECT user_id, v, ts AS valid_from FROM f WHERE rn = 1), "
    "delta AS (SELECT user_id, v, ts FROM l WHERE rn = 1) "
    "SELECT b.user_id, b.v, b.valid_from, d.ts AS valid_to "
    "FROM base b JOIN delta d USING (user_id) "
    "UNION ALL SELECT user_id, v, ts AS valid_from, "
    "CAST(NULL AS TIMESTAMP) AS valid_to FROM delta")
def q_scd2_history(sf_dir: str):
    """History-preserving upsert (ops/merge.py::upsert_scd2, SCD
    type 2 — the recrawl-history table shape): each user's FIRST
    observation forms the open base version; applying their LAST
    observation as the recrawl delta closes it at the delta timestamp
    and appends the new current version.  check_exact vs the DuckDB
    window+join oracle."""
    from .ops.merge import upsert_scd2
    from .ops.window import row_number

    ev = _t(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                       "value"])
    ts_t = pa.timestamp("us")

    def pick(descending):
        rn = row_number(ev, "user_id", ["ts", "event_id"],
                        descending=descending, out_col="__rn",
                        method="rank")
        return rn.map_batches(
            lambda b: b.filter(pc.equal(b.column("__rn"), 1))
            .drop_columns(["__rn", "event_id"]),
            batch_format="pyarrow", zero_copy_batch=True)

    def as_base(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b.column("user_id"),
                         "v": b.column("value"),
                         "valid_from": b.column("ts").cast(ts_t),
                         "valid_to": pa.nulls(b.num_rows, ts_t)})

    def as_delta(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b.column("user_id"),
                         "v": b.column("value"),
                         "ts": b.column("ts").cast(ts_t)})

    base = pick(False).map_batches(as_base, batch_format="pyarrow",
                                   zero_copy_batch=True)
    delta = pick(True).map_batches(as_delta, batch_format="pyarrow",
                                   zero_copy_batch=True)
    return upsert_scd2(base, delta, "user_id", ts_col="ts")


# ---- union + distinct (U1) --------------------------------------------

@_q("q_union_keys",
    "SELECT DISTINCT k FROM (SELECT o_custkey AS k FROM orders "
    "UNION ALL SELECT c_custkey AS k FROM customer)")
def q_union_keys(sf_dir: str):
    a = _t(sf_dir, "orders", columns=["o_custkey"]).map_batches(
        lambda b: b.rename_columns(["k"]), batch_format="pyarrow",
        zero_copy_batch=True)
    b = _t(sf_dir, "customer", columns=["c_custkey"]).map_batches(
        lambda t: t.rename_columns(["k"]), batch_format="pyarrow",
        zero_copy_batch=True)
    return distinct(a.union(b), ["k"], num_parts=DEFAULT.num_parts)


# ---- dense id assignment (I1) -----------------------------------------

@_q("q_dense_ids",
    "SELECT p_brand, row_number() OVER (ORDER BY p_brand) - 1 AS vid "
    "FROM (SELECT DISTINCT p_brand FROM part)")
def q_dense_ids(sf_dir: str):
    ds = _t(sf_dir, "part", columns=["p_brand"])
    return assign_dense_ids_sorted(ds, "p_brand", id_col="vid")


# ---- top-k / degree (G2/G3 + ordering) --------------------------------

@_q("q_topk_customers",
    "SELECT o_custkey AS custkey, count(*) AS n_orders FROM orders "
    "GROUP BY o_custkey ORDER BY n_orders DESC, o_custkey LIMIT 10")
def q_topk_customers(sf_dir: str):
    ds = _t(sf_dir, "orders", columns=["o_custkey"])
    agg = grouped_aggregate(ds, ["o_custkey"], {"n_orders": ("count", None)})
    agg = agg.map_batches(lambda b: b.rename_columns(["custkey", "n_orders"]),
                          batch_format="pyarrow", zero_copy_batch=True)
    # deterministic top-k: (count desc, key asc)
    return agg.sort(["n_orders", "custkey"], descending=[True, False]).limit(10)


@_q("q_out_degree",
    "SELECT l_partkey AS src, count(DISTINCT l_suppkey) AS outdeg "
    "FROM lineitem GROUP BY l_partkey")
def q_out_degree(sf_dir: str):
    ds = _t(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    ds = ds.map_batches(lambda b: b.rename_columns(["src", "dst"]),
                        batch_format="pyarrow", zero_copy_batch=True)
    d = distinct(ds, ["src", "dst"], num_parts=DEFAULT.num_parts)
    return grouped_aggregate(d, ["src"], {"outdeg": ("count", None)})


# ---- explode + token top-k (M1/M6) ------------------------------------

@_q("q_top_tokens",
    "SELECT token, count(*) AS n FROM (SELECT unnest(string_split(text, ' ')) "
    "AS token FROM documents) t WHERE token <> '' "
    "GROUP BY token ORDER BY n DESC, token LIMIT 20")
def q_top_tokens(sf_dir: str):
    ds = _t(sf_dir, "documents", columns=["text"])

    def tokens(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"], pattern=" ")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        # local combine: count within batch before the shuffle
        import polars as pl

        c = pl.DataFrame({"token": pl.from_arrow(
            flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat)})
        c = c.group_by("token").len().rename({"len": "n"})
        t = c.to_arrow()
        return pa.table({"token": t.column("token").cast(pa.string()),
                         "n": t.column("n").cast(pa.int64())})

    partial = ds.map_batches(tokens, batch_format="pyarrow", zero_copy_batch=True)
    total = grouped_aggregate(partial, ["token"], {"n": ("sum", "n")})
    return total.sort(["n", "token"], descending=[True, False]).limit(20)


# ---- triangle count via SQL-checkable co-supply graph (2.8) ------------

@_q("q_cosupply_triangles",
    "WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem), "
    "e AS (SELECT DISTINCT a.s AS a, b.s AS b FROM ps a JOIN ps b "
    "ON a.p = b.p AND a.s < b.s) "
    "SELECT count(*) AS n_triangles FROM e e1 "
    "JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b "
    "JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b")
def q_cosupply_triangles(sf_dir: str):
    """Suppliers sharing a part form an edge; count triangles exactly —
    exercises the full orientation/wedge/semi-join pipeline against a
    pure-SQL oracle."""
    import pandas as pd

    from .graph.triangles import triangles as tri_pipeline

    ds = _t(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    ds = ds.map_batches(lambda b: b.rename_columns(["src", "dst"]),
                        batch_format="pyarrow", zero_copy_batch=True)
    ps = distinct(ds, ["src", "dst"], num_parts=DEFAULT.num_parts).materialize()
    a = ps.map_batches(lambda b: b.rename_columns(["p", "a"]),
                       batch_format="pyarrow", zero_copy_batch=True)
    b = ps.map_batches(lambda t: t.rename_columns(["p", "b"]),
                       batch_format="pyarrow", zero_copy_batch=True)
    pa_schema = pa.schema([pa.field("p", pa.int64()), pa.field("a", pa.int64())])
    pb_schema = pa.schema([pa.field("p", pa.int64()), pa.field("b", pa.int64())])
    j = hash_join(a, b, on="p", num_parts=DEFAULT.num_parts,
                  left_schema=pa_schema, right_schema=pb_schema)

    def ordered(t: pa.Table) -> pa.Table:
        x, y = t.column("a").to_numpy(), t.column("b").to_numpy()
        m = x < y
        return pa.table({"src": pa.array(x[m]), "dst": pa.array(y[m])})

    e = distinct(j.map_batches(ordered, batch_format="pyarrow",
                               zero_copy_batch=True),
                 ["src", "dst"], num_parts=DEFAULT.num_parts)

    def swap(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column("dst"), "dst": t.column("src")})

    sym = e.union(e.map_batches(swap, batch_format="pyarrow",
                                zero_copy_batch=True))
    _, total = tri_pipeline(sym)
    return pd.DataFrame({"n_triangles": [total]})


# ---- event-time windows (stream-shaped operators; ray_guide pattern) ---

@_q("q_tumbling_window",
    "SELECT user_id, CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS hour_bucket, "
    "count(*) AS n_events, CAST(round(sum(value) * 100) AS BIGINT) AS value_cents "
    "FROM events GROUP BY user_id, hour_bucket")
def q_tumbling_window(sf_dir: str):
    """Tumbling 1h windows per user: bucket assignment is a vectorized
    map (no per-window state), then the standard grouped aggregate."""
    ds = _t(sf_dir, "events", columns=["user_id", "ts", "value"])

    def bucket(b: pa.Table) -> pa.Table:
        us = b.column("ts").cast(pa.int64()).to_numpy()
        hb = np.floor_divide(us, 3_600_000_000)
        return pa.table({"user_id": b.column("user_id"),
                         "hour_bucket": pa.array(hb),
                         "value": b.column("value")})

    out = grouped_aggregate(
        ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id", "hour_bucket"],
        {"n_events": ("count", None), "value_cents": ("sum", "value")})
    return _to_cents(out, ["value_cents"])


@_q("q_lead_lag",
    "SELECT event_id, user_id, "
    "lag(event_id, 1) OVER w AS prev_event, "
    "lead(event_id, 1) OVER w AS next_event "
    "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)")
def q_lead_lag(sf_dir: str):
    """lead/lag window functions (ops/window.py::lead_lag): previous and
    next event per user by time — one key-partitioned exchange, polars
    Rust shift().over() inside each group.  SQL-oracled (registered in
    the demoted _ORACLED_TAIL: the 50-slot recorded window is full);
    exact DuckDB parity also pinned in tests/test_window.py."""
    from .ops.window import lead_lag

    ds = _t(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    out = lead_lag(ds, "user_id", "ts",
                   {"prev_event": ("event_id", 1),
                    "next_event": ("event_id", -1)},
                   tie_break=["event_id"])
    return out.select_columns(["event_id", "user_id", "prev_event",
                               "next_event"])


@_q("q_first_last_value",
    "SELECT event_id, user_id, "
    "first_value(event_id) OVER w AS first_event, "
    "last_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, "
    "event_id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) "
    "AS last_event "
    "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)")
def q_first_last_value(sf_dir: str):
    """first_value/last_value windows (ops/window.py::window_value):
    each user's first and last event id by time — full unbounded frame
    (SQL's default frame makes last_value the current row, the classic
    gotcha; the oracle spells the frame out).  One key-partitioned
    exchange computing both in one pass.  SQL-oracled (demoted tail);
    DuckDB parity also pinned in tests/test_window.py."""
    from .ops.window import window_value

    ds = _t(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    out = window_value(ds, "user_id", "ts",
                       {"first_event": ("event_id", "first"),
                        "last_event": ("event_id", "last")},
                       tie_break=["event_id"])
    return out.select_columns(["event_id", "user_id", "first_event",
                               "last_event"])


@_q("q_row_number",
    "SELECT event_id, user_id, "
    "row_number() OVER (PARTITION BY user_id "
    "ORDER BY value DESC, event_id) AS rn FROM events")
def q_row_number(sf_dir: str):
    """row_number() window (ops/window.py::row_number): per-user rank of
    events by value.  SQL-oracled via the demoted _ORACLED_TAIL; exact
    DuckDB parity pinned in tests/test_window.py."""
    from .ops.window import row_number

    ds = _t(sf_dir, "events", columns=["event_id", "user_id", "value"])
    out = row_number(ds, "user_id", "value", descending=True,
                     tie_break=["event_id"])
    return out.select_columns(["event_id", "user_id", "rn"])


@_q("q_running_total",
    "WITH c AS (SELECT event_id, user_id, ts, value, "
    "CAST(round(value * 100) AS BIGINT) AS cents FROM events) "
    "SELECT event_id, user_id, "
    "sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS UNBOUNDED PRECEDING) AS run_cents, "
    "rank() OVER (PARTITION BY user_id ORDER BY value DESC) AS val_rank "
    "FROM c")
def q_running_total(sf_dir: str):
    """Running-sum + rank windows (ops/window.py::cumulative /
    row_number(method='rank')): per-user running value total by time
    (integer cents — float summation order differs between engines,
    ints hash exactly) and per-user value rank.  SQL-oracled via the
    demoted _ORACLED_TAIL; exact DuckDB parity pinned in
    tests/test_window.py."""
    from .ops.window import cumulative, row_number

    ds = _t(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def cents(b: pa.Table) -> pa.Table:
        v = np.rint(b.column("value").to_numpy() * 100).astype(np.int64)
        return b.append_column("cents", pa.array(v))

    ds = ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    run = cumulative(ds, "user_id", "ts", {"run_cents": ("cents", "sum")},
                     tie_break=["event_id"])
    out = row_number(run, "user_id", "value", descending=True,
                     out_col="val_rank", method="rank")
    return out.select_columns(["event_id", "user_id", "run_cents",
                               "val_rank"])


@_q("q_range_join",
    "SELECT l.l_orderkey, l.l_linenumber, o.o_orderkey FROM lineitem l "
    "JOIN orders o ON l.l_orderkey = o.o_orderkey "
    "AND l.l_shipdate BETWEEN o.o_orderdate "
    "AND o.o_orderdate + INTERVAL 60 DAY")
def q_range_join(sf_dir: str):
    """Range join (ops/range_join.py): lineitems shipped inside their
    order's 60-day window — equi-key bucketed exchange, interval
    predicate applied inside each bucket task (zero extra exchanges).
    SQL-oracled via the demoted _ORACLED_TAIL; boundary-closedness
    variants pinned in tests/test_range_join.py."""
    from datetime import timedelta

    from .ops.range_join import range_join

    li = _t(sf_dir, "lineitem",
            columns=["l_orderkey", "l_linenumber", "l_shipdate"])
    orders = _t(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def win(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        end = pc.add(b.column("o_orderdate"), timedelta(days=60))
        return b.append_column("o_end", end)

    orders = orders.map_batches(win, batch_format="pyarrow",
                                zero_copy_batch=True)
    out = range_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
        left_ts="l_shipdate", right_start="o_orderdate",
        right_end="o_end",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_linenumber", pa.int64()),
                               ("l_shipdate", pa.timestamp("us"))]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_orderdate", pa.timestamp("us")),
                                ("o_end", pa.timestamp("us"))]))

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": b.column("l_orderkey"),
                         "l_linenumber": b.column("l_linenumber"),
                         "o_orderkey": b.column("l_orderkey")})

    return out.map_batches(fin, batch_format="pyarrow",
                           zero_copy_batch=True)


@_q("q_except_keys",
    "SELECT DISTINCT o_custkey AS k FROM orders "
    "EXCEPT SELECT DISTINCT user_id AS k FROM events")
def q_except_keys(sf_dir: str):
    """Set difference (EXCEPT): distinct order custkeys that never
    appear as event users — distinct + anti semi-join over the bucketed
    hash_join (both sides big; no broadcast).  SQL-oracled via the
    demoted _ORACLED_TAIL."""
    from .ops.dedup import distinct
    from .ops.join import hash_join

    o = distinct(_t(sf_dir, "orders", columns=["o_custkey"])
                 .map_batches(lambda b: b.rename_columns(["k"]),
                              batch_format="pyarrow",
                              zero_copy_batch=True), ["k"])
    e = distinct(_t(sf_dir, "events", columns=["user_id"])
                 .map_batches(lambda b: b.rename_columns(["k"]),
                              batch_format="pyarrow",
                              zero_copy_batch=True), ["k"])
    kschema = pa.schema([("k", pa.int64())])
    return hash_join(o, e, on="k", join_type="anti",
                     left_schema=kschema, right_schema=kschema)


@_q("q_intersect_keys",
    "SELECT DISTINCT o_custkey AS k FROM orders "
    "INTERSECT SELECT DISTINCT user_id AS k FROM events")
def q_intersect_keys(sf_dir: str):
    """Set intersection (INTERSECT): custkeys that are also event
    users — distinct + semi join, same big-big bucketed shape.
    SQL-oracled via the demoted _ORACLED_TAIL."""
    from .ops.dedup import distinct
    from .ops.join import hash_join

    o = distinct(_t(sf_dir, "orders", columns=["o_custkey"])
                 .map_batches(lambda b: b.rename_columns(["k"]),
                              batch_format="pyarrow",
                              zero_copy_batch=True), ["k"])
    e = distinct(_t(sf_dir, "events", columns=["user_id"])
                 .map_batches(lambda b: b.rename_columns(["k"]),
                              batch_format="pyarrow",
                              zero_copy_batch=True), ["k"])
    kschema = pa.schema([("k", pa.int64())])
    return hash_join(o, e, on="k", join_type="semi",
                     left_schema=kschema, right_schema=kschema)


@_q("q_collect_events",
    "SELECT user_id, string_agg(event_id, ',' ORDER BY event_id) "
    "AS items FROM events GROUP BY user_id")
def q_collect_events(sf_dir: str):
    """Grouped collect (ops/agg.py::grouped_collect): each user's
    sorted event ids as one joined string (string_agg/collect_list) —
    one key-partitioned exchange.  SQL-oracled via the demoted
    _ORACLED_TAIL; list mode + truncation cap pinned in
    tests/test_distinct.py."""
    from .ops.agg import grouped_collect

    ds = _t(sf_dir, "events", columns=["user_id", "event_id"])
    return grouped_collect(ds, ["user_id"], "event_id", as_string=True)


@_q("q_json_props",
    "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) "
    "AS k FROM events")
def q_json_props(sf_dir: str):
    """JSON field extraction (ops/strings.py::json_field): pull the
    numeric 'k' field out of the props JSON column — stateless polars
    json_path_match kernel, zero exchanges.  SQL-oracled via the
    demoted _ORACLED_TAIL; malformed-JSON and regex variants pinned in
    tests/test_strings.py."""
    from .ops.strings import json_field

    ds = _t(sf_dir, "events", columns=["event_id", "props"])
    out = json_field(ds, "props", "$.k", out_col="k",
                     out_type=pa.int64())
    return out.select_columns(["event_id", "k"])


@_q("q_rollup_events",
    "WITH c AS (SELECT event_type, user_id, "
    "CAST(round(value * 100) AS BIGINT) AS cents FROM events) "
    "SELECT event_type, user_id, count(*) AS n_events, "
    "sum(cents) AS cents_sum FROM c "
    "GROUP BY ROLLUP(event_type, user_id)")
def q_rollup_events(sf_dir: str):
    """GROUP BY ROLLUP (ops/agg.py::rollup_aggregate): the aggregate at
    every key prefix — raw data read once, coarser levels re-aggregate
    the previous level's group-sized output.  Integer cents so sums
    hash exactly.  SQL-oracled via the demoted _ORACLED_TAIL; DuckDB
    ROLLUP parity also pinned in tests/test_distinct.py."""
    from .ops.agg import rollup_aggregate

    ds = _t(sf_dir, "events", columns=["event_type", "user_id", "value"])

    def cents(b: pa.Table) -> pa.Table:
        v = np.rint(b.column("value").to_numpy() * 100).astype(np.int64)
        return pa.table({"event_type": b.column("event_type"),
                         "user_id": b.column("user_id"),
                         "cents": pa.array(v)})

    ds = ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    return rollup_aggregate(ds, ["event_type", "user_id"],
                            {"n_events": ("count", None),
                             "cents_sum": ("sum", "cents")})


@_q("q_profile_orders",
    "SELECT count(*) AS n_rows, "
    "count(o_totalprice) AS o_totalprice__n, "
    "min(o_totalprice) AS o_totalprice__min, "
    "max(o_totalprice) AS o_totalprice__max, "
    "count(o_orderdate) AS o_orderdate__n, "
    "min(o_orderdate) AS o_orderdate__min, "
    "max(o_orderdate) AS o_orderdate__max FROM orders")
def q_profile_orders(sf_dir: str):
    """One-pass dataset profile (ops/profile.py): row count + per-column
    null counts and min/max — one constant-size partial row per block,
    single merge task (exchange independent of data volume).  Min/max
    are comparison-only so the floats hash exactly.  SQL-oracled via the
    demoted _ORACLED_TAIL; parity also pinned in tests/test_distinct.py."""
    from .ops.profile import profile

    ds = _t(sf_dir, "orders", columns=["o_totalprice", "o_orderdate"])
    return profile(ds, ["o_totalprice", "o_orderdate"])


@_q("q_skew_hot_users")
def q_skew_hot_users(sf_dir: str):
    """Pre-shuffle key-skew diagnostic (ops/sketch.py::key_skew_report):
    Misra-Gries hot keys with share bounds over the events user_id key.
    Rows-only (returns the hot-key table); share-bound test in
    tests/test_sketch.py."""
    from .ops.sketch import key_skew_report

    ds = _t(sf_dir, "events", columns=["user_id"])
    return key_skew_report(ds, "user_id", k=10)["hot"]


@_q("q_distinct_users_per_type",
    "SELECT event_type, count(DISTINCT user_id) AS n_distinct "
    "FROM events GROUP BY event_type")
def q_distinct_users_per_type(sf_dir: str):
    """Exact grouped COUNT(DISTINCT ...) (ops/distinct.py): per-batch
    local dedup combiner, one key-partitioned exchange, polars n_unique
    per partition.  SQL-oracled via the demoted _ORACLED_TAIL; DuckDB
    parity also pinned in tests/test_distinct.py."""
    from .ops.distinct import grouped_count_distinct

    ds = _t(sf_dir, "events", columns=["event_type", "user_id"])
    return grouped_count_distinct(ds, "event_type", "user_id")


@_q("q_distinct_users_per_type_hll")
def q_distinct_users_per_type_hll(sf_dir: str):
    """Per-group HyperLogLog distinct count (ops/distinct.py): one
    register row per (group, batch), grouped max-merge — constant bytes
    per group regardless of value cardinality (the 100-TB path where
    exact must exchange every distinct pair).  Rows-only; error bound +
    partitioning invariance in tests/test_distinct.py."""
    from .ops.distinct import grouped_count_distinct_hll

    ds = _t(sf_dir, "events", columns=["event_type", "user_id"])
    return grouped_count_distinct_hll(ds, "event_type", "user_id", p=12)


@_q("q_left_join",
    "SELECT c.c_custkey, o.o_orderkey FROM customer c "
    "LEFT JOIN orders o ON c.c_custkey = o.o_custkey")
def q_left_join(sf_dir: str):
    """Left outer bucketed join (ops/join.py::hash_join
    join_type='left'): every customer with their orders, null orderkey
    for order-less customers.  SQL-oracled via the demoted
    _ORACLED_TAIL; parity also pinned in tests/test_outer_join.py."""
    from .ops.join import hash_join

    cust = _t(sf_dir, "customer", columns=["c_custkey"])
    orders = _t(sf_dir, "orders", columns=["o_custkey", "o_orderkey"])
    return hash_join(cust, orders, on="c_custkey", right_on="o_custkey",
                     join_type="left", left_cols=[],
                     right_cols=["o_orderkey"])


@_q("q_full_join",
    "WITH e AS (SELECT user_id, count(*) AS n_events FROM events "
    "GROUP BY user_id) "
    "SELECT COALESCE(e.user_id, c.c_custkey) AS user_id, e.n_events, "
    "CAST(c.c_nationkey AS BIGINT) AS c_nationkey "
    "FROM e FULL OUTER JOIN customer c ON e.user_id = c.c_custkey")
def q_full_join(sf_dir: str):
    """Full outer bucketed join (ops/join.py::hash_join
    join_type='full', coalesced key): per-user event counts against the
    customer dimension — rows survive from BOTH unmatched sides.
    SQL-oracled via the demoted _ORACLED_TAIL; parity also pinned in
    tests/test_outer_join.py."""
    import pyarrow as _pa

    from .ops.agg import grouped_aggregate
    from .ops.join import hash_join

    ev = grouped_aggregate(
        _t(sf_dir, "events", columns=["user_id"]).map_batches(
            lambda b: b.append_column(
                "one", _pa.array(np.ones(b.num_rows, dtype=np.int64))),
            batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"], {"n_events": ("sum", "one")})
    cust = _t(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    return hash_join(
        ev, cust, on="user_id", right_on="c_custkey", join_type="full",
        left_cols=["n_events"], right_cols=["c_nationkey"],
        left_schema=_pa.schema([("user_id", _pa.int64()),
                                ("n_events", _pa.int64())]),
        right_schema=_pa.schema([("c_custkey", _pa.int64()),
                                 ("c_nationkey", _pa.int64())]))


@_q("q_pivot_events",
    "SELECT user_id, "
    "count(CASE WHEN event_type='click' THEN 1 END) AS n_click, "
    "count(CASE WHEN event_type='error' THEN 1 END) AS n_error, "
    "count(CASE WHEN event_type='purchase' THEN 1 END) AS n_purchase, "
    "count(CASE WHEN event_type='signup' THEN 1 END) AS n_signup, "
    "count(CASE WHEN event_type='view' THEN 1 END) AS n_view "
    "FROM events GROUP BY user_id")
def q_pivot_events(sf_dir: str):
    """Pivot (ops/pivot.py): one count column per event type per user —
    conditional aggregation, batch-level combiner + one grouped merge.
    SQL-oracled via the demoted _ORACLED_TAIL; exact DuckDB parity also
    pinned in tests/test_pivot.py."""
    from .ops.pivot import pivot

    ds = _t(sf_dir, "events", columns=["user_id", "event_type"])
    return pivot(ds, "user_id", "event_type", prefix="n_",
                 values=["click", "error", "purchase", "signup", "view"])


@_q("q_unpivot_doc_langs",
    "WITH w AS (SELECT source, "
    "count(CASE WHEN lang='en' THEN 1 END) AS en, "
    "count(CASE WHEN lang='fr' THEN 1 END) AS fr, "
    "count(CASE WHEN lang='de' THEN 1 END) AS de "
    "FROM documents GROUP BY source) "
    "SELECT source, 'en' AS lang, en AS n_docs FROM w "
    "UNION ALL SELECT source, 'fr', fr FROM w "
    "UNION ALL SELECT source, 'de', de FROM w")
def q_unpivot_doc_langs(sf_dir: str):
    """Pivot then melt back (ops/pivot.py::unpivot, the zero-shuffle
    per-batch melt): per-source doc counts for three languages in long
    form.  SQL-oracled via the demoted _ORACLED_TAIL; parity pinned in
    tests/test_pivot.py."""
    from .ops.pivot import pivot, unpivot

    ds = _t(sf_dir, "documents", columns=["source", "lang"])
    wide = pivot(ds, "source", "lang", values=["en", "fr", "de"])
    return unpivot(wide, ["source"], ["en", "fr", "de"],
                   var_name="lang", value_name="n_docs")


@_q("q_sliding_window",
    "WITH g AS (SELECT user_id, value, "
    "CAST(floor(epoch_us(ts) / 900000000) AS BIGINT) AS q FROM events), "
    "e AS (SELECT user_id, value, q - o AS w FROM g, "
    "UNNEST([0, 1, 2, 3]) AS u(o)) "
    "SELECT user_id, w AS window_start_q, count(*) AS n_events, "
    "CAST(round(sum(value) * 100) AS BIGINT) AS value_cents "
    "FROM e GROUP BY user_id, w")
def q_sliding_window(sf_dir: str):
    """Sliding 1h windows stepping 15min per user: each event lands in
    exactly 4 quarter-hour-aligned windows — a vectorized 4x explode,
    then the standard grouped aggregate (no per-window state; empty
    windows absent)."""
    ds = _t(sf_dir, "events", columns=["user_id", "ts", "value"])

    def expand(b: pa.Table) -> pa.Table:
        us = b.column("ts").cast(pa.int64()).to_numpy()
        q = np.floor_divide(us, 900_000_000)
        uid = b.column("user_id").to_numpy()
        val = b.column("value").to_numpy()
        n = len(q)
        w = np.concatenate([q - o for o in range(4)])
        return pa.table({"user_id": pa.array(np.tile(uid, 4)),
                         "window_start_q": pa.array(w),
                         "value": pa.array(np.tile(val, 4))})

    out = grouped_aggregate(
        ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id", "window_start_q"],
        {"n_events": ("count", None), "value_cents": ("sum", "value")})
    return _to_cents(out, ["value_cents"])


@_q("q_robust_scale",
    "SELECT t.l_returnflag, t.l_extendedprice, "
    "(t.l_extendedprice - s.m) / NULLIF(s.d, 0) AS scaled "
    "FROM lineitem t JOIN (SELECT l_returnflag, "
    "median(l_extendedprice) AS m, mad(l_extendedprice) AS d "
    "FROM lineitem GROUP BY l_returnflag) s USING (l_returnflag)")
def q_robust_scale(sf_dir: str):
    """Robust feature scaling (ops/stats.py::robust_scale): per row,
    (x - group median) / group MAD — outlier-insensitive normalization
    for heavy-tailed web features.  Hash-exact vs DuckDB with NO
    rounding: grouped_mad's (median, mad) are bitwise DuckDB-equal and
    the scaling is the same two IEEE float64 ops on both engines.
    SQL-oracled via the demoted _ORACLED_TAIL."""
    from .ops.stats import robust_scale

    ds = _t(sf_dir, "lineitem", columns=["l_returnflag",
                                         "l_extendedprice"])
    return robust_scale(ds, ["l_returnflag"], "l_extendedprice")


@_q("q_decayed_activity",
    "SELECT user_id, round(SUM(exp((epoch_us(ts) - 1709251200000000.0)"
    " / 604800000000.0)), 6) AS decayed_activity "
    "FROM events GROUP BY user_id")
def q_decayed_activity(sf_dir: str):
    """Exponential time-decay activity score (frecency): per user,
    SUM(exp((ts - T_ref)/tau)) with tau = 7 days, T_ref = 2024-03-01
    — the recency weighting a mixture sampler / crawl scheduler uses.
    Sum-mergeable (one grouped-sum exchange via ops/agg.py::
    grouped_aggregate, weights computed vectorized per batch); rounded
    6dp on BOTH sides (exp last-ulp + summation order).  SQL-oracled
    via the demoted _ORACLED_TAIL."""
    from .ops.agg import grouped_aggregate

    T_REF = 1_709_251_200_000_000.0  # epoch us of 2024-03-01
    TAU = 604_800_000_000.0          # 7 days in us

    ds = _t(sf_dir, "events", columns=["user_id", "ts"])

    def weigh(b: pa.Table) -> pa.Table:
        us = pc.cast(b.column("ts"), pa.int64()).to_numpy()
        w = np.exp((us - T_REF) / TAU)
        return pa.table({"user_id": b.column("user_id"),
                         "w": pa.array(w, type=pa.float64())})

    weighted = ds.map_batches(weigh, batch_format="pyarrow",
                              zero_copy_batch=True)
    out = grouped_aggregate(weighted, ["user_id"],
                            {"decayed_activity": ("sum", "w")})

    def rounder(b: pa.Table) -> pa.Table:
        v = np.round(
            b.column("decayed_activity").to_numpy(zero_copy_only=False),
            6)
        i = b.column_names.index("decayed_activity")
        return b.set_column(i, "decayed_activity",
                            pa.array(v, type=pa.float64()))

    return out.map_batches(rounder, batch_format="pyarrow",
                           zero_copy_batch=True)


@_q("q_crawl_overlap",
    "WITH ud AS (SELECT DISTINCT event_type AS t, "
    "user_id * 131072 + CAST(floor(epoch_us(ts) / 86400000000) "
    "AS BIGINT) AS k FROM events), "
    "c AS (SELECT t, count(*) AS n FROM ud GROUP BY t), "
    "i AS (SELECT a.t AS ta, b.t AS tb, count(*) AS ni FROM ud a "
    "JOIN ud b ON a.k = b.k AND a.t < b.t GROUP BY a.t, b.t) "
    "SELECT ca.t AS type_a, cb.t AS type_b, "
    "CAST(ca.n AS DOUBLE) AS est_a, CAST(cb.n AS DOUBLE) AS est_b, "
    "CAST(ca.n + cb.n - COALESCE(i.ni, 0) AS DOUBLE) AS est_union, "
    "CAST(COALESCE(i.ni, 0) AS DOUBLE) AS est_intersection, "
    "CAST(COALESCE(i.ni, 0) AS DOUBLE) / "
    "CAST(ca.n + cb.n - COALESCE(i.ni, 0) AS DOUBLE) AS jaccard "
    "FROM c ca JOIN c cb ON ca.t < cb.t "
    "LEFT JOIN i ON i.ta = ca.t AND i.tb = cb.t")
def q_crawl_overlap(sf_dir: str):
    """Pairwise distinct-population overlap via KMV / theta sketches
    (ops/sketch.py::kmv_build_grouped + kmv_set_ops): per event type,
    sketch the distinct (user, day) activity keys, then estimate
    |A n B|, |A u B| and Jaccard for every type pair — the cross-crawl
    /cross-snapshot overlap estimator (inclusion-exclusion on HLL
    cannot answer small intersections).  At gate scale the sketches
    sit in the EXACT regime (distinct keys << k=65536), so the SQL
    self-join oracle matches bitwise; past k the same query returns
    ~1/sqrt(k) estimates (error bound pinned in tests/test_sketch.py).
    SQL-oracled via the demoted _ORACLED_TAIL."""
    from .ops.sketch import kmv_build_grouped, kmv_set_ops

    ds = _t(sf_dir, "events", columns=["event_type", "user_id", "ts"])

    def keyize(b: pa.Table) -> pa.Table:
        us = pc.cast(b.column("ts"), pa.int64()).to_numpy()
        day = us // 86_400_000_000  # day index since epoch
        uid = b.column("user_id").to_numpy()
        return pa.table({"event_type": b.column("event_type"),
                         "k": pa.array(uid * 131072 + day,
                                       type=pa.int64())})

    keyed = ds.map_batches(keyize, batch_format="pyarrow",
                           zero_copy_batch=True)
    sk = kmv_build_grouped(keyed, "event_type", "k", k=65536)
    types = sorted(sk)
    rows = []
    for idx, ta in enumerate(types):
        for tb in types[idx + 1:]:
            ops = kmv_set_ops(sk[ta], sk[tb])
            rows.append({"type_a": ta, "type_b": tb, **ops})
    import pandas as pd
    return pd.DataFrame(rows, columns=["type_a", "type_b", "est_a",
                                       "est_b", "est_union",
                                       "est_intersection", "jaccard"])


@_q("q_merge_intervals",
    "WITH iv AS (SELECT user_id, epoch_us(ts) AS s, "
    "epoch_us(ts) + CAST(floor(value * 60000000) AS BIGINT) AS e "
    "FROM events), "
    "m AS (SELECT user_id, s, e, MAX(e) OVER (PARTITION BY user_id "
    "ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) "
    "AS pm FROM iv), "
    "i AS (SELECT user_id, s, e, SUM(CASE WHEN pm IS NULL OR s > pm "
    "THEN 1 ELSE 0 END) OVER (PARTITION BY user_id ORDER BY s, e "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl FROM m) "
    "SELECT user_id, MIN(s) AS span_start, MAX(e) AS span_end, "
    "COUNT(*) AS n_merged FROM i GROUP BY user_id, isl")
def q_merge_intervals(sf_dir: str):
    """Interval coalescing (ops/window.py::merge_intervals): each
    event opens an activity window [ts, ts + value minutes]; per user,
    overlapping/touching windows chain-merge into spans (SQL
    gaps-and-islands, exact island semantics vs the DuckDB
    window-function oracle).  Durations floor() to integer
    microseconds on BOTH sides (double->int cast direction differs
    between engines otherwise).  SQL-oracled via the demoted
    _ORACLED_TAIL; crafted-case + parity pytests in
    tests/test_window.py."""
    from .ops.window import merge_intervals

    ds = _t(sf_dir, "events", columns=["user_id", "ts", "value"])

    def to_iv(b: pa.Table) -> pa.Table:
        s = pc.cast(b.column("ts"), pa.int64())  # timestamp[us] -> us
        dur = np.floor(
            b.column("value").to_numpy(zero_copy_only=False)
            * 60_000_000.0).astype(np.int64)
        return pa.table({"user_id": b.column("user_id"), "s": s,
                         "e": pa.array(s.to_numpy() + dur,
                                       type=pa.int64())})

    iv = ds.map_batches(to_iv, batch_format="pyarrow",
                        zero_copy_batch=True)
    return merge_intervals(iv, "user_id", "s", "e",
                           out_cols=("span_start", "span_end",
                                     "n_merged"))


@_q("q_sessionize",
    "WITH e AS (SELECT user_id, ts, CASE WHEN lag(ts) OVER w IS NULL "
    "OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s "
    "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
    "s AS (SELECT user_id, ts, sum(new_s) OVER "
    "(PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM e) "
    "SELECT user_id, CAST(sid AS BIGINT) AS session_id, min(ts) AS session_start, "
    "count(*) AS n_events FROM s GROUP BY user_id, sid")
def q_sessionize(sf_dir: str):
    """Session windows (30-min inactivity gap).  Users are hash-bucketed
    and each bucket sessionizes ALL its users in one vectorized pass —
    a per-user groupby would push millions of micro-groups through the
    sort shuffle at scale (the repo's measured blocks^2 cost)."""
    import pandas as pd

    ds = _t(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def add_bucket(b: pa.Table) -> pa.Table:
        h = stable_hash64(b.column("user_id")) % DEFAULT.num_parts
        return b.append_column("__b", pa.array(h, type=pa.int32()))

    def sessions_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        new_user = g.user_id.ne(g.user_id.shift())
        gap = (g.ts.diff() > pd.Timedelta(minutes=30)) | new_user
        sid_global = gap.cumsum()
        first_sid = sid_global.where(new_user).ffill()
        sid = (sid_global - first_sid + 1).astype("int64")
        out = (g.assign(session_id=sid)
               .groupby(["user_id", "session_id"], as_index=False)
               .agg(session_start=("ts", "min"), n_events=("ts", "size")))
        out["n_events"] = out["n_events"].astype("int64")
        return out[["user_id", "session_id", "session_start", "n_events"]]

    from .ops._util import pre_shuffle

    return (pre_shuffle(ds.map_batches(add_bucket, batch_format="pyarrow",
                                       zero_copy_batch=True))
            .groupby("__b")
            .map_groups(sessions_bucket, batch_format="pandas",
                        retry_exceptions=True))


@_q("q_asof_join",
    "SELECT e.event_id, o.o_orderdate AS matched_date FROM events e "
    "ASOF JOIN orders o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate")
def q_asof_join(sf_dir: str):
    """As-of join: latest order at-or-before each event, per user — the
    big-big bucketed path (ops/asof.py): hash-bucket BOTH sides on the
    user key, one exchange, merge_asof per bucket.  orders is
    order-cardinality (NOT a dimension) so the broadcast variant
    (ops.asof.broadcast_asof) is wrong at scale."""
    from .ops.asof import asof_join

    ts = pa.timestamp("us")
    ev = _t(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    orders = _t(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    j = asof_join(
        ev, orders, on="ts", right_on="o_orderdate",
        by="user_id", right_by="o_custkey",
        left_cols=["event_id"], right_cols=["o_orderdate"],
        num_parts=DEFAULT.num_parts,
        left_schema=pa.schema([pa.field("event_id", pa.int64()),
                               pa.field("user_id", pa.int64()),
                               pa.field("ts", ts)]),
        right_schema=pa.schema([pa.field("o_custkey", pa.int64()),
                                pa.field("o_orderdate", ts)]))
    return j.map_batches(
        lambda b: pa.table({"event_id": b.column("event_id"),
                            "matched_date": b.column("o_orderdate")}),
        batch_format="pyarrow", zero_copy_batch=True)


@_q("q_heavy_hitters",
    "SELECT user_id, count(*) AS count_min, count(*) AS count_max "
    "FROM events GROUP BY user_id "
    "ORDER BY count_min DESC, user_id LIMIT 20")
def q_heavy_hitters(sf_dir: str):
    """Top-20 most active users via the mergeable Misra-Gries summary
    (ops/sketch.py::heavy_hitters) — communication bounded by capacity x
    blocks instead of a full distinct-key shuffle.  capacity exceeds the
    distinct-user count at every test sf, so the summary is EXACT
    (count_min == count_max == true count) and the SQL oracle
    hash-matches; at web scale capacity trades memory for the error
    bound err <= N/capacity."""
    from .ops.sketch import heavy_hitters

    ev = _t(sf_dir, "events", columns=["user_id"])
    return heavy_hitters(ev, "user_id", k=20, capacity=65536)


@_q("q_customers_without_orders",
    "SELECT c_custkey, c_nationkey FROM customer "
    "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders "
    "WHERE o_orderpriority = '1-URGENT')")
def q_customers_without_orders(sf_dir: str):
    """Anti semi-join (ops/join.py::broadcast_semi(anti=True)) — the
    NOT EXISTS certification by name (the same kernel decontamination
    uses); restricted to urgent orders so the result is non-trivial at
    every test sf.  SQL-oracled (demoted tail)."""
    import pyarrow.compute as _pc

    cust = _t(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    ot = pq.read_table(f"{sf_dir}/orders.parquet",
                       columns=["o_custkey", "o_orderpriority"])
    okeys = ot.filter(_pc.equal(ot.column("o_orderpriority"),
                                "1-URGENT")).select(["o_custkey"])
    return broadcast_semi(cust, "c_custkey", okeys, "o_custkey",
                          anti=True)


@_q("q_skipgram_events",
    "WITH r AS (SELECT user_id, event_type, row_number() OVER "
    "(PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events) "
    "SELECT a.user_id, a.event_type AS center, b.event_type AS context, "
    "(b.rn - a.rn) AS \"offset\" FROM r a JOIN r b "
    "ON a.user_id = b.user_id AND b.rn - a.rn BETWEEN 1 AND 2")
def q_skipgram_events(sf_dir: str):
    """Skip-gram context pairs (functions/pack.py::skipgram_pairs) over
    per-user event sequences — the training-pair generator between a
    walk corpus and an embedding trainer, exercised here on a
    SQL-reproducible ordering (ts, event_id).  One key-partitioned
    exchange (lead_lag multi-shift) + a zero-shuffle melt.  SQL-oracled
    (demoted tail); DuckDB parity also in tests/test_pack.py."""
    from .functions.pack import skipgram_pairs

    ev = _t(sf_dir, "events", columns=["user_id", "ts", "event_id",
                                       "event_type"])
    return skipgram_pairs(ev, "user_id", "ts", "event_type", window=2,
                          tie_break=["event_id"]).select_columns(
        ["user_id", "center", "context", "offset"])


@_q("q_bloom_join",
    "SELECT l.l_orderkey, l.l_linenumber, o.o_orderpriority "
    "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
    "WHERE o.o_orderkey % 101 = 0")
def q_bloom_join(sf_dir: str):
    """Bloom-prefiltered selective join (ops/join.py::
    bloom_filtered_join): a constant-size Bloom filter over the right
    keys broadcasts once and prunes non-matching left rows BEFORE the
    all-to-all exchange — the shuffle ships ~1% of lineitem instead of
    all of it (right side = every 101st order).  False positives only;
    the inner join discards them, so the result is exactly
    hash_join's.  SQL-oracled (demoted tail); parity + prune-rate
    tests in tests/test_outer_join.py."""
    from .ops.join import bloom_filtered_join

    li = _t(sf_dir, "lineitem",
            columns=["l_orderkey", "l_linenumber"])
    def sel(b: pa.Table) -> pa.Table:
        k = b.column("o_orderkey").to_numpy()
        return b.filter(pa.array(k % 101 == 0))

    orders = _t(sf_dir, "orders",
                columns=["o_orderkey", "o_orderpriority"]).map_batches(
        sel, batch_format="pyarrow", zero_copy_batch=True)
    j = bloom_filtered_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
        num_parts=DEFAULT.num_parts, num_bits=1 << 18,
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_linenumber", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_orderpriority", pa.string())]))
    return j.select_columns(["l_orderkey", "l_linenumber",
                             "o_orderpriority"])


@_q("q_event_transitions",
    "WITH t AS (SELECT event_type AS src, lead(event_type) OVER ("
    "PARTITION BY user_id ORDER BY ts, event_id) AS dst FROM events), "
    "c AS (SELECT src, dst, count(*) AS n FROM t "
    "WHERE dst IS NOT NULL GROUP BY src, dst) "
    "SELECT src, dst, n, round(n / (sum(n) OVER (PARTITION BY src)), 9) "
    "AS p FROM c")
def q_event_transitions(sf_dir: str):
    """First-order Markov transition matrix between event types: per
    user-session stream, count (type -> next type) adjacencies
    (certified lead_lag window, event_id tie-break) and row-normalize
    per source — the behavioral-model fit step.  All-distributed
    composition: one user-hash window exchange, one (src,dst) count
    exchange, one src total exchange joined back by hash_join; the
    transition table is bounded by |types|^2, never by events."""
    from .ops.join import hash_join
    from .ops.window import lead_lag

    ev = _t(sf_dir, "events", columns=["user_id", "event_type", "ts",
                                       "event_id"])
    nxt = lead_lag(ev, "user_id", "ts", {"dst": ("event_type", -1)},
                   tie_break=["event_id"], num_parts=DEFAULT.num_parts)

    def keep(b: pa.Table) -> pa.Table:
        m = pc.is_valid(b.column("dst"))
        b = b.filter(m)
        return pa.table({"src": b.column("event_type"),
                         "dst": b.column("dst")})

    pairs = nxt.map_batches(keep, batch_format="pyarrow",
                            zero_copy_batch=True)
    counts = grouped_aggregate(pairs, ["src", "dst"],
                               {"n": ("count", "dst")},
                               num_parts=DEFAULT.num_parts)
    totals = grouped_aggregate(pairs, ["src"], {"tot": ("count", "dst")},
                               num_parts=DEFAULT.num_parts)
    j = hash_join(counts, totals, on="src", right_on="src",
                  num_parts=DEFAULT.num_parts,
                  left_schema=pa.schema([("src", pa.string()),
                                         ("dst", pa.string()),
                                         ("n", pa.int64())]),
                  right_schema=pa.schema([("src", pa.string()),
                                          ("tot", pa.int64())]))

    def norm(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        t = b.column("tot").to_numpy(zero_copy_only=False).astype(
            np.float64)
        return pa.table({"src": b.column("src"), "dst": b.column("dst"),
                         "n": b.column("n"),
                         "p": pa.array(np.round(n / t, 9),
                                       type=pa.float64())})

    return j.map_batches(norm, batch_format="pyarrow",
                         zero_copy_batch=True)


@_q("q_funnel_events",
    "WITH s1 AS (SELECT user_id, min(ts) AS t FROM events "
    "WHERE event_type = 'view' GROUP BY user_id), "
    "s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
    "JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t "
    "WHERE e.event_type = 'click' GROUP BY e.user_id), "
    "s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
    "JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t "
    "WHERE e.event_type = 'purchase' GROUP BY e.user_id) "
    "SELECT step, step_name, n_users FROM ("
    "SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name, "
    "(SELECT count(*) FROM s1) AS n_users "
    "UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2) "
    "UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)) "
    "ORDER BY step")
def q_funnel_events(sf_dir: str):
    """3-step conversion funnel view -> click -> purchase with
    earliest-completion, strictly-increasing-timestamp semantics
    (ops/funnel.py) — one user-hash exchange, per-bucket polars
    join+min chain, suffix-sum over the <= 3-row depth histogram.
    The SQL oracle is the equivalent min-aggregation join chain;
    window (within_us) + tie semantics pinned against a pure-Python
    replay in tests/test_funnel.py."""
    from .ops.funnel import funnel_counts

    ev = _t(sf_dir, "events", columns=["user_id", "event_type", "ts"])
    return funnel_counts(ev, "user_id", "event_type", "ts",
                         ["view", "click", "purchase"],
                         num_parts=DEFAULT.num_parts)


@_q("q_retention_cohorts",
    "WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort "
    "FROM events GROUP BY user_id) "
    "SELECT f.cohort, date_trunc('week', e.ts) AS week, "
    "count(DISTINCT e.user_id) AS active_users "
    "FROM events e JOIN f USING (user_id) GROUP BY f.cohort, "
    "date_trunc('week', e.ts)")
def q_retention_cohorts(sf_dir: str):
    """Retention cohort matrix: users bucketed by first-activity week,
    distinct actives per (cohort, week) — the standard product-
    analytics rollup, composed from certified ops: grouped min (cohort
    assignment), bucketed hash_join (cohort attach), exact grouped
    count-distinct (ops/distinct.py).  Week granularity (the events
    fixture spans one month).  SQL-oracled (demoted tail)."""
    from .ops.distinct import grouped_count_distinct

    ev = _t(sf_dir, "events", columns=["user_id", "ts"])

    def trunc(b: pa.Table) -> pa.Table:
        # ISO week start (Monday) == DuckDB date_trunc('week')
        wk = pc.floor_temporal(b.column("ts"), unit="week",
                               week_starts_monday=True)
        return pa.table({"user_id": b.column("user_id"), "week": wk})

    evm = ev.map_batches(trunc, batch_format="pyarrow",
                         zero_copy_batch=True)
    first = grouped_aggregate(evm, ["user_id"],
                              {"cohort": ("min", "week")},
                              num_parts=DEFAULT.num_parts)
    ts_t = pa.timestamp("us")
    j = hash_join(evm, first, on="user_id", right_on="user_id",
                  num_parts=DEFAULT.num_parts,
                  left_schema=pa.schema([("user_id", pa.int64()),
                                         ("week", ts_t)]),
                  right_schema=pa.schema([("user_id", pa.int64()),
                                          ("cohort", ts_t)]))
    return grouped_count_distinct(j, ["cohort", "week"], "user_id",
                                  out_col="active_users",
                                  num_parts=DEFAULT.num_parts)


@_q("q_cms_event_counts",
    "SELECT user_id, count(*) AS est FROM events GROUP BY user_id")
def q_cms_event_counts(sf_dir: str):
    """Per-user event counts via a Count-Min sketch (ops/sketch.py::
    cms_build) — constant-communication frequency summary (depth x
    width int64 matrix, sum-merged, bitwise partitioning-invariant),
    probed distributedly against the broadcast sketch.  At the test
    scales the distinct-user count is far below width = 2^16, so the
    estimate is EXACT and the SQL count oracle hash-matches (the
    deterministic-hash analogue of q_heavy_hitters' exact regime); at
    web scale the same sketch answers with err <= (e/width) * N.
    Bound/invariance/weighted tests in tests/test_sketch.py."""
    import ray as _ray

    from .ops.dedup import distinct
    from .ops.sketch import cms_build, cms_query

    ev = _t(sf_dir, "events", columns=["user_id"])
    sk_ref = _ray.put(cms_build(ev, "user_id", width=1 << 16, depth=4))

    def probe(b: pa.Table) -> pa.Table:
        sk = _ray.get(sk_ref)
        return pa.table({
            "user_id": b.column("user_id"),
            "est": pa.array(cms_query(sk, b.column("user_id")))})

    return distinct(ev, ["user_id"]).map_batches(
        probe, batch_format="pyarrow", zero_copy_batch=True)


@_q("q_stats_lineitem",
    "SELECT l_returnflag, "
    "round(avg(l_quantity), 6) AS mean_qty, "
    "round(var_samp(l_quantity), 6) AS var_qty, "
    "round(stddev_samp(l_quantity), 6) AS std_qty, "
    "round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price, "
    "round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price "
    "FROM lineitem GROUP BY l_returnflag")
def q_stats_lineitem(sf_dir: str):
    """Grouped statistical moments (ops/stats.py::moments_aggregate):
    VAR_SAMP / STDDEV_SAMP / COVAR_SAMP / CORR in one pass — per-batch
    raw-moment combiner, one group-cardinality exchange, closed-form
    finish.  Rounded on BOTH sides (6dp; covariance 2dp — its magnitude
    is ~1e4 so 2dp is the same relative tolerance) because summation
    order differs between engines.  SQL-oracled via the demoted
    _ORACLED_TAIL; DuckDB parity swept by tests/test_queries_relational."""
    from .ops.stats import moments_aggregate

    ds = _t(sf_dir, "lineitem",
            columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    out = moments_aggregate(
        ds, ["l_returnflag"],
        {"mean_qty": ("mean", "l_quantity"),
         "var_qty": ("var", "l_quantity"),
         "std_qty": ("std", "l_quantity"),
         "covar_qty_price": ("covar", ("l_quantity", "l_extendedprice")),
         "corr_qty_price": ("corr", ("l_quantity", "l_extendedprice"))},
        round_to=6)

    def reround(b: pa.Table) -> pa.Table:
        v = np.round(b.column("covar_qty_price").to_numpy(zero_copy_only=False), 2)
        i = b.column_names.index("covar_qty_price")
        return b.set_column(i, "covar_qty_price", pa.array(v, type=pa.float64()))

    return out.map_batches(reround, batch_format="pyarrow",
                           zero_copy_batch=True)


@_q("q_regr_lineitem",
    "SELECT l_returnflag, "
    "round(regr_slope(l_extendedprice, l_quantity), 6) AS slope_price_qty, "
    "round(regr_intercept(l_extendedprice, l_quantity), 4) "
    "AS intercept_price_qty, "
    "round(regr_r2(l_extendedprice, l_quantity), 10) AS r2_price_qty "
    "FROM lineitem GROUP BY l_returnflag")
def q_regr_lineitem(sf_dir: str):
    """Grouped ordinary-least-squares regression (ops/stats.py::
    moments_aggregate ops slope/intercept/r2): SQL REGR_SLOPE /
    REGR_INTERCEPT / REGR_R2 in the same one-pass raw-moment plan as
    q_stats_lineitem — no second exchange, the regression is closed
    form over (n, sx, sy, sxx, syy, sxy).  Rounded on BOTH sides
    (slope 6dp, intercept 4dp at ~5e4 magnitude, r2 10dp; measured
    cross-engine deltas are <=1e-10 absolute).  SQL-oracled via the
    demoted _ORACLED_TAIL; swept by tests/test_queries_relational."""
    from .ops.stats import moments_aggregate

    ds = _t(sf_dir, "lineitem",
            columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    out = moments_aggregate(
        ds, ["l_returnflag"],
        {"slope_price_qty": ("slope", ("l_quantity", "l_extendedprice")),
         "intercept_price_qty": ("intercept",
                                 ("l_quantity", "l_extendedprice")),
         "r2_price_qty": ("r2", ("l_quantity", "l_extendedprice"))},
        round_to=10)

    def reround(b: pa.Table) -> pa.Table:
        for col, dp in (("slope_price_qty", 6), ("intercept_price_qty", 4)):
            v = np.round(b.column(col).to_numpy(zero_copy_only=False), dp)
            i = b.column_names.index(col)
            b = b.set_column(i, col, pa.array(v, type=pa.float64()))
        return b

    return out.map_batches(reround, batch_format="pyarrow",
                           zero_copy_batch=True)


@_q("q_shape_stats",
    "SELECT l_returnflag, "
    "round(skewness(l_quantity), 6) AS skew_qty, "
    "round(kurtosis(l_quantity), 6) AS kurt_qty, "
    "mad(l_quantity) AS mad_qty "
    "FROM lineitem GROUP BY l_returnflag")
def q_shape_stats(sf_dir: str):
    """Distribution-shape statistics: grouped SKEWNESS / KURTOSIS
    (ops/stats.py::moments_aggregate — same one-pass raw-moment plan
    extended to sum(x^3)/sum(x^4), bias-corrected Excel/DuckDB forms)
    and exact MAD (ops/stats.py::grouped_mad — median(abs(x-median)),
    both medians computed inside ONE hash bucket, hash-exact vs
    DuckDB).  skew/kurt rounded 6dp on BOTH sides (higher moments
    amplify summation-order drift); mad is unrounded/exact.
    SQL-oracled via the demoted _ORACLED_TAIL; DuckDB parity also
    pinned in tests/test_stats.py."""
    from .ops.join import broadcast_lookup
    from .ops.stats import grouped_mad, moments_aggregate

    ds = _t(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    shape = moments_aggregate(
        ds, ["l_returnflag"],
        {"skew_qty": ("skew", "l_quantity"),
         "kurt_qty": ("kurt", "l_quantity")},
        round_to=6)
    mad = grouped_mad(ds, ["l_returnflag"], "l_quantity",
                      out_col="mad_qty")
    # both sides are one-row-per-group: broadcast the mad table
    mad_t = pa.concat_tables(
        [b for b in mad.iter_batches(batch_format="pyarrow")])
    return broadcast_lookup(shape, "l_returnflag", mad_t,
                            "l_returnflag", ["mad_qty"])


@_q("q_quantiles_prices",
    "SELECT l_returnflag, "
    "quantile_cont(l_extendedprice, 0.25) AS p25, "
    "median(l_extendedprice) AS median_price, "
    "quantile_cont(l_extendedprice, 0.75) AS p75 "
    "FROM lineitem GROUP BY l_returnflag")
def q_quantiles_prices(sf_dir: str):
    """EXACT grouped quantiles (ops/stats.py::grouped_quantile_exact):
    quantile_cont / median semantics, hash-exact vs DuckDB (linear
    interpolation ``lo + frac*(hi-lo)`` on float64 — the two engines
    compute the identical two-element expression, no summation-order
    drift).  The certification twin of the KLL sketch path
    (q_group_quantiles).  SQL-oracled via the demoted _ORACLED_TAIL."""
    from .ops.stats import grouped_quantile_exact

    ds = _t(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    return grouped_quantile_exact(ds, ["l_returnflag"], "l_extendedprice",
                                  [0.25, 0.5, 0.75],
                                  ["p25", "median_price", "p75"])


@_q("q_mode_event_type",
    "SELECT user_id, event_type AS mode_type, c AS n FROM ("
    "SELECT user_id, event_type, count(*) AS c, "
    "row_number() OVER (PARTITION BY user_id "
    "ORDER BY count(*) DESC, event_type ASC) AS rn "
    "FROM events GROUP BY user_id, event_type) WHERE rn = 1")
def q_mode_event_type(sf_dir: str):
    """Deterministic grouped MODE (ops/stats.py::grouped_mode): each
    user's most frequent event type, ties to the smallest value — a
    total order, so it is exactly SQL-reproducible (row_number OVER
    count DESC, value ASC), unlike native mode()'s unspecified ties.
    Two group-cardinality exchanges, never row-sized.  SQL-oracled via
    the demoted _ORACLED_TAIL."""
    from .ops.stats import grouped_mode

    ds = _t(sf_dir, "events", columns=["user_id", "event_type"])
    return grouped_mode(ds, ["user_id"], "event_type",
                        out_col="mode_type", with_count=True)


@_q("q_winsorize_doclen",
    "WITH q AS (SELECT lang, quantile_cont(n_chars, 0.05) AS lo, "
    "quantile_cont(n_chars, 0.95) AS hi FROM documents GROUP BY lang) "
    "SELECT d.doc_id, d.lang, "
    "least(greatest(CAST(d.n_chars AS DOUBLE), q.lo), q.hi) AS n_chars_w "
    "FROM documents d JOIN q ON q.lang = d.lang")
def q_winsorize_doclen(sf_dir: str):
    """Per-language winsorization of document length
    (ops/stats.py::winsorize): clip n_chars to the language's exact
    [p5, p95] band — the heavy-tail curation guard.  min/max clip is
    the same two-branch arithmetic as least(greatest(...)), so it
    hash-matches DuckDB without rounding.  SQL-oracled via the demoted
    _ORACLED_TAIL."""
    from .ops.stats import winsorize

    ds = _t(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    out = winsorize(ds, ["lang"], "n_chars", 0.05, 0.95,
                    out_col="n_chars_w")
    return out.map_batches(
        lambda b: b.select(["doc_id", "lang", "n_chars_w"]),
        batch_format="pyarrow", zero_copy_batch=True)


@_q("q_percent_rank",
    "SELECT event_id, user_id, "
    "percent_rank() OVER (PARTITION BY user_id ORDER BY value) AS pct_rank, "
    "cume_dist() OVER (PARTITION BY user_id ORDER BY value) AS cume "
    "FROM events")
def q_percent_rank(sf_dir: str):
    """percent_rank() + cume_dist() windows (ops/window.py::
    relative_rank): per-user relative position of each event by value.
    Both are int/int float64 ratios so they hash exactly across engines
    (no rounding needed); tie rows get identical values by construction.
    SQL-oracled via the demoted _ORACLED_TAIL; exact DuckDB parity swept
    by tests/test_queries_relational.py."""
    from .ops.window import relative_rank

    ds = _t(sf_dir, "events", columns=["event_id", "user_id", "value"])
    out = relative_rank(ds, "user_id", "value",
                        method={"pct_rank": "percent_rank",
                                "cume": "cume_dist"})
    return out.select_columns(["event_id", "user_id", "pct_rank", "cume"])


@_q("q_cube_events",
    "WITH c AS (SELECT event_type, "
    "CAST(user_id % 8 AS BIGINT) AS user_bucket, "
    "CAST(round(value * 100) AS BIGINT) AS cents FROM events) "
    "SELECT event_type, user_bucket, count(*) AS n_events, "
    "sum(cents) AS cents_sum, max(cents) AS cents_max FROM c "
    "GROUP BY CUBE(event_type, user_bucket)")
def q_cube_events(sf_dir: str):
    """GROUP BY CUBE (ops/agg.py::cube_aggregate): the aggregate at all
    four grouping sets of (event_type, user_bucket) — raw data read
    once, every subset re-aggregates the finest level's group-sized
    output losslessly.  Integer cents so sums hash exactly.  SQL-oracled
    via the demoted _ORACLED_TAIL; DuckDB parity swept by
    tests/test_queries_relational.py."""
    from .ops.agg import cube_aggregate

    ds = _t(sf_dir, "events", columns=["event_type", "user_id", "value"])

    def prep(b: pa.Table) -> pa.Table:
        v = np.rint(b.column("value").to_numpy() * 100).astype(np.int64)
        ub = (b.column("user_id").to_numpy() % 8).astype(np.int64)
        return pa.table({"event_type": b.column("event_type"),
                         "user_bucket": pa.array(ub),
                         "cents": pa.array(v)})

    ds = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return cube_aggregate(ds, ["event_type", "user_bucket"],
                          {"n_events": ("count", None),
                           "cents_sum": ("sum", "cents"),
                           "cents_max": ("max", "cents")})


@_q("q_ntile_orders",
    "SELECT o_orderkey, ntile(4) OVER (PARTITION BY o_orderpriority "
    "ORDER BY o_totalprice, o_orderkey) AS tile FROM orders")
def q_ntile_orders(sf_dir: str):
    """SQL NTILE (ops/window.py::ntile): orders split into 4 price
    quartile bands per priority — one key-partitioned exchange, larger
    bands first per the SQL rule.  o_orderkey tie-break makes the
    assignment total, so DuckDB parity is exact.  SQL-oracled via the
    demoted _ORACLED_TAIL; swept by tests/test_queries_relational.py."""
    from .ops.window import ntile

    ds = _t(sf_dir, "orders",
            columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
    out = ntile(ds, "o_orderpriority", ["o_totalprice"], 4,
                tie_break=["o_orderkey"], out_col="tile")
    return out.select_columns(["o_orderkey", "tile"])


@_q("q_histogram_prices",
    "SELECT CAST(least(floor(l_extendedprice / 10000), 10) AS BIGINT) "
    "AS bucket, count(*) AS n FROM lineitem GROUP BY 1 ORDER BY bucket")
def q_histogram_prices(sf_dir: str):
    """Equal-width histogram via ops/bucketize.py::bucketize with
    EXPLICIT boundaries (the broadcast-searchsorted assignment pass —
    zero shuffle of the data; only the bucket counts aggregate).
    Lower-edge-inclusive bins match SQL width_bucket exactly.
    SQL-oracled via the demoted _ORACLED_TAIL."""
    from .ops.bucketize import bucketize

    ds = _t(sf_dir, "lineitem", columns=["l_extendedprice"])
    b = bucketize(ds, "l_extendedprice",
                  boundaries=np.linspace(10000.0, 100000.0, 10))
    return (b.groupby("bucket").count()
            .rename_columns({"count()": "n"}).sort("bucket"))


@_q("q_event_entropy",
    "WITH c AS (SELECT user_id, event_type, count(*) AS cnt "
    "FROM events GROUP BY 1, 2), "
    "g AS (SELECT user_id, CAST(sum(cnt) AS BIGINT) AS n, "
    "count(*) AS n_distinct, sum(cnt * ln(cnt)) AS s FROM c "
    "GROUP BY user_id) "
    "SELECT user_id, n, n_distinct, round(ln(n) - s / n, 9) AS entropy "
    "FROM g")
def q_event_entropy(sf_dir: str):
    """Per-user Shannon entropy of the event-type mix
    (ops/stats.py::grouped_entropy) — the behavioral-diversity
    diagnostic a mixture sampler / bot filter reads.  Exact int64
    category counts; the closed-form finish is ln of exact ints plus
    one short ln-sum, rounded 9dp on both sides.  SQL-oracled via the
    demoted _ORACLED_TAIL."""
    from .ops.stats import grouped_entropy

    return grouped_entropy(_t(sf_dir, "events",
                              columns=["user_id", "event_type"]),
                           "user_id", "event_type")


@_q("q_chi2_lang_source",
    "WITH c AS (SELECT lang, source, CAST(count(*) AS DOUBLE) AS o "
    "FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL "
    "GROUP BY 1, 2), "
    "r AS (SELECT lang, sum(o) AS rt FROM c GROUP BY 1), "
    "k AS (SELECT source, sum(o) AS ct FROM c GROUP BY 1), "
    "t AS (SELECT sum(o) AS nn FROM c), "
    "grid AS (SELECT r.lang, k.source, r.rt * k.ct / t.nn AS e "
    "FROM r CROSS JOIN k CROSS JOIN t), "
    "j AS (SELECT grid.lang, grid.source, coalesce(c.o, 0) AS o, grid.e "
    "FROM grid LEFT JOIN c ON grid.lang = c.lang "
    "AND grid.source = c.source) "
    "SELECT round(sum((o - e) * (o - e) / e), 9) AS chi2, "
    "CAST(((SELECT count(*) FROM r) - 1) "
    "* ((SELECT count(*) FROM k) - 1) AS BIGINT) AS dof, "
    "round(sqrt(sum((o - e) * (o - e) / e) / ((SELECT nn FROM t) "
    "* least((SELECT count(*) FROM r) - 1, "
    "(SELECT count(*) FROM k) - 1))), 9) AS cramers_v, "
    "CAST((SELECT nn FROM t) AS BIGINT) AS n FROM j")
def q_chi2_lang_source(sf_dir: str):
    """Chi-square independence test lang x source + Cramer's V
    (ops/stats.py::chi2_independence) — is the language mix uniform
    across crawl sources?  One grouped count exchange; the closed-form
    finish runs on the category-bounded contingency table."""
    from .ops.stats import chi2_independence

    return chi2_independence(
        _t(sf_dir, "documents", columns=["lang", "source"]),
        "lang", "source")


@_q("q_ks_drift",
    "WITH u AS (SELECT n_chars AS x, "
    "CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS ia, "
    "CASE WHEN source = 'src1' THEN 1 ELSE 0 END AS ib "
    "FROM documents WHERE source IN ('src0', 'src1')), "
    "g AS (SELECT x, sum(ia) AS ca, sum(ib) AS cb FROM u GROUP BY x), "
    "w AS (SELECT x, "
    "CAST(sum(ca) OVER (ORDER BY x) AS DOUBLE) "
    "/ (SELECT sum(ia) FROM u) AS f1, "
    "CAST(sum(cb) OVER (ORDER BY x) AS DOUBLE) "
    "/ (SELECT sum(ib) FROM u) AS f2 FROM g), "
    "m AS (SELECT max(abs(f1 - f2)) AS d FROM w) "
    "SELECT round(m.d, 9) AS ks_d, "
    "(SELECT min(x) FROM w WHERE abs(f1 - f2) = m.d) AS x_at_max, "
    "(SELECT CAST(sum(ia) AS BIGINT) FROM u) AS n_a, "
    "(SELECT CAST(sum(ib) AS BIGINT) FROM u) AS n_b FROM m")
def q_ks_drift(sf_dir: str):
    """Exact two-sample Kolmogorov-Smirnov doc-length drift between two
    crawl sources (ops/stats.py::ks_two_sample) — the distribution-
    drift gate between snapshots.  Distinct-value CDFs via range-
    partitioned prefix sums; exact-int cumulatives over exact totals
    make the statistic hash-stable at 9 dp."""
    from .ops.stats import ks_two_sample

    return ks_two_sample(
        _t(sf_dir, "documents", columns=["source", "n_chars"]),
        "source", "n_chars", "src0", "src1")


@_q("q_butterflies",
    "WITH pq AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p "
    "FROM lineitem), "
    "wed AS (SELECT a.o AS o1, b.o AS o2, count(*) AS cn "
    "FROM pq a JOIN pq b ON a.p = b.p AND a.o < b.o GROUP BY 1, 2) "
    "SELECT CAST(coalesce(sum(cn * (cn - 1)), 0) // 2 AS BIGINT) "
    "AS n_butterflies, count(*) AS n_codeg_pairs, "
    "coalesce(max(cn), 0) AS max_codeg FROM wed")
def q_butterflies(sf_dir: str):
    """Exact butterfly (2x2 biclique) count of the order x part
    co-purchase bipartite graph (graph/metrics.py::butterfly_stats) —
    the bipartite analogue of the 4-cycle census; butterfly density is
    the standard cohesion measure for two-mode graphs (user x page,
    order x part)."""
    from .graph.metrics import butterfly_stats

    return butterfly_stats(
        _t(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"]),
        "l_orderkey", "l_partkey")


@_q("q_validate_lineitem",
    "SELECT 'not_null' AS rule, 'l_orderkey' AS col, "
    "count(*) AS n_checked, "
    "CAST(count(*) FILTER (WHERE l_orderkey IS NULL) AS BIGINT) "
    "AS n_violations, "
    "count(*) FILTER (WHERE l_orderkey IS NULL) = 0 AS ok "
    "FROM lineitem "
    "UNION ALL SELECT 'in_range', 'l_discount', count(l_discount), "
    "CAST(count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.08) "
    "AS BIGINT), "
    "count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.08) = 0 "
    "FROM lineitem "
    "UNION ALL SELECT 'accepted_values', 'l_returnflag', "
    "count(l_returnflag), "
    "CAST(count(*) FILTER (WHERE l_returnflag IS NOT NULL "
    "AND l_returnflag NOT IN ('A', 'N')) AS BIGINT), "
    "count(*) FILTER (WHERE l_returnflag IS NOT NULL "
    "AND l_returnflag NOT IN ('A', 'N')) = 0 FROM lineitem "
    "UNION ALL SELECT 'matches_regex', 'l_linestatus', "
    "count(l_linestatus), "
    "CAST(count(*) FILTER (WHERE l_linestatus IS NOT NULL "
    "AND NOT regexp_matches(l_linestatus, '^[OF]$')) AS BIGINT), "
    "count(*) FILTER (WHERE l_linestatus IS NOT NULL "
    "AND NOT regexp_matches(l_linestatus, '^[OF]$')) = 0 FROM lineitem "
    "UNION ALL SELECT 'unique', 'l_orderkey,l_linenumber', count(*), "
    "(SELECT CAST(coalesce(sum(n - 1), 0) AS BIGINT) FROM "
    "(SELECT count(*) AS n FROM lineitem "
    "GROUP BY l_orderkey, l_linenumber) WHERE n > 1), "
    "(SELECT coalesce(sum(n - 1), 0) FROM (SELECT count(*) AS n "
    "FROM lineitem GROUP BY l_orderkey, l_linenumber) WHERE n > 1) = 0 "
    "FROM lineitem "
    "UNION ALL SELECT 'foreign_key', 'l_orderkey', count(l_orderkey), "
    "(SELECT CAST(count(*) AS BIGINT) FROM lineitem "
    "WHERE l_orderkey IS NOT NULL AND l_orderkey NOT IN "
    "(SELECT o_orderkey FROM orders)), "
    "(SELECT count(*) FROM lineitem WHERE l_orderkey IS NOT NULL "
    "AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)) = 0 "
    "FROM lineitem")
def q_validate_lineitem(sf_dir: str):
    """Declarative data-contract validation (ops/validate.py) — the
    dbt-test / expectations pass over lineitem: null / range /
    accepted-values / regex / uniqueness / referential integrity, all
    row-local rules folded into ONE streaming pass.  The in_range rule
    is deliberately tighter than the data (discount <= 0.08) so the
    violation path is certified non-trivially."""
    from .ops.validate import validate

    li = _t(sf_dir, "lineitem",
            columns=["l_orderkey", "l_linenumber", "l_discount",
                     "l_returnflag", "l_linestatus"])
    orders = _t(sf_dir, "orders", columns=["o_orderkey"])
    return validate(li, [
        ("not_null", "l_orderkey"),
        ("in_range", "l_discount", 0.0, 0.08),
        ("accepted_values", "l_returnflag", ["A", "N"]),
        ("matches_regex", "l_linestatus", "^[OF]$"),
        ("unique", ["l_orderkey", "l_linenumber"]),
        ("foreign_key", "l_orderkey", orders, "o_orderkey"),
    ])


@_q("q_anova_doclen",
    "WITH g AS (SELECT source, count(*) AS n, sum(n_chars) AS s, "
    "sum(n_chars * n_chars) AS ss FROM documents GROUP BY source), "
    "t AS (SELECT CAST(sum(s) AS DOUBLE) AS st, "
    "CAST(sum(n) AS BIGINT) AS nt, count(*) AS k FROM g), "
    "p AS (SELECT sum(CAST(g.ss AS DOUBLE) "
    "- CAST(g.s AS DOUBLE) * g.s / g.n) AS ssw, "
    "sum(g.n * ((CAST(g.s AS DOUBLE) / g.n - t.st / t.nt) "
    "* (CAST(g.s AS DOUBLE) / g.n - t.st / t.nt))) AS ssb "
    "FROM g CROSS JOIN t) "
    "SELECT round((p.ssb / (t.k - 1)) / (p.ssw / (t.nt - t.k)), 9) "
    "AS f_stat, CAST(t.k - 1 AS BIGINT) AS df_between, "
    "CAST(t.nt - t.k AS BIGINT) AS df_within, t.nt AS n "
    "FROM p CROSS JOIN t")
def q_anova_doclen(sf_dir: str):
    """One-way ANOVA F test of doc length across crawl sources
    (ops/stats.py::anova_oneway) — the k-sample mean-drift companion
    to q_ks_drift.  Exact integer sufficient statistics; float finish
    replays the oracle's literal expression order, rounded 9 dp."""
    from .ops.stats import anova_oneway

    return anova_oneway(
        _t(sf_dir, "documents", columns=["source", "n_chars"]),
        "source", "n_chars")


@_q("q_json_schema",
    "WITH dt AS (SELECT CASE WHEN j IS NULL THEN 'null' "
    "WHEN NOT json_valid(j) THEN 'invalid' "
    "ELSE CASE json_type(j) WHEN 'OBJECT' THEN 'object' "
    "WHEN 'ARRAY' THEN 'array' WHEN 'VARCHAR' THEN 'string' "
    "WHEN 'UBIGINT' THEN 'number_int' WHEN 'BIGINT' "
    "THEN 'number_int' WHEN 'DOUBLE' THEN 'number_float' "
    "WHEN 'BOOLEAN' THEN 'boolean' ELSE 'null' END END AS rt, j "
    "FROM (SELECT props AS j FROM events) raw), "
    "kv AS (SELECT j, unnest(json_keys(j)) AS k FROM dt "
    "WHERE rt = 'object'), "
    "typed AS (SELECT '$.' || k AS path, "
    "CASE json_type(j, '$.' || k) "
    "WHEN 'OBJECT' THEN 'object' WHEN 'ARRAY' THEN 'array' "
    "WHEN 'VARCHAR' THEN 'string' WHEN 'UBIGINT' THEN 'number_int' "
    "WHEN 'BIGINT' THEN 'number_int' "
    "WHEN 'DOUBLE' THEN 'number_float' "
    "WHEN 'BOOLEAN' THEN 'boolean' ELSE 'null' END AS type FROM kv) "
    "SELECT path, type, CAST(count(*) AS BIGINT) AS n FROM typed "
    "GROUP BY 1, 2 "
    "UNION ALL SELECT '$', rt, CAST(count(*) AS BIGINT) FROM dt "
    "GROUP BY rt")
def q_json_schema(sf_dir: str):
    """JSON schema inference over the event props payload
    (ops/strings.py::json_schema_profile) — per-(path, type)
    observation counts, the ingest-time profiling pass.  Gate depth 2
    (root + keys) matches the DuckDB json_keys/json_type oracle; the
    deep/heterogeneous semantics (nested objects, arrays, type
    conflicts, malformed docs) are pinned in tests/test_json_schema.py.
    Known oracle caveat (NOT an operator limit): keys containing
    JSONPath-special characters ('.', '[') break the SQL side's
    '$.'||k path lookup — the Python walk counts them correctly."""
    from .ops.strings import json_schema_profile

    return json_schema_profile(_t(sf_dir, "events", columns=["props"]),
                               "props", max_depth=2)


@_q("q_spearman_lineitem",
    "WITH r AS (SELECT "
    "rank() OVER (ORDER BY l_quantity) "
    "+ (CAST(count(*) OVER (PARTITION BY l_quantity) AS DOUBLE) - 1) "
    "/ 2 AS rx, "
    "rank() OVER (ORDER BY l_extendedprice) "
    "+ (CAST(count(*) OVER (PARTITION BY l_extendedprice) AS DOUBLE) "
    "- 1) / 2 AS ry FROM lineitem) "
    "SELECT round(corr(rx, ry), 9) AS spearman_rho, "
    "CAST(count(*) AS BIGINT) AS n FROM r")
def q_spearman_lineitem(sf_dir: str):
    """Spearman rank correlation of quantity vs extended price
    (ops/stats.py::spearman_corr) — tie-averaged ranks via the
    range-partitioned prefix-sum plan, rank decoration by two bucketed
    joins, one moment reduce.  Rounded 9 dp on both sides."""
    from .ops.stats import spearman_corr

    return spearman_corr(
        _t(sf_dir, "lineitem",
           columns=["l_quantity", "l_extendedprice"]),
        "l_quantity", "l_extendedprice")


@_q("q_psi_drift",
    "WITH u AS (SELECT CASE WHEN n_chars < 50 THEN 0 ELSE "
    "least(CAST(floor((n_chars - 50) / 50.0) AS BIGINT) + 1, 11) END "
    "AS b, CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS ia, "
    "CASE WHEN source = 'src1' THEN 1 ELSE 0 END AS ib "
    "FROM documents WHERE source IN ('src0', 'src1')), "
    "g AS (SELECT b, sum(ia) AS ca, sum(ib) AS cb FROM u GROUP BY b), "
    "t AS (SELECT CAST(sum(ia) AS DOUBLE) AS na, "
    "CAST(sum(ib) AS DOUBLE) AS nb FROM u) "
    "SELECT round(sum(CASE WHEN ca > 0 AND cb > 0 THEN "
    "(ca / t.na - cb / t.nb) * ln((ca / t.na) / (cb / t.nb)) "
    "ELSE 0 END), 9) AS psi, "
    "CAST(count(*) FILTER (WHERE ca > 0 AND cb > 0) AS BIGINT) "
    "AS n_bins_used, "
    "CAST(count(*) FILTER (WHERE ca = 0 OR cb = 0) AS BIGINT) "
    "AS n_bins_skipped, "
    "CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b "
    "FROM g CROSS JOIN t GROUP BY t.na, t.nb")
def q_psi_drift(sf_dir: str):
    """Population Stability Index between two crawl sources over
    explicit doc-length bins (ops/stats.py::psi_drift) — the
    production drift monitor next to q_ks_drift/q_chi2; exact-int bin
    fractions, empty-bin skip convention, 9 dp both sides."""
    from .ops.stats import psi_drift

    return psi_drift(
        _t(sf_dir, "documents", columns=["source", "n_chars"]),
        "source", "n_chars", "src0", "src1",
        boundaries=np.linspace(50.0, 550.0, 11))


@_q("q_selfjoin_size",
    "SELECT CAST(sum(c * c) AS BIGINT) AS selfjoin_size, "
    "count(*) AS n_keys FROM "
    "(SELECT count(*) AS c FROM events GROUP BY user_id)")
def q_selfjoin_size(sf_dir: str):
    """Exact self-join size F2 = sum of squared key frequencies over
    the event stream — the join-planning statistic the AMS sketch
    (ops/sketch.py::ams_f2_build) estimates in sublinear space; the
    sketch's error bound is pinned against this exact value in
    tests/test_sketch_f2.py."""
    import pandas as pd

    from .ops.agg import grouped_aggregate

    cnt = grouped_aggregate(
        _t(sf_dir, "events", columns=["user_id"]), ["user_id"],
        {"c": ("count", None)})

    def part(b: pa.Table) -> pa.Table:
        c = b.column("c").to_numpy()
        return pa.table({"s": pa.array([int((c * c).sum())],
                                       type=pa.int64()),
                         "k": pa.array([len(c)], type=pa.int64())})

    p = cnt.map_batches(part, batch_format="pyarrow",
                        zero_copy_batch=True).to_pandas()
    return pd.DataFrame({
        "selfjoin_size": pd.array([int(p["s"].sum())], dtype="int64"),
        "n_keys": pd.array([int(p["k"].sum())], dtype="int64")})


@_q("q_window_distinct_users",
    "SELECT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) "
    "AS day_bucket, count(DISTINCT user_id) AS n_users, "
    "count(*) AS n_events FROM events GROUP BY day_bucket")
def q_window_distinct_users(sf_dir: str):
    """Daily-window distinct active users — the DAU panel: tumbling
    bucket assignment (stateless map) + exact grouped COUNT DISTINCT
    (ops/distinct.py::grouped_count_distinct, in-batch dedup before
    the exchange) + event counts, one pass."""
    from .ops.distinct import grouped_count_distinct

    ds = _t(sf_dir, "events", columns=["user_id", "ts"])

    def bucket(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64()).to_numpy()
        return pa.table({
            "day_bucket": pa.array(ts // 86400000000, type=pa.int64()),
            "user_id": b.column("user_id")})

    bd = ds.map_batches(bucket, batch_format="pyarrow",
                        zero_copy_batch=True).materialize()
    du = grouped_count_distinct(bd, "day_bucket", "user_id",
                                out_col="n_users")
    ev = grouped_aggregate(bd.select_columns(["day_bucket"]),
                           ["day_bucket"],
                           {"n_events": ("count", None)})
    from .ops.join import hash_join

    du_schema = pa.schema([pa.field("day_bucket", pa.int64()),
                           pa.field("n_users", pa.int64())])
    ev_schema = pa.schema([pa.field("day_bucket", pa.int64()),
                           pa.field("n_events", pa.int64())])
    return hash_join(du, ev, on="day_bucket", right_on="day_bucket",
                     right_cols=["n_events"],
                     num_parts=DEFAULT.num_parts,
                     left_schema=du_schema, right_schema=ev_schema)
