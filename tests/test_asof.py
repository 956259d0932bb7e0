"""As-of join operator: bucketed big-big path vs broadcast path vs a
pandas merge_asof oracle, including a right side far larger than the
left (the case the broadcast regime cannot serve at scale)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.ops.asof import asof_join, broadcast_asof

TS = pa.timestamp("us")


def _mk(seed=5, n_left=2000, n_right=8000, n_keys=97):
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-01-01", "us")
    left = pd.DataFrame({
        "event_id": np.arange(n_left, dtype="int64"),
        "user_id": rng.integers(0, n_keys, n_left),
        "ts": base + rng.integers(0, 10**9, n_left).astype("timedelta64[us]"),
    })
    right = pd.DataFrame({
        "o_custkey": rng.integers(0, n_keys, n_right),
        "o_orderdate": base + rng.integers(0, 10**9, n_right)
        .astype("timedelta64[us]"),
        "price": rng.random(n_right),
    })
    return left, right


def _oracle(left, right):
    l = left.sort_values("ts", kind="mergesort")
    r = right.sort_values("o_orderdate", kind="mergesort")
    m = pd.merge_asof(l, r, left_on="ts", right_on="o_orderdate",
                      left_by="user_id", right_by="o_custkey",
                      direction="backward")
    m = m.dropna(subset=["o_orderdate"])
    return (m[["user_id", "event_id", "o_orderdate", "price"]]
            .sort_values(["user_id", "event_id"]).reset_index(drop=True))


def _norm(df):
    return (df[["user_id", "event_id", "o_orderdate", "price"]]
            .sort_values(["user_id", "event_id"]).reset_index(drop=True))


L_SCHEMA = pa.schema([pa.field("event_id", pa.int64()),
                      pa.field("user_id", pa.int64()),
                      pa.field("ts", TS)])
R_SCHEMA = pa.schema([pa.field("o_custkey", pa.int64()),
                      pa.field("o_orderdate", TS),
                      pa.field("price", pa.float64())])


def test_bucketed_asof_matches_oracle_big_right():
    left, right = _mk()
    got = asof_join(
        rd.from_pandas(left).repartition(8),
        rd.from_pandas(right).repartition(8),
        on="ts", right_on="o_orderdate", by="user_id", right_by="o_custkey",
        left_cols=["event_id", "ts"], right_cols=["o_orderdate", "price"],
        left_schema=L_SCHEMA, right_schema=R_SCHEMA).to_pandas()
    pd.testing.assert_frame_equal(_norm(got), _oracle(left, right))


def test_broadcast_asof_matches_bucketed():
    left, right = _mk(seed=9, n_right=500)
    bc = broadcast_asof(
        rd.from_pandas(left).repartition(4),
        pa.Table.from_pandas(right, preserve_index=False).cast(R_SCHEMA),
        on="ts", right_on="o_orderdate", by="user_id", right_by="o_custkey",
        left_cols=["event_id", "ts"],
        right_cols=["o_orderdate", "price"]).to_pandas()
    bk = asof_join(
        rd.from_pandas(left).repartition(4),
        rd.from_pandas(right).repartition(4),
        on="ts", right_on="o_orderdate", by="user_id", right_by="o_custkey",
        left_cols=["event_id", "ts"], right_cols=["o_orderdate", "price"],
        left_schema=L_SCHEMA, right_schema=R_SCHEMA).to_pandas()
    pd.testing.assert_frame_equal(_norm(bc), _norm(bk))
    pd.testing.assert_frame_equal(_norm(bk), _oracle(left, right))


def test_asof_int64_payload_above_2_53_exact():
    """Right payloads > 2^53 survive exactly: merge_asof's NaN-driven
    float64 coercion must not round matched int64 ids (regression —
    positional-index merge)."""
    big = (1 << 60) + 1
    left = pd.DataFrame({
        "event_id": [1, 2], "user_id": np.array([7, 7], dtype="int64"),
        "ts": pd.to_datetime(["2024-01-01", "2024-01-05"])})
    right = pd.DataFrame({
        "o_custkey": np.array([7], dtype="int64"),
        "o_orderdate": pd.to_datetime(["2024-01-03"]),
        "big_id": np.array([big], dtype="int64")})
    r_schema = pa.schema([pa.field("o_custkey", pa.int64()),
                          pa.field("o_orderdate", TS),
                          pa.field("big_id", pa.int64())])
    got = asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        on="ts", right_on="o_orderdate", by="user_id", right_by="o_custkey",
        left_cols=["event_id"], right_cols=["big_id"],
        left_schema=L_SCHEMA, right_schema=r_schema).to_pandas()
    # event 1 predates every order (unmatched -> NaN in the merge);
    # event 2 matches and must carry the EXACT id
    assert got.event_id.tolist() == [2]
    assert got.big_id.tolist() == [big]

    bc = broadcast_asof(
        rd.from_pandas(left),
        pa.Table.from_pandas(right, preserve_index=False).cast(r_schema),
        on="ts", right_on="o_orderdate", by="user_id", right_by="o_custkey",
        left_cols=["event_id"], right_cols=["big_id"]).to_pandas()
    assert bc.big_id.tolist() == [big]


def test_asof_keys_without_matches_dropped():
    left = pd.DataFrame({
        "event_id": [1, 2], "user_id": np.array([1, 2], dtype="int64"),
        "ts": pd.to_datetime(["2024-01-02", "2024-01-02"])})
    right = pd.DataFrame({
        "o_custkey": np.array([1], dtype="int64"),
        "o_orderdate": pd.to_datetime(["2024-01-03"]),  # after -> no match
        "price": [1.0]})
    got = asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        on="ts", right_on="o_orderdate", by="user_id", right_by="o_custkey",
        left_cols=["event_id", "ts"], right_cols=["o_orderdate", "price"],
        left_schema=L_SCHEMA, right_schema=R_SCHEMA).to_pandas()
    assert len(got) == 0


def test_asof_mixed_timestamp_units():
    """Right ordering column in ns vs left in us: the bucketed join must
    normalize units (regression — per-bucket merge_asof raised
    MergeError on mixed units before r3)."""
    left, right = _mk(seed=13, n_left=400, n_right=900)
    r_ns = right.copy()
    r_ns["o_orderdate"] = r_ns["o_orderdate"].astype("datetime64[ns]")
    r_schema_ns = pa.schema([pa.field("o_custkey", pa.int64()),
                             pa.field("o_orderdate", pa.timestamp("ns")),
                             pa.field("price", pa.float64())])
    got = asof_join(
        rd.from_pandas(left).repartition(4),
        rd.from_arrow(pa.Table.from_pandas(r_ns, preserve_index=False)
                      .cast(r_schema_ns)),
        on="ts", right_on="o_orderdate", by="user_id", right_by="o_custkey",
        left_cols=["event_id", "ts"], right_cols=["o_orderdate", "price"],
        left_schema=L_SCHEMA, right_schema=r_schema_ns).to_pandas()
    exp = _oracle(left, right)
    got_n = _norm(got)
    got_n["o_orderdate"] = got_n["o_orderdate"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got_n, exp)


def test_asof_incompatible_order_types_fail_fast():
    """A right ordering column Arrow cannot cast to the left's type must
    be rejected at plan time with a clear error, not an opaque MergeError
    inside a bucket task (string->timestamp IS castable — ISO parse — so
    the uncastable case needs a nested type)."""
    left, right = _mk(seed=1, n_left=50, n_right=50)
    right = right.drop(columns=["o_orderdate"])
    right["o_lst"] = [[1, 2]] * len(right)
    r_schema = pa.schema([pa.field("o_custkey", pa.int64()),
                          pa.field("o_lst", pa.list_(pa.int64())),
                          pa.field("price", pa.float64())])
    with pytest.raises(TypeError, match="incompatible"):
        asof_join(
            rd.from_pandas(left), rd.from_pandas(right),
            on="ts", right_on="o_lst", by="user_id", right_by="o_custkey",
            left_cols=["event_id"], right_cols=["price"],
            left_schema=L_SCHEMA, right_schema=r_schema)
