"""Funnel analysis (ops/funnel.py) vs a pure-Python sequential oracle:
earliest-completion semantics, strict-after ties, conversion window,
partitioning invariance, and the DuckDB join-chain parity the gate
query relies on."""

import datetime as dt

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.ops.funnel import funnel_counts, funnel_users


def _ts(m):
    return dt.datetime(2026, 1, 1) + dt.timedelta(minutes=int(m))


def _events(rows):
    """rows: (user, type, minute)"""
    return pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "event_type": [r[1] for r in rows],
        "ts": [_ts(r[2]) for r in rows]})


def _oracle(df, steps, within_us=None):
    """Sequential per-user replay of the documented semantics."""
    depth = {}
    for u, g in df.groupby("user_id"):
        g = g.sort_values("ts")
        t0 = g.loc[g.event_type == steps[0], "ts"].min()
        if pd.isna(t0):
            continue
        t, d = t0, 1
        for s in steps[1:]:
            c = g[(g.event_type == s) & (g.ts > t)]
            if within_us is not None:
                c = c[(c.ts - t0).dt.total_seconds() * 1e6 <= within_us]
            if not len(c):
                break
            t = c.ts.min()
            d += 1
        depth[u] = (d, t0, t)
    return depth


def _check(rows, steps, within_us=None, num_parts=16):
    df = _events(rows)
    got = funnel_users(rd.from_pandas(df), "user_id", "event_type", "ts",
                       steps, within_us=within_us,
                       num_parts=num_parts).to_pandas()
    want = _oracle(df, steps, within_us)
    assert set(got.user_id) == set(want)
    for r in got.itertuples():
        d, t0, t = want[r.user_id]
        assert (r.step_reached, r.t_first, r.t_last) == (d, t0, t), \
            r.user_id
    cnt = funnel_counts(rd.from_pandas(df), "user_id", "event_type",
                        "ts", steps, within_us=within_us,
                        num_parts=num_parts).to_pandas()
    assert list(cnt.step) == list(range(1, len(steps) + 1))
    assert list(cnt.step_name) == steps
    for i in range(len(steps)):
        assert cnt.n_users[i] == sum(
            1 for d, _, _ in want.values() if d >= i + 1)
    # monotone non-increasing
    assert all(np.diff(cnt.n_users.to_numpy()) <= 0)
    return got, cnt


def test_basic_depths_and_counts():
    rows = [
        (1, "A", 0), (1, "B", 5), (1, "C", 9),        # full conversion
        (2, "A", 0), (2, "B", 3),                     # stops at 2
        (3, "A", 7),                                  # stops at 1
        (4, "B", 1), (4, "C", 2),                     # never starts
        (5, "C", 0), (5, "A", 1), (5, "B", 2), (5, "C", 3),  # order matters
    ]
    got, cnt = _check(rows, ["A", "B", "C"])
    assert list(cnt.n_users) == [4, 3, 2]


def test_strict_after_tie_does_not_count():
    # B at the SAME minute as A must not advance the funnel
    rows = [(1, "A", 5), (1, "B", 5),
            (2, "A", 5), (2, "B", 6)]
    got, _ = _check(rows, ["A", "B"])
    d = dict(zip(got.user_id, got.step_reached))
    assert d == {1: 1, 2: 2}


def test_earliest_completion_not_best_path():
    # earliest-A semantics: A@0 is the anchor even though A@10, B@11
    # would convert; B@5 > 0 converts anyway — but B@<first A never does
    rows = [(1, "B", 1), (1, "A", 2), (1, "A", 10)]
    got, _ = _check(rows, ["A", "B"])
    assert got.step_reached.tolist() == [1]


def test_conversion_window():
    rows = [(1, "A", 0), (1, "B", 30),    # inside 60-min window
            (2, "A", 0), (2, "B", 90)]    # outside
    got, cnt = _check(rows, ["A", "B"], within_us=60 * 60 * 1_000_000)
    d = dict(zip(got.user_id, got.step_reached))
    assert d == {1: 2, 2: 1}


def test_partitioning_invariance_random():
    rng = np.random.default_rng(11)
    rows = [(int(rng.integers(0, 40)),
             "ABC"[int(rng.integers(0, 3))],
             int(rng.integers(0, 500))) for _ in range(1200)]
    a, ca = _check(rows, ["A", "B", "C"], num_parts=3)
    b, cb = _check(rows, ["A", "B", "C"], num_parts=16)
    pd.testing.assert_frame_equal(
        a.sort_values("user_id").reset_index(drop=True),
        b.sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(ca.to_pandas() if hasattr(ca, "to_pandas")
                                  else ca, cb.to_pandas()
                                  if hasattr(cb, "to_pandas") else cb)


def test_validation():
    ds = rd.from_pandas(_events([(1, "A", 0)]))
    with pytest.raises(ValueError):
        funnel_users(ds, "user_id", "event_type", "ts", ["A"])
    with pytest.raises(ValueError):
        funnel_users(ds, "user_id", "event_type", "ts", ["A", "A"])
    with pytest.raises(ValueError):
        funnel_users(ds, "user_id", "event_type", "ts", ["A", "B"],
                     within_us=0)


def test_gate_query_duckdb_parity():
    import duckdb

    from halvesting_geometric_ray.queries_relational import ORACLE, QUERIES

    got = QUERIES["q_funnel_events"]("/root/testdata/sf0.001")
    got = (got.to_pandas() if hasattr(got, "to_pandas") else got)
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM read_parquet("
                "'/root/testdata/sf0.001/events.parquet')")
    want = con.execute(ORACLE["q_funnel_events"]).fetchdf()
    pd.testing.assert_frame_equal(
        got.sort_values("step").reset_index(drop=True),
        want.sort_values("step").reset_index(drop=True),
        check_dtype=False)
