"""lead/lag/row_number window operators vs exact DuckDB oracles."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.ops.window import lead_lag, row_number


def _events(n=500, seed=4):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "user": rng.integers(0, 40, n).astype(np.int64),
        "ts": rng.permutation(n).astype(np.int64),  # unique -> total order
        "amount": rng.integers(1, 100, n).astype(np.int64),
    })


def _duck(pdf, sql):
    con = duckdb.connect()
    con.register("e", pdf)
    return con.execute(sql).fetchdf()


def _norm(df):
    df = df[sorted(df.columns)]
    return (df.sort_values(list(df.columns)).reset_index(drop=True)
            .astype("float64"))


def test_lead_lag_matches_duckdb():
    pdf = _events()
    got = lead_lag(rd.from_pandas(pdf).repartition(5), "user", "ts",
                   {"prev_amount": ("amount", 1),
                    "next_amount": ("amount", -1),
                    "prev2_ts": ("ts", 2)}).to_pandas()
    exp = _duck(pdf, """
        SELECT user, ts, amount,
               lag(amount, 1) OVER w AS prev_amount,
               lead(amount, 1) OVER w AS next_amount,
               lag(ts, 2) OVER w AS prev2_ts
        FROM e WINDOW w AS (PARTITION BY user ORDER BY ts)""")
    pd.testing.assert_frame_equal(_norm(got), _norm(exp),
                                  check_dtype=False)


def test_row_number_matches_duckdb():
    pdf = _events()
    got = row_number(rd.from_pandas(pdf).repartition(3), "user", "amount",
                     descending=True, tie_break=["ts"]).to_pandas()
    exp = _duck(pdf, """
        SELECT user, ts, amount,
               row_number() OVER (PARTITION BY user
                                  ORDER BY amount DESC, ts) AS rn
        FROM e""")
    pd.testing.assert_frame_equal(_norm(got), _norm(exp),
                                  check_dtype=False)


def test_lead_lag_multi_key_partition():
    pdf = _events()
    pdf["day"] = (pdf.ts % 7).astype(np.int64)
    got = lead_lag(rd.from_pandas(pdf), ["user", "day"], "ts",
                   {"prev": ("amount", 1)}).to_pandas()
    exp = _duck(pdf, """
        SELECT user, ts, amount, day,
               lag(amount, 1) OVER (PARTITION BY user, day ORDER BY ts)
                   AS prev
        FROM e""")
    pd.testing.assert_frame_equal(_norm(got), _norm(exp),
                                  check_dtype=False)


def test_window_validation():
    ds = rd.from_pandas(_events(20))
    with pytest.raises(ValueError):
        lead_lag(ds, "user", "ts", {"x": ("amount", 0)})


def test_rank_dense_rank_match_duckdb():
    pdf = _events()
    for meth, fn in [("rank", "rank()"), ("dense_rank", "dense_rank()")]:
        got = row_number(rd.from_pandas(pdf).repartition(4), "user",
                         "amount", descending=True, tie_break=["ts"],
                         out_col="r", method=meth).to_pandas()
        exp = _duck(pdf, f"""
            SELECT user, ts, amount,
                   {fn} OVER (PARTITION BY user ORDER BY amount DESC) AS r
            FROM e""")
        pd.testing.assert_frame_equal(_norm(got), _norm(exp),
                                      check_dtype=False)


def test_cumulative_matches_duckdb():
    from halvesting_geometric_ray.ops.window import cumulative

    pdf = _events()
    got = cumulative(rd.from_pandas(pdf).repartition(4), "user", "ts",
                     {"run_sum": ("amount", "sum"),
                      "run_max": ("amount", "max"),
                      "run_cnt": ("amount", "count")}).to_pandas()
    exp = _duck(pdf, """
        SELECT user, ts, amount,
               sum(amount) OVER w AS run_sum,
               max(amount) OVER w AS run_max,
               count(amount) OVER w AS run_cnt
        FROM e WINDOW w AS (PARTITION BY user ORDER BY ts
                            ROWS UNBOUNDED PRECEDING)""")
    pd.testing.assert_frame_equal(_norm(got), _norm(exp),
                                  check_dtype=False)


def test_cumulative_validation():
    from halvesting_geometric_ray.ops.window import cumulative

    ds = rd.from_pandas(_events(20))
    with pytest.raises(ValueError):
        cumulative(ds, "user", "ts", {"x": ("amount", "median")})
    with pytest.raises(ValueError):
        row_number(ds, "user", "ts", method="ntile")


def test_ntile_matches_duckdb():
    from halvesting_geometric_ray.ops.window import ntile

    pdf = _events(350)
    for n in (1, 3, 4, 7):
        got = ntile(rd.from_pandas(pdf).repartition(4), "user", "ts",
                    n).to_pandas()
        exp = _duck(pdf, f"""
            SELECT user, ts, amount,
                   ntile({n}) OVER (PARTITION BY user ORDER BY ts) AS tile
            FROM e""")
        pd.testing.assert_frame_equal(_norm(got), _norm(exp),
                                      check_dtype=False)


def test_ntile_validation():
    from halvesting_geometric_ray.ops.window import ntile

    with pytest.raises(ValueError):
        ntile(rd.from_pandas(_events(10)), "user", "ts", 0)


def test_window_value_matches_duckdb():
    from halvesting_geometric_ray.ops.window import window_value

    pdf = _events()
    got = window_value(rd.from_pandas(pdf).repartition(5), "user", "ts",
                       {"first_amt": ("amount", "first"),
                        "last_amt": ("amount", "last"),
                        "first_ts": ("ts", "first")}).to_pandas()
    exp = _duck(pdf, """
        SELECT user, ts, amount,
               first_value(amount) OVER w AS first_amt,
               last_value(amount) OVER (PARTITION BY user ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND UNBOUNDED FOLLOWING) AS last_amt,
               first_value(ts) OVER w AS first_ts
        FROM e WINDOW w AS (PARTITION BY user ORDER BY ts)""")
    pd.testing.assert_frame_equal(_norm(got), _norm(exp),
                                  check_dtype=False)


def test_window_value_descending_and_validation():
    from halvesting_geometric_ray.ops.window import window_value

    pdf = _events()
    got = window_value(rd.from_pandas(pdf), "user", "ts", "amount",
                       which="last", descending=True).to_pandas()
    # last under ts desc == first under ts asc
    exp = _duck(pdf, """
        SELECT user, ts, amount,
               first_value(amount) OVER (PARTITION BY user ORDER BY ts)
                   AS last_amount
        FROM e""")
    pd.testing.assert_frame_equal(_norm(got), _norm(exp),
                                  check_dtype=False)
    with pytest.raises(ValueError, match="kind"):
        window_value(rd.from_pandas(pdf), "user", "ts", "amount",
                     which="middle")


def test_sessionize_crafted_gaps():
    from halvesting_geometric_ray.ops.window import sessionize

    US = 1_000_000
    # user 1: gaps 10s, 40s, 10s with gap=30s -> sessions 0,0,1,1
    # user 2: single event -> session 0
    # user 3: exact-gap tie (30s is NOT > 30s) -> same session
    pdf = pd.DataFrame({
        "user": np.array([1, 1, 1, 1, 2, 3, 3], dtype=np.int64),
        "ts": pd.to_datetime(np.array(
            [0, 10 * US, 50 * US, 60 * US, 5 * US, 0, 30 * US]),
            unit="us"),
        "eid": np.arange(7, dtype=np.int64),
    })
    got = sessionize(rd.from_pandas(pdf).repartition(3), "user", "ts",
                     gap_us=30 * US, tie_break=["eid"]).to_pandas()
    got = got.sort_values("eid").reset_index(drop=True)
    assert got.session_idx.tolist() == [0, 0, 1, 1, 0, 0, 0]
    with pytest.raises(ValueError, match="positive"):
        sessionize(rd.from_pandas(pdf), "user", "ts", gap_us=0)
    with pytest.raises(ValueError, match="one timestamp"):
        sessionize(rd.from_pandas(pdf), "user", ["ts", "eid"],
                   gap_us=30 * US)


def test_merge_intervals_crafted():
    from halvesting_geometric_ray.ops.window import merge_intervals

    # user 1: [0,10] [5,8] (contained) [10,12] (touching) [20,25] (gap)
    # user 2: single interval
    # user 3: duplicates merge, count them
    pdf = pd.DataFrame({
        "u": np.array([1, 1, 1, 1, 2, 3, 3], dtype=np.int64),
        "s": np.array([0, 5, 10, 20, 7, 3, 3], dtype=np.int64),
        "e": np.array([10, 8, 12, 25, 9, 6, 6], dtype=np.int64),
    })
    got = (merge_intervals(rd.from_pandas(pdf).repartition(4), "u",
                           "s", "e").to_pandas()
           .sort_values(["u", "span_start"]).reset_index(drop=True))
    exp = pd.DataFrame({
        "u": [1, 1, 2, 3],
        "span_start": [0, 20, 7, 3],
        "span_end": [12, 25, 9, 6],
        "n_merged": [3, 1, 1, 2],
    })
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))
    # gap=5 bridges [12]..[20]
    got5 = (merge_intervals(rd.from_pandas(pdf), "u", "s", "e", gap=8)
            .to_pandas())
    u1 = got5[got5.u == 1]
    assert len(u1) == 1 and u1.n_merged.iloc[0] == 4


def test_merge_intervals_matches_duckdb():
    from halvesting_geometric_ray.ops.window import merge_intervals

    rng = np.random.default_rng(17)
    n = 800
    pdf = pd.DataFrame({
        "u": rng.integers(0, 25, n).astype(np.int64),
        "s": rng.integers(0, 500, n).astype(np.int64),
    })
    pdf["e"] = pdf["s"] + rng.integers(0, 30, n).astype(np.int64)
    got = merge_intervals(rd.from_pandas(pdf).repartition(7), "u",
                          "s", "e").to_pandas()
    exp = _duck(pdf, """
        WITH m AS (SELECT u, s, e, MAX(e) OVER (PARTITION BY u
            ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND
            1 PRECEDING) AS pm FROM e),
        i AS (SELECT u, s, e, SUM(CASE WHEN pm IS NULL OR s > pm
            THEN 1 ELSE 0 END) OVER (PARTITION BY u ORDER BY s, e
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
            FROM m)
        SELECT u, MIN(s) AS span_start, MAX(e) AS span_end,
               COUNT(*) AS n_merged FROM i GROUP BY u, isl""")
    pd.testing.assert_frame_equal(_norm(got), _norm(exp),
                                  check_dtype=False, check_exact=True)
    # layout invariance
    got2 = merge_intervals(rd.from_pandas(pdf).repartition(13), "u",
                           "s", "e", num_parts=5).to_pandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(got2),
                                  check_exact=True)


def test_merge_intervals_timestamps_and_nulls():
    from halvesting_geometric_ray.ops.window import merge_intervals

    US = 1_000_000
    pdf = pd.DataFrame({
        "u": np.array([1, 1, 1, 2], dtype=np.int64),
        "s": pd.to_datetime(
            np.array([0, 30 * US, 100 * US, 0]), unit="us"),
        "e": pd.to_datetime(
            np.array([40 * US, 60 * US, 110 * US, 5 * US]), unit="us"),
    })
    pdf.loc[3, "e"] = pd.NaT  # null end -> row dropped
    got = (merge_intervals(rd.from_pandas(pdf), "u", "s", "e")
           .to_pandas().sort_values(["u", "span_start"])
           .reset_index(drop=True))
    assert got.u.tolist() == [1, 1]
    assert got.span_start.tolist() == [pd.Timestamp(0),
                                       pd.Timestamp(100 * US * 1000)]
    assert got.span_end.tolist() == [pd.Timestamp(60 * US * 1000),
                                     pd.Timestamp(110 * US * 1000)]
    assert got.n_merged.tolist() == [2, 1]
    with pytest.raises(ValueError, match="must differ"):
        merge_intervals(rd.from_pandas(pdf), "u", "s", "s")
