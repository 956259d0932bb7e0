"""pivot / unpivot vs exact DuckDB conditional-aggregation oracles."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.ops.pivot import pivot, unpivot

CATS = ["a", "b", "c"]


def _df(n=400, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "k": rng.integers(0, 25, n).astype(np.int64),
        "cat": rng.choice(CATS + [None], n, p=[0.3, 0.3, 0.3, 0.1]),
        "v": rng.integers(-50, 50, n).astype(np.int64),
    })


def _duck(pdf, sql):
    con = duckdb.connect()
    con.register("t", pdf)
    return con.execute(sql).fetchdf()


def _norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_numeric_dtype(df[c]):
            df[c] = df[c].astype("float64")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_pivot_count_matches_duckdb():
    pdf = _df()
    got = pivot(rd.from_pandas(pdf).repartition(5), "k", "cat",
                values=CATS, prefix="n_").to_pandas()
    exp = _duck(pdf, """
        SELECT k,
               count(CASE WHEN cat='a' THEN 1 END) AS n_a,
               count(CASE WHEN cat='b' THEN 1 END) AS n_b,
               count(CASE WHEN cat='c' THEN 1 END) AS n_c
        FROM t GROUP BY k""")
    pd.testing.assert_frame_equal(_norm(got), _norm(exp),
                                  check_dtype=False)


def test_pivot_sum_fill_zero_matches_duckdb():
    pdf = _df()
    got = pivot(rd.from_pandas(pdf).repartition(4), "k", "cat",
                value_col="v", agg="sum", values=CATS).to_pandas()
    exp = _duck(pdf, """
        SELECT k,
               COALESCE(sum(CASE WHEN cat='a' THEN v END), 0) AS a,
               COALESCE(sum(CASE WHEN cat='b' THEN v END), 0) AS b,
               COALESCE(sum(CASE WHEN cat='c' THEN v END), 0) AS c
        FROM t GROUP BY k""")
    pd.testing.assert_frame_equal(_norm(got), _norm(exp),
                                  check_dtype=False)


def test_pivot_max_keeps_null_matches_duckdb():
    pdf = _df()
    got = pivot(rd.from_pandas(pdf).repartition(4), "k", "cat",
                value_col="v", agg="max", values=CATS).to_pandas()
    exp = _duck(pdf, """
        SELECT k,
               max(CASE WHEN cat='a' THEN v END) AS a,
               max(CASE WHEN cat='b' THEN v END) AS b,
               max(CASE WHEN cat='c' THEN v END) AS c
        FROM t GROUP BY k""")
    pd.testing.assert_frame_equal(_norm(got), _norm(exp),
                                  check_dtype=False)


def test_pivot_discovers_values():
    pdf = _df().dropna(subset=["cat"])
    got = pivot(rd.from_pandas(pdf), "k", "cat", values=None).to_pandas()
    assert sorted(got.columns) == ["a", "b", "c", "k"]
    assert int(got[["a", "b", "c"]].to_numpy().sum()) == len(pdf)


def test_pivot_partitioning_invariance():
    pdf = _df()
    one = _norm(pivot(rd.from_pandas(pdf).repartition(1), "k", "cat",
                      value_col="v", agg="sum", values=CATS).to_pandas())
    many = _norm(pivot(rd.from_pandas(pdf).repartition(13), "k", "cat",
                       value_col="v", agg="sum", values=CATS).to_pandas())
    pd.testing.assert_frame_equal(one, many)


def test_unpivot_roundtrip_matches_duckdb():
    pdf = _df().dropna(subset=["cat"])
    wide = pivot(rd.from_pandas(pdf), "k", "cat", value_col="v",
                 agg="sum", values=CATS)
    got = unpivot(wide, ["k"], CATS, var_name="cat",
                  value_name="v").to_pandas()
    exp = _duck(pdf, """
        WITH w AS (SELECT k,
               COALESCE(sum(CASE WHEN cat='a' THEN v END), 0) AS a,
               COALESCE(sum(CASE WHEN cat='b' THEN v END), 0) AS b,
               COALESCE(sum(CASE WHEN cat='c' THEN v END), 0) AS c
            FROM t GROUP BY k)
        SELECT k, 'a' AS cat, a AS v FROM w
        UNION ALL SELECT k, 'b', b FROM w
        UNION ALL SELECT k, 'c', c FROM w""")
    pd.testing.assert_frame_equal(_norm(got), _norm(exp),
                                  check_dtype=False)


def test_pivot_validation():
    ds = rd.from_pandas(_df(30))
    with pytest.raises(ValueError):
        pivot(ds, "k", "cat", agg="median", values=CATS)
    with pytest.raises(ValueError):
        pivot(ds, "k", "cat", agg="sum", values=CATS)  # no value_col
    with pytest.raises(ValueError):
        unpivot(ds, ["k"], [])
