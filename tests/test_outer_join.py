"""Left/full outer hash_join vs exact DuckDB oracles."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import pyarrow as pa
import ray.data as rd

from halvesting_geometric_ray.ops.join import hash_join


def _sides(seed=13):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "k": rng.integers(0, 60, 300).astype(np.int64),
        "x": rng.integers(0, 1000, 300).astype(np.int64)})
    right = pd.DataFrame({
        "rk": rng.integers(30, 90, 200).astype(np.int64),
        "y": rng.integers(0, 1000, 200).astype(np.int64)})
    return left, right


def _duck(left, right, sql):
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    return con.execute(sql).fetchdf()


def _norm(df):
    df = df[sorted(df.columns)].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_left_join_matches_duckdb():
    left, right = _sides()
    got = hash_join(rd.from_arrow(pa.Table.from_pandas(left)).repartition(4),
                    rd.from_arrow(pa.Table.from_pandas(right)).repartition(3),
                    on="k", right_on="rk",
                    join_type="left").to_pandas()
    exp = _duck(left, right,
                "SELECT l.k, l.x, r.y FROM l LEFT JOIN r ON l.k = r.rk")
    pd.testing.assert_frame_equal(_norm(got), _norm(exp),
                                  check_dtype=False)


def test_full_join_matches_duckdb():
    left, right = _sides()
    got = hash_join(rd.from_arrow(pa.Table.from_pandas(left)).repartition(4),
                    rd.from_arrow(pa.Table.from_pandas(right)).repartition(3),
                    on="k", right_on="rk",
                    join_type="full").to_pandas()
    exp = _duck(left, right, """
        SELECT COALESCE(l.k, r.rk) AS k, l.x, r.y
        FROM l FULL OUTER JOIN r ON l.k = r.rk""")
    pd.testing.assert_frame_equal(_norm(got), _norm(exp),
                                  check_dtype=False)


def test_full_join_partitioning_invariance():
    left, right = _sides(seed=5)
    a = _norm(hash_join(rd.from_arrow(pa.Table.from_pandas(left)).repartition(1),
                        rd.from_arrow(pa.Table.from_pandas(right)).repartition(1),
                        on="k", right_on="rk", join_type="full",
                        num_parts=2).to_pandas())
    b = _norm(hash_join(rd.from_arrow(pa.Table.from_pandas(left)).repartition(7),
                        rd.from_arrow(pa.Table.from_pandas(right)).repartition(5),
                        on="k", right_on="rk", join_type="full",
                        num_parts=16).to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_join_type_validated_upfront():
    left, right = _sides()
    with pytest.raises(ValueError):
        hash_join(rd.from_arrow(pa.Table.from_pandas(left)), rd.from_arrow(pa.Table.from_pandas(right)),
                  on="k", right_on="rk", join_type="cross")
    with pytest.raises(ValueError):
        hash_join(rd.from_arrow(pa.Table.from_pandas(left)), rd.from_arrow(pa.Table.from_pandas(right)),
                  on="k", right_on="rk", join_type="full", salt=2)
