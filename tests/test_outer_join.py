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


def test_bloom_filtered_join_matches_hash_join():
    from halvesting_geometric_ray.ops.join import (bloom_filtered_join,
                                                   hash_join)

    rng = np.random.default_rng(3)
    left = pd.DataFrame({"k": rng.integers(0, 100_000, 20_000),
                         "x": rng.integers(0, 9, 20_000)})
    # selective right side: only 200 keys can match
    right = pd.DataFrame({"k": rng.choice(100_000, 200, replace=False)
                         .astype(np.int64),
                          "y": rng.integers(0, 9, 200)})
    ls = pa.schema([("k", pa.int64()), ("x", pa.int64())])
    rs = pa.schema([("k", pa.int64()), ("y", pa.int64())])
    a = bloom_filtered_join(rd.from_pandas(left), rd.from_pandas(right),
                            on="k", num_parts=8, num_bits=1 << 16,
                            left_schema=ls, right_schema=rs).to_pandas()
    b = hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                  num_parts=8, left_schema=ls,
                  right_schema=rs).to_pandas()
    key = ["k", "x", "y"]
    pa_ = a[key].sort_values(key).reset_index(drop=True)
    pb_ = b[key].sort_values(key).reset_index(drop=True)
    assert pa_.equals(pb_)
    assert len(pa_) > 0


def test_bloom_prefilter_actually_prunes():
    from halvesting_geometric_ray.ops.sketch import (bloom_build,
                                                     bloom_might_contain)

    rng = np.random.default_rng(4)
    right = rd.from_pandas(pd.DataFrame(
        {"k": np.arange(100, dtype=np.int64)}))
    bits = bloom_build(right, "k", num_bits=1 << 16)
    probe = pa.array(rng.integers(100, 1_000_000, 50_000))
    survive = bloom_might_contain(bits, probe).mean()
    assert survive < 0.01  # non-matching keys almost all pruned
