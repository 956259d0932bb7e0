"""Range join vs exact DuckDB oracles, all boundary modes."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.ops.range_join import range_join


def _sides(seed=19):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "k": rng.integers(0, 20, 400).astype(np.int64),
        "t": rng.integers(0, 1000, 400).astype(np.int64),
        "eid": np.arange(400, dtype=np.int64)})
    right = pd.DataFrame({
        "rk": rng.integers(0, 20, 150).astype(np.int64),
        "lo": rng.integers(0, 900, 150).astype(np.int64),
        "rid": np.arange(150, dtype=np.int64)})
    right["hi"] = right.lo + rng.integers(10, 200, 150)
    return left, right


def _duck(left, right, sql):
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    return con.execute(sql).fetchdf()


def _norm(df):
    df = df[sorted(df.columns)].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


OPS = {"both": (">=", "<="), "left": (">=", "<"),
       "right": (">", "<="), "neither": (">", "<")}


@pytest.mark.parametrize("inclusive", list(OPS))
def test_range_join_matches_duckdb(inclusive):
    left, right = _sides()
    got = range_join(
        rd.from_arrow(pa.Table.from_pandas(left)).repartition(5),
        rd.from_arrow(pa.Table.from_pandas(right)).repartition(3),
        on="k", right_on="rk", left_ts="t", right_start="lo",
        right_end="hi", inclusive=inclusive).to_pandas()
    lo_op, hi_op = OPS[inclusive]
    exp = _duck(left, right, f"""
        SELECT l.k, l.t, l.eid, r.lo, r.hi, r.rid
        FROM l JOIN r ON l.k = r.rk
        AND l.t {lo_op} r.lo AND l.t {hi_op} r.hi""")
    pd.testing.assert_frame_equal(_norm(got), _norm(exp),
                                  check_dtype=False)


def test_range_join_validation():
    left, right = _sides()
    with pytest.raises(ValueError):
        range_join(rd.from_arrow(pa.Table.from_pandas(left)),
                   rd.from_arrow(pa.Table.from_pandas(right)),
                   on="k", right_on="rk", left_ts="t",
                   right_start="lo", right_end="hi",
                   inclusive="sideways")
