"""regex_extract / json_field vs exact DuckDB oracles."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.ops.strings import json_field, regex_extract


def _norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if not pd.api.types.is_numeric_dtype(df[c]):
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_regex_extract_matches_duckdb():
    pdf = pd.DataFrame({
        "id": np.arange(6, dtype=np.int64),
        "s": ["user=bob code=17", "user=eve code=3", "malformed",
              "user=al code=99 extra", "", "user= code=1"]})
    got = regex_extract(
        rd.from_arrow(pa.Table.from_pandas(pdf)).repartition(3),
        "s", r"user=(\w+) code=(\d+)",
        {"u": 1, "c": 2}).to_pandas()
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.execute(r"""
        SELECT id, s,
               NULLIF(regexp_extract(s, 'user=(\w+) code=(\d+)', 1), '') AS u,
               NULLIF(regexp_extract(s, 'user=(\w+) code=(\d+)', 2), '') AS c
        FROM t""").fetchdf()
    pd.testing.assert_frame_equal(_norm(got), _norm(exp),
                                  check_dtype=False)


def test_json_field_matches_duckdb():
    pdf = pd.DataFrame({
        "id": np.arange(5, dtype=np.int64),
        "j": ['{"k": 69}', '{"k": 89, "x": 1}', '{"x": 2}',
              'not json', '{"k": -4}']})
    got = json_field(
        rd.from_arrow(pa.Table.from_pandas(pdf)).repartition(2),
        "j", "$.k", out_col="k", out_type=pa.int64()).to_pandas()
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.execute("""
        SELECT id, j,
               CASE WHEN json_valid(j) THEN
                   CAST(json_extract_string(j, '$.k') AS BIGINT)
               END AS k
        FROM t""").fetchdf()
    pd.testing.assert_frame_equal(_norm(got), _norm(exp),
                                  check_dtype=False)


def test_strings_validation():
    ds = rd.from_arrow(pa.table({"s": pa.array(["a"])}))
    with pytest.raises(Exception):
        regex_extract(ds, "s", "([bad").materialize()
    with pytest.raises(ValueError):
        regex_extract(ds, "s", "(a)", {"x": 0})
    with pytest.raises(ValueError):
        json_field(ds, "s", "k")
