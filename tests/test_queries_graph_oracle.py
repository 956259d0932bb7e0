"""Local replica of the driver gate for the url-level graph oracles:
run each queries_graph query with a build_oracles() SQL entry and
compare rows + schema + values against DuckDB over the fixture truth."""

import duckdb
import pandas as pd
import pytest

from halvesting_geometric_ray.queries_graph import QUERIES, build_oracles

SF = "/root/testdata/sf0.001"

ORACLES = build_oracles()


def _norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_graph_sql_parity(name):
    res = QUERIES[name](SF)
    got = _norm(res.to_pandas() if hasattr(res, "to_pandas") else res)
    exp = _norm(duckdb.connect().execute(ORACLES[name]).fetchdf())
    assert list(got.columns) == list(exp.columns)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_exact=True)
