"""Every relational query must match its DuckDB oracle exactly
(row multiset equality after column-name-sorted, row-sorted normalize) —
a local replica of the driver's correctness gate, at sf0.001."""

import duckdb
import pandas as pd
import pytest

from halvesting_geometric_ray.queries_relational import ORACLE, QUERIES

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_pdf(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


@pytest.mark.parametrize("name", sorted(ORACLE.keys()))
def test_query_matches_oracle(name):
    got = _normalize(_to_pdf(QUERIES[name](SF)))
    exp = _normalize(_duck(ORACLE[name]))
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp), (len(got), len(exp))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_exact=True)
