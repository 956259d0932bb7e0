"""Edge splits / negative sampling determinism + the new event-time
queries vs DuckDB."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.splits import negative_sample, split_edges
from halvesting_geometric_ray.queries_relational import ORACLE, QUERIES

SF = "/root/testdata/sf0.001"


def _duck(sql):
    con = duckdb.connect()
    for t in ["events", "orders"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def _norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", ["q_tumbling_window", "q_sessionize",
                                  "q_asof_join"])
def test_event_queries_vs_duckdb(name):
    got = _norm(QUERIES[name](SF).to_pandas())
    exp = _norm(_duck(ORACLE[name]))
    assert list(got.columns) == list(exp.columns)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)


def test_split_deterministic_and_proportional(tiny_graph):
    edges = rd.read_parquet(tiny_graph.edges)
    a = split_edges(edges).to_pandas().sort_values(["src", "dst"])
    b = split_edges(edges).to_pandas().sort_values(["src", "dst"])
    assert (a.split.to_numpy() == b.split.to_numpy()).all()
    frac = a.split.value_counts(normalize=True)
    assert 0.6 < frac.get("train", 0) < 0.95  # small-sample tolerance


def test_negative_samples_are_non_edges(tiny_graph):
    edges = rd.read_parquet(tiny_graph.edges)
    n = tiny_graph.num_vertices
    neg = negative_sample(edges, n, 50).to_pandas()
    assert len(neg) == 50
    es = set(map(tuple, edges.to_pandas()[["src", "dst"]].to_numpy()))
    got = set(map(tuple, neg[["src", "dst"]].to_numpy()))
    assert not (got & es)
    assert all(s != d for s, d in got)
    # deterministic
    neg2 = negative_sample(edges, n, 50).to_pandas()
    assert (neg.sort_values(["src", "dst"]).to_numpy()
            == neg2.sort_values(["src", "dst"]).to_numpy()).all()


def test_salted_join_equals_unsalted(tiny_graph):
    """Hub-key salting: same result set, spread across salt sub-buckets."""
    import pyarrow as pa
    import ray.data as rd

    from halvesting_geometric_ray.ops.join import hash_join

    # skewed left: one hub key with many rows
    import numpy as np

    n = 5000
    left = pa.table({"k": pa.array(np.where(np.arange(n) % 10 < 8, 1,
                                            np.arange(n)).astype(np.int64)),
                     "payload": pa.array(np.arange(n))})
    right = pa.table({"k": pa.array(np.arange(n, dtype=np.int64)),
                      "val": pa.array(np.arange(n) * 2)})
    a = hash_join(rd.from_arrow(left), rd.from_arrow(right), on="k",
                  salt=1).to_pandas()
    b = hash_join(rd.from_arrow(left), rd.from_arrow(right), on="k",
                  salt=4).to_pandas()
    key = ["k", "payload", "val"]
    assert (a[key].sort_values(key).to_numpy()
            == b[key].sort_values(key).to_numpy()).all()
