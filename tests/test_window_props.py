"""Property tests: window + loser-dedup exchanges vs oracles on
randomized shapes (sizes, key cardinalities, partitionings)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings, strategies as st

from halvesting_geometric_ray.ops.dedup import subset_dup_losers
from halvesting_geometric_ray.ops.window import lead_lag


@settings(max_examples=8, deadline=None)
@given(n=st.integers(1, 300), n_keys=st.integers(1, 12),
       parts=st.integers(1, 6), seed=st.integers(0, 2**31 - 1))
def test_lead_lag_random_frames_match_duckdb(n, n_keys, parts, seed):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({
        "k": rng.integers(0, n_keys, n).astype(np.int64),
        "o": rng.permutation(n).astype(np.int64),
        "v": rng.integers(-100, 100, n).astype(np.int64)})
    got = lead_lag(rd.from_arrow(pa.Table.from_pandas(pdf))
                   .repartition(parts), "k", "o",
                   {"p": ("v", 1), "nx": ("v", -1)}).to_pandas()
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.execute("""
        SELECT k, o, v, lag(v, 1) OVER w AS p, lead(v, 1) OVER w AS nx
        FROM t WINDOW w AS (PARTITION BY k ORDER BY o)""").fetchdf()

    def norm(df):
        df = df[sorted(df.columns)].astype("float64")
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    pd.testing.assert_frame_equal(norm(got), norm(exp),
                                  check_dtype=False)


@settings(max_examples=8, deadline=None)
@given(n=st.integers(1, 400), n_keys=st.integers(1, 20),
       parts=st.integers(1, 7), seed=st.integers(0, 2**31 - 1))
def test_dup_losers_random_match_pandas(n, n_keys, parts, seed):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({
        "h": rng.integers(0, n_keys, n).astype(np.int64),
        "id": rng.permutation(n).astype(np.int64)})
    ldf = subset_dup_losers(
        rd.from_arrow(pa.Table.from_pandas(pdf)).repartition(parts),
        "h", "id").to_pandas()
    # empty Ray datasets lose their schema in to_pandas (known gotcha)
    got = sorted(ldf.id) if len(ldf) else []
    exp = sorted(pdf[pdf.id != pdf.groupby("h").id.transform("min")].id)
    assert got == exp
