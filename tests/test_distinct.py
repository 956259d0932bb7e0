"""Grouped count-distinct: exact vs DuckDB; HLL vs error bound."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.ops.distinct import (
    grouped_count_distinct, grouped_count_distinct_hll)


def _df(n=5000, seed=21, groups=8, card=700):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "g": rng.integers(0, groups, n).astype(np.int64),
        "tag": rng.choice(["x", "y"], n),
        "v": rng.integers(0, card, n).astype(np.int64),
    })


def _norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if not pd.api.types.is_numeric_dtype(df[c]):
            df[c] = df[c].astype(str)
        else:
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_exact_matches_duckdb():
    pdf = _df()
    got = grouped_count_distinct(
        rd.from_arrow(pa.Table.from_pandas(pdf)).repartition(6),
        "g", "v").to_pandas()
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.execute(
        "SELECT g, count(DISTINCT v) AS n_distinct FROM t GROUP BY g"
    ).fetchdf()
    pd.testing.assert_frame_equal(_norm(got), _norm(exp),
                                  check_dtype=False)


def test_exact_multi_key():
    pdf = _df()
    got = grouped_count_distinct(
        rd.from_arrow(pa.Table.from_pandas(pdf)).repartition(4),
        ["g", "tag"], "v").to_pandas()
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.execute(
        "SELECT g, tag, count(DISTINCT v) AS n_distinct FROM t "
        "GROUP BY g, tag").fetchdf()
    pd.testing.assert_frame_equal(_norm(got), _norm(exp),
                                  check_dtype=False)


def test_hll_within_error_bound():
    pdf = _df(n=20000, groups=5, card=3000)
    got = grouped_count_distinct_hll(
        rd.from_arrow(pa.Table.from_pandas(pdf)).repartition(7),
        "g", "v", p=12).to_pandas().set_index("g").n_distinct
    truth = pdf.groupby("g").v.nunique()
    rel = 1.04 / np.sqrt(2 ** 12)
    for g in truth.index:
        err = abs(got[g] - truth[g]) / truth[g]
        assert err < 5 * rel, (g, got[g], truth[g], err)


def test_hll_partitioning_invariance():
    pdf = _df(n=3000)
    a = grouped_count_distinct_hll(
        rd.from_arrow(pa.Table.from_pandas(pdf)).repartition(1),
        "g", "v", p=11).to_pandas()
    b = grouped_count_distinct_hll(
        rd.from_arrow(pa.Table.from_pandas(pdf)).repartition(11),
        "g", "v", p=11).to_pandas()
    pd.testing.assert_frame_equal(_norm(a), _norm(b))


def test_profile_matches_duckdb():
    from halvesting_geometric_ray.ops.profile import profile

    pdf = _df(4000)
    pdf.loc[pdf.sample(frac=0.1, random_state=1).index, "tag"] = None
    got = profile(
        rd.from_arrow(pa.Table.from_pandas(pdf)).repartition(7),
        ["v", "tag"]).to_pandas()
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.execute("""
        SELECT count(*) AS n_rows,
               count(v) AS v__n, min(v) AS v__min, max(v) AS v__max,
               count(tag) AS tag__n, min(tag) AS tag__min,
               max(tag) AS tag__max
        FROM t""").fetchdf()
    assert len(got) == 1
    for c in exp.columns:
        assert got[c][0] == exp[c][0], (c, got[c][0], exp[c][0])


def test_profile_validation():
    from halvesting_geometric_ray.ops.profile import profile

    with pytest.raises(ValueError):
        profile(rd.from_arrow(pa.Table.from_pandas(_df(10))), [])


def test_rollup_matches_duckdb():
    from halvesting_geometric_ray.ops.agg import rollup_aggregate

    pdf = _df(3000)
    got = rollup_aggregate(
        rd.from_arrow(pa.Table.from_pandas(pdf)).repartition(5),
        ["g", "tag"],
        {"n": ("count", None), "v_sum": ("sum", "v"),
         "v_max": ("max", "v")}).to_pandas()
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.execute("""
        SELECT g, tag, count(*) AS n, sum(v) AS v_sum, max(v) AS v_max
        FROM t GROUP BY ROLLUP(g, tag)""").fetchdf()
    pd.testing.assert_frame_equal(_norm(got), _norm(exp),
                                  check_dtype=False)


def test_rollup_validation():
    from halvesting_geometric_ray.ops.agg import rollup_aggregate

    ds = rd.from_arrow(pa.Table.from_pandas(_df(10)))
    with pytest.raises(ValueError):
        rollup_aggregate(ds, [], {"n": ("count", None)})


def test_grouped_collect_matches_duckdb():
    from halvesting_geometric_ray.ops.agg import grouped_collect

    pdf = _df(1500)
    got = grouped_collect(
        rd.from_arrow(pa.Table.from_pandas(pdf)).repartition(6),
        ["g"], "v", as_string=True).to_pandas()
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.execute("""
        SELECT g, string_agg(v, ',' ORDER BY v) AS items
        FROM t GROUP BY g""").fetchdf()
    pd.testing.assert_frame_equal(_norm(got), _norm(exp),
                                  check_dtype=False)


def test_grouped_collect_list_and_cap():
    from halvesting_geometric_ray.ops.agg import grouped_collect

    pdf = _df(400)
    got = (grouped_collect(
        rd.from_arrow(pa.Table.from_pandas(pdf)).repartition(3),
        ["g"], "v", max_items=5).to_pandas().set_index("g"))
    for g, sub in pdf.groupby("g"):
        exp = sorted(sub.v)[:5]
        assert list(got.loc[g, "items"]) == exp
