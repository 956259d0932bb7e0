"""moments_aggregate / relative_rank / grouping-sets edge cases vs
DuckDB and closed-form oracles (the happy paths are swept by the
oracle-parity tests in test_queries_relational.py)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.ops.agg import (cube_aggregate,
                                              grouping_sets_aggregate)
from halvesting_geometric_ray.ops.stats import moments_aggregate
from halvesting_geometric_ray.ops.window import relative_rank


def _norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _duck(pdf, sql):
    con = duckdb.connect()
    con.register("t", pdf)
    return con.execute(sql).fetchdf()


def _rand(n=2000, seed=7, groups=13):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "g": rng.integers(0, groups, n).astype(np.int64),
        "x": rng.normal(10.0, 3.0, n),
        "y": rng.normal(100.0, 25.0, n) + 2.5 * rng.normal(10.0, 3.0, n),
    })


def test_moments_match_duckdb():
    pdf = _rand()
    out = moments_aggregate(
        rd.from_pandas(pdf), ["g"],
        {"mean_x": ("mean", "x"), "var_x": ("var", "x"),
         "std_x": ("std", "x"), "cov_xy": ("covar", ("x", "y")),
         "corr_xy": ("corr", ("x", "y"))},
        round_to=8).to_pandas()
    exp = _duck(pdf, "SELECT g, round(avg(x), 8) AS mean_x, "
                     "round(var_samp(x), 8) AS var_x, "
                     "round(stddev_samp(x), 8) AS std_x, "
                     "round(covar_samp(x, y), 8) AS cov_xy, "
                     "round(corr(x, y), 8) AS corr_xy FROM t GROUP BY g")
    pd.testing.assert_frame_equal(_norm(out), _norm(exp), check_dtype=False)


def test_moments_singleton_group_nulls():
    pdf = pd.DataFrame({"g": [1, 2, 2], "x": [5.0, 1.0, 3.0],
                        "y": [2.0, 1.0, 7.0]})
    out = moments_aggregate(
        rd.from_pandas(pdf), ["g"],
        {"mean_x": ("mean", "x"), "var_x": ("var", "x"),
         "cov_xy": ("covar", ("x", "y"))}).to_pandas().set_index("g")
    # n=1: mean defined, sample var/covar NULL (SQL semantics)
    assert out.loc[1, "mean_x"] == 5.0
    assert pd.isna(out.loc[1, "var_x"]) and pd.isna(out.loc[1, "cov_xy"])
    assert out.loc[2, "var_x"] == pytest.approx(2.0)
    assert out.loc[2, "cov_xy"] == pytest.approx(6.0)


def test_skew_kurt_match_duckdb():
    pdf = _rand(3000, seed=19, groups=11)
    out = moments_aggregate(
        rd.from_pandas(pdf), ["g"],
        {"sk_x": ("skew", "x"), "ku_x": ("kurt", "x"),
         "sk_y": ("skew", "y"), "mean_x": ("mean", "x")},
        round_to=7).to_pandas()
    exp = _duck(pdf, "SELECT g, round(skewness(x), 7) AS sk_x, "
                     "round(kurtosis(x), 7) AS ku_x, "
                     "round(skewness(y), 7) AS sk_y, "
                     "round(avg(x), 7) AS mean_x FROM t GROUP BY g")
    pd.testing.assert_frame_equal(_norm(out), _norm(exp), check_dtype=False)


def test_skew_kurt_null_semantics():
    # DuckDB: skew NULL for n<3 or zero variance; kurt NULL for n<4 or
    # zero variance (pinned against duckdb in-run)
    pdf = pd.DataFrame({"g": [1, 1, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4],
                        "x": [1.0, 2.0,
                              1.0, 2.0, 3.0,
                              1.0, 2.0, 3.0, 4.0,
                              5.0, 5.0, 5.0, 5.0]})
    out = moments_aggregate(
        rd.from_pandas(pdf), ["g"],
        {"sk": ("skew", "x"), "ku": ("kurt", "x")},
        round_to=9).to_pandas().set_index("g")
    exp = _duck(pdf, "SELECT g, round(skewness(x), 9) AS sk, "
                     "round(kurtosis(x), 9) AS ku FROM t GROUP BY g"
                ).set_index("g")
    for g in (1, 2, 3, 4):
        for c in ("sk", "ku"):
            e, o = exp.loc[g, c], out.loc[g, c]
            assert (pd.isna(e) and pd.isna(o)) or e == o, (g, c, e, o)
    assert pd.isna(out.loc[1, "sk"]) and pd.isna(out.loc[2, "ku"])
    assert pd.isna(out.loc[4, "sk"]) and pd.isna(out.loc[4, "ku"])


def test_grouped_mad_match_duckdb():
    from halvesting_geometric_ray.ops.stats import grouped_mad

    pdf = _rand(2500, seed=23, groups=9)
    out = grouped_mad(rd.from_pandas(pdf[["g", "x"]]), ["g"], "x",
                      out_col="mad_x").to_pandas()
    exp = _duck(pdf, "SELECT g, mad(x) AS mad_x FROM t GROUP BY g")
    pd.testing.assert_frame_equal(_norm(out), _norm(exp),
                                  check_dtype=False, check_exact=True)


def test_grouped_mad_nulls_and_layout_invariance():
    from halvesting_geometric_ray.ops.stats import grouped_mad

    pdf = pd.DataFrame({"g": [1, 1, 1, 2, 2, 3],
                        "x": [1.0, None, 9.0, 4.0, 4.0, None]})
    out = grouped_mad(rd.from_pandas(pdf), ["g"], "x").to_pandas()
    got = out.set_index("g")["mad"]
    assert got.loc[1] == 4.0  # median 5, devs [4, 4]
    assert got.loc[2] == 0.0
    assert 3 not in got.index  # all-NULL group omitted
    big = _rand(1200, seed=31, groups=5)
    a = grouped_mad(rd.from_pandas(big), ["g"], "x").to_pandas()
    b = grouped_mad(rd.from_pandas(big).repartition(13), ["g"],
                    "x").to_pandas()
    pd.testing.assert_frame_equal(_norm(a), _norm(b), check_exact=True)


def test_corr_zero_variance_null():
    pdf = pd.DataFrame({"g": [0] * 4, "x": [3.0] * 4,
                        "y": [1.0, 2.0, 3.0, 4.0]})
    out = moments_aggregate(rd.from_pandas(pdf), ["g"],
                            {"c": ("corr", ("x", "y"))}).to_pandas()
    assert pd.isna(out["c"].iloc[0])


def test_moments_population_ddof0():
    pdf = pd.DataFrame({"g": [0] * 5, "x": [1.0, 2.0, 3.0, 4.0, 5.0]})
    out = moments_aggregate(rd.from_pandas(pdf), ["g"],
                            {"v": ("var", "x")}, ddof=0).to_pandas()
    assert out["v"].iloc[0] == pytest.approx(2.0)  # population variance


def test_moments_rejects_unknown_op():
    with pytest.raises(ValueError, match="unsupported moment op"):
        moments_aggregate(rd.from_pandas(_rand(50)), ["g"],
                          {"m": ("median", "x")})


def test_percent_rank_single_row_window_is_zero():
    pdf = pd.DataFrame({"g": [1, 2, 2, 2], "v": [9.0, 1.0, 2.0, 2.0]})
    out = relative_rank(rd.from_pandas(pdf), "g", "v",
                        method="percent_rank").to_pandas()
    got = out.set_index(["g", "v"])["percent_rank"]
    assert (got.loc[[(1, 9.0)]] == 0.0).all()  # single-row window
    assert (got.loc[[(2, 1.0)]] == 0.0).all()
    assert (got.loc[[(2, 2.0)]] == 0.5).all()  # ties share the min rank


def test_cume_dist_matches_duckdb():
    pdf = _rand(800, seed=11, groups=7).rename(columns={"x": "v"})
    out = relative_rank(rd.from_pandas(pdf[["g", "v"]]), "g", "v",
                        method="cume_dist", out_col="cd").to_pandas()
    exp = _duck(pdf, "SELECT g, v, cume_dist() OVER "
                     "(PARTITION BY g ORDER BY v) AS cd FROM t")
    pd.testing.assert_frame_equal(_norm(out), _norm(exp[["g", "v", "cd"]]),
                                  check_dtype=False, check_exact=True)


def test_grouping_sets_subset_of_cube():
    pdf = pd.DataFrame({"a": [1, 1, 2, 2], "b": ["x", "y", "x", "y"],
                        "v": [10, 20, 30, 40]})
    out = grouping_sets_aggregate(
        rd.from_pandas(pdf), ["a", "b"], [["a"], []],
        {"s": ("sum", "v")}).to_pandas()
    # keys=(a, b) but no requested set contains b -> b is typed NULL
    # padding in every output row (the SQL shape keeps the column)
    exp = _duck(pdf, "SELECT a, CAST(NULL AS VARCHAR) AS b, sum(v) AS s "
                     "FROM t GROUP BY GROUPING SETS ((a), ())")
    pd.testing.assert_frame_equal(_norm(out), _norm(exp), check_dtype=False)


def test_cube_three_keys_matches_duckdb():
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({"a": rng.integers(0, 3, 300).astype(np.int64),
                        "b": rng.integers(0, 4, 300).astype(np.int64),
                        "c": rng.integers(0, 2, 300).astype(np.int64),
                        "v": rng.integers(1, 50, 300).astype(np.int64)})
    out = cube_aggregate(rd.from_pandas(pdf), ["a", "b", "c"],
                         {"n": ("count", None), "s": ("sum", "v"),
                          "mx": ("max", "v")}).to_pandas()
    exp = _duck(pdf, "SELECT a, b, c, count(*) AS n, sum(v) AS s, "
                     "max(v) AS mx FROM t GROUP BY CUBE(a, b, c)")
    assert len(out) == len(exp)
    pd.testing.assert_frame_equal(_norm(out), _norm(exp), check_dtype=False)


def test_grouping_sets_validation():
    ds = rd.from_pandas(pd.DataFrame({"a": [1], "b": [2], "v": [3]}))
    with pytest.raises(ValueError, match="not a subset"):
        grouping_sets_aggregate(ds, ["a"], [["b"]], {"s": ("sum", "v")})
    with pytest.raises(ValueError, match="duplicate"):
        grouping_sets_aggregate(ds, ["a", "b"], [["a"], ["a"]],
                                {"s": ("sum", "v")})


class TestGroupedQuantileExact:
    def _run(self, df, keys, col, qs, names, **kw):
        import ray.data as rd

        from halvesting_geometric_ray.ops.stats import grouped_quantile_exact

        out = grouped_quantile_exact(rd.from_pandas(df), keys, col, qs,
                                     names, **kw)
        return out.to_pandas().sort_values(keys).reset_index(drop=True)

    def test_matches_numpy_exactly(self):
        rng = np.random.default_rng(5)
        df = pd.DataFrame({
            "k": rng.integers(0, 7, 5000),
            "v": rng.normal(100.0, 42.0, 5000)})
        got = self._run(df, ["k"], "v", [0.25, 0.5, 0.9],
                        ["p25", "p50", "p90"], num_parts=5)
        for _, row in got.iterrows():
            v = np.sort(df.loc[df.k == row.k, "v"].to_numpy())
            for q, name in [(0.25, "p25"), (0.5, "p50"), (0.9, "p90")]:
                rel = q * (len(v) - 1)
                frn, crn = np.floor(rel), np.ceil(rel)
                if frn == crn:
                    exp = v[int(frn)]
                else:
                    exp = v[int(frn)] * (crn - rel) + v[int(crn)] * (rel - frn)
                assert row[name] == exp, (row.k, q)

    def test_duckdb_hash_exact(self):
        import duckdb

        rng = np.random.default_rng(11)
        df = pd.DataFrame({
            "k": rng.choice(["a", "b", "c"], 999),
            "v": rng.lognormal(3.0, 1.0, 999)})
        got = self._run(df, ["k"], "v", [0.5, 0.123], ["med", "q123"],
                        num_parts=3)
        exp = (duckdb.connect().execute(
            "SELECT k, median(v) AS med, quantile_cont(v, 0.123) AS q123 "
            "FROM df GROUP BY k ORDER BY k").fetchdf())
        pd.testing.assert_frame_equal(got, exp, check_exact=True)

    def test_nulls_dropped_and_multikey(self):
        df = pd.DataFrame({
            "a": ["x", "x", "x", "y", "y", "y"],
            "b": [1, 1, 1, 2, 2, 2],
            "v": [1.0, None, 3.0, None, None, 8.0]})
        got = self._run(df, ["a", "b"], "v", [0.5], ["med"])
        assert got.med.tolist() == [2.0, 8.0]  # nulls dropped pre-rank
        # all-null group vanishes
        df2 = pd.DataFrame({"a": ["z", "w"], "b": [0, 0],
                            "v": [None, 5.0]})
        got2 = self._run(df2, ["a", "b"], "v", [0.5], ["med"])
        assert got2.a.tolist() == ["w"]

    def test_validation(self):
        import ray.data as rd

        from halvesting_geometric_ray.ops.stats import grouped_quantile_exact

        ds = rd.from_pandas(pd.DataFrame({"k": [1], "v": [1.0]}))
        with pytest.raises(ValueError):
            grouped_quantile_exact(ds, [], "v", [0.5])
        with pytest.raises(ValueError):
            grouped_quantile_exact(ds, ["k"], "v", [1.5])
        with pytest.raises(ValueError):
            grouped_quantile_exact(ds, ["k"], "v", [0.5], ["a", "b"])


def test_grouped_mode_and_winsorize():
    import ray.data as rd

    from halvesting_geometric_ray.ops.stats import grouped_mode, winsorize

    t = pa.table({"k": ["a"] * 5 + ["b"] * 4,
                  "v": ["x", "x", "y", "y", "z", "q", "q", "p", "p"]})
    got = (grouped_mode(rd.from_arrow(t), ["k"], "v", with_count=True)
           .to_pandas().sort_values("k").reset_index(drop=True))
    # 'a': x and y tie at 2 -> smaller value x; 'b': p/q tie -> p
    assert got["mode"].tolist() == ["x", "p"]
    assert got.n.tolist() == [2, 2]

    rng = np.random.default_rng(3)
    vals = rng.normal(50, 30, 400)
    tw = pa.table({"g": np.repeat(["u", "w"], 200), "x": vals})
    w = (winsorize(rd.from_arrow(tw), ["g"], "x", 0.1, 0.9)
         .to_pandas())
    for g in ("u", "w"):
        sub = vals[:200] if g == "u" else vals[200:]
        lo, hi = np.quantile(sub, [0.1, 0.9])
        ws = w.loc[w.g == g, "x_w"]
        assert np.isclose(ws.min(), lo) and np.isclose(ws.max(), hi)
        assert ((ws >= lo - 1e-12) & (ws <= hi + 1e-12)).all()
        inner = w.loc[w.g == g].query("@lo < x < @hi")
        assert (inner.x_w == inner.x).all()  # untouched interior
    with pytest.raises(ValueError):
        winsorize(rd.from_arrow(tw), ["g"], "x", 0.9, 0.1)


def test_regression_match_duckdb():
    pdf = _rand()
    out = moments_aggregate(
        rd.from_pandas(pdf), ["g"],
        {"slope": ("slope", ("x", "y")),
         "icept": ("intercept", ("x", "y")),
         "r2": ("r2", ("x", "y"))},
        round_to=8).to_pandas()
    exp = _duck(pdf, "SELECT g, round(regr_slope(y, x), 8) AS slope, "
                     "round(regr_intercept(y, x), 8) AS icept, "
                     "round(regr_r2(y, x), 8) AS r2 FROM t GROUP BY g")
    pd.testing.assert_frame_equal(_norm(out), _norm(exp), check_dtype=False)


def test_regression_zero_x_variance_null():
    pdf = pd.DataFrame({"g": [0] * 4, "x": [3.0] * 4,
                        "y": [1.0, 2.0, 3.0, 4.0]})
    out = moments_aggregate(
        rd.from_pandas(pdf), ["g"],
        {"slope": ("slope", ("x", "y")),
         "icept": ("intercept", ("x", "y")),
         "r2": ("r2", ("x", "y"))}).to_pandas()
    assert pd.isna(out["slope"].iloc[0])
    assert pd.isna(out["icept"].iloc[0])
    assert pd.isna(out["r2"].iloc[0])


def test_regression_exact_line():
    # y = 2x + 1 exactly: slope/intercept recovered, r2 == 1
    pdf = pd.DataFrame({"g": [0] * 6, "x": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]})
    pdf["y"] = 2.0 * pdf["x"] + 1.0
    out = moments_aggregate(
        rd.from_pandas(pdf), ["g"],
        {"slope": ("slope", ("x", "y")),
         "icept": ("intercept", ("x", "y")),
         "r2": ("r2", ("x", "y"))}).to_pandas()
    assert out["slope"].iloc[0] == pytest.approx(2.0)
    assert out["icept"].iloc[0] == pytest.approx(1.0)
    assert out["r2"].iloc[0] == pytest.approx(1.0)


def test_robust_scale_matches_duckdb():
    from halvesting_geometric_ray.ops.stats import robust_scale

    pdf = _rand(1500, seed=41, groups=7)[["g", "x"]]
    pdf.loc[3, "x"] = np.nan  # null x -> null scaled
    got = robust_scale(rd.from_pandas(pdf), ["g"], "x").to_pandas()
    exp = _duck(pdf, """
        SELECT t.g, t.x,
               (t.x - s.m) / NULLIF(s.d, 0) AS scaled
        FROM t JOIN (SELECT g, median(x) AS m, mad(x) AS d
                     FROM t GROUP BY g) s USING (g)""")
    pd.testing.assert_frame_equal(_norm(got), _norm(exp),
                                  check_dtype=False, check_exact=True)


def test_robust_scale_zero_mad_and_caps():
    from halvesting_geometric_ray.ops.stats import robust_scale

    pdf = pd.DataFrame({"g": [1, 1, 1, 2, 2],
                        "x": [5.0, 5.0, 5.0, 1.0, 3.0]})
    got = robust_scale(rd.from_pandas(pdf), ["g"], "x").to_pandas()
    assert got[got.g == 1].scaled.isna().all()  # zero MAD
    assert sorted(got[got.g == 2].scaled) == [-1.0, 1.0]
    with pytest.raises(ValueError, match="broadcast_cap"):
        robust_scale(rd.from_pandas(pdf), ["g"], "x", broadcast_cap=1)
