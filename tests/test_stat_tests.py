"""chi2_independence / ks_two_sample vs DuckDB and closed-form
oracles (the sf0.01 paths are swept by the gate replica)."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.ops.stats import (chi2_independence,
                                                ks_two_sample)


def _duck(pdf, sql):
    con = duckdb.connect()
    con.register("t", pdf)
    return con.execute(sql).fetchdf()


def _cat_frame(n=3000, seed=11):
    rng = np.random.default_rng(seed)
    langs = np.array(["en", "fr", "de", "es"])
    srcs = np.array(["s0", "s1", "s2"])
    # dependent: source skews the language mix
    p = np.array([[.5, .2, .2, .1], [.2, .5, .1, .2], [.1, .1, .4, .4]])
    s = rng.integers(0, 3, n)
    l = np.array([rng.choice(4, p=p[i]) for i in s])
    return pd.DataFrame({"lang": langs[l], "source": srcs[s]})


def test_chi2_matches_duckdb():
    pdf = _cat_frame()
    out = chi2_independence(rd.from_pandas(pdf), "lang",
                            "source").to_pandas()
    exp = _duck(pdf, """
      WITH c AS (SELECT lang, source, CAST(count(*) AS DOUBLE) AS o
                 FROM t GROUP BY 1, 2),
      r AS (SELECT lang, sum(o) AS rt FROM c GROUP BY 1),
      k AS (SELECT source, sum(o) AS ct FROM c GROUP BY 1),
      tt AS (SELECT sum(o) AS nn FROM c),
      grid AS (SELECT r.lang, k.source, r.rt * k.ct / tt.nn AS e
               FROM r CROSS JOIN k CROSS JOIN tt),
      j AS (SELECT coalesce(c.o, 0) AS o, grid.e FROM grid
            LEFT JOIN c ON grid.lang = c.lang AND grid.source = c.source)
      SELECT round(sum((o-e)*(o-e)/e), 9) AS chi2,
             CAST(((SELECT count(*) FROM r)-1)
                  * ((SELECT count(*) FROM k)-1) AS BIGINT) AS dof,
             round(sqrt(sum((o-e)*(o-e)/e) / ((SELECT nn FROM tt)
                  * least((SELECT count(*) FROM r)-1,
                          (SELECT count(*) FROM k)-1))), 9) AS cramers_v,
             CAST((SELECT nn FROM tt) AS BIGINT) AS n FROM j""")
    assert out["chi2"][0] == pytest.approx(exp["chi2"][0], abs=2e-9)
    assert out["dof"][0] == exp["dof"][0] == 6
    assert out["cramers_v"][0] == pytest.approx(exp["cramers_v"][0],
                                                abs=2e-9)
    assert out["n"][0] == exp["n"][0] == len(pdf)


def test_chi2_matches_scipy_formula():
    # independent closed-form check on a hand contingency table,
    # including a zero-observed cell
    pdf = pd.DataFrame({"a": ["x"] * 30 + ["y"] * 20 + ["x"] * 10,
                        "b": ["u"] * 30 + ["u"] * 20 + ["v"] * 10})
    out = chi2_independence(rd.from_pandas(pdf), "a", "b").to_pandas()
    o = np.array([[30.0, 10.0], [20.0, 0.0]])
    e = o.sum(1, keepdims=True) @ o.sum(0, keepdims=True) / o.sum()
    chi2 = ((o - e) ** 2 / e).sum()
    assert out["chi2"][0] == pytest.approx(chi2, abs=1e-9)
    assert out["dof"][0] == 1
    v = np.sqrt(chi2 / (o.sum() * 1))
    assert out["cramers_v"][0] == pytest.approx(v, abs=1e-9)


def test_chi2_single_category_null_v():
    pdf = pd.DataFrame({"a": ["x"] * 5, "b": ["u", "v", "u", "v", "u"]})
    out = chi2_independence(rd.from_pandas(pdf), "a", "b").to_pandas()
    assert out["dof"][0] == 0
    assert pd.isna(out["cramers_v"][0])
    assert out["chi2"][0] == pytest.approx(0.0, abs=1e-12)


def _ks_frame(n=4000, seed=3):
    rng = np.random.default_rng(seed)
    g = np.where(rng.random(n) < 0.5, "a", "b")
    x = np.where(g == "a",
                 rng.integers(0, 400, n),
                 rng.integers(30, 460, n)).astype(np.int64)
    return pd.DataFrame({"g": g, "x": x})


def test_ks_matches_duckdb():
    pdf = _ks_frame()
    out = ks_two_sample(rd.from_pandas(pdf), "g", "x", "a",
                        "b").to_pandas()
    exp = _duck(pdf, """
      WITH u AS (SELECT x, CASE WHEN g='a' THEN 1 ELSE 0 END AS ia,
                 CASE WHEN g='b' THEN 1 ELSE 0 END AS ib FROM t
                 WHERE g IN ('a','b')),
      gg AS (SELECT x, sum(ia) AS ca, sum(ib) AS cb FROM u GROUP BY x),
      w AS (SELECT x,
            CAST(sum(ca) OVER (ORDER BY x) AS DOUBLE)
              / (SELECT sum(ia) FROM u) AS f1,
            CAST(sum(cb) OVER (ORDER BY x) AS DOUBLE)
              / (SELECT sum(ib) FROM u) AS f2 FROM gg),
      m AS (SELECT max(abs(f1-f2)) AS d FROM w)
      SELECT round(m.d, 9) AS ks_d,
             (SELECT min(x) FROM w WHERE abs(f1-f2) = m.d) AS x_at_max,
             (SELECT CAST(sum(ia) AS BIGINT) FROM u) AS n_a,
             (SELECT CAST(sum(ib) AS BIGINT) FROM u) AS n_b FROM m""")
    assert out["ks_d"][0] == exp["ks_d"][0]  # bitwise-stable doubles
    assert out["x_at_max"][0] == exp["x_at_max"][0]
    assert out["n_a"][0] == exp["n_a"][0]
    assert out["n_b"][0] == exp["n_b"][0]


def test_ks_matches_scipy_style_oracle():
    # exact reference: evaluate both ECDFs at every distinct value
    pdf = _ks_frame(900, seed=21)
    out = ks_two_sample(rd.from_pandas(pdf), "g", "x", "a",
                        "b").to_pandas()
    xa = np.sort(pdf.loc[pdf.g == "a", "x"].to_numpy())
    xb = np.sort(pdf.loc[pdf.g == "b", "x"].to_numpy())
    grid = np.unique(np.concatenate([xa, xb]))
    fa = np.searchsorted(xa, grid, side="right") / len(xa)
    fb = np.searchsorted(xb, grid, side="right") / len(xb)
    d = np.abs(fa - fb)
    assert out["ks_d"][0] == pytest.approx(d.max(), abs=1e-9)
    assert out["x_at_max"][0] == grid[np.argmax(d)]


def test_ks_identical_distributions_zero():
    pdf = pd.DataFrame({"g": ["a"] * 50 + ["b"] * 50,
                        "x": list(range(50)) * 2})
    out = ks_two_sample(rd.from_pandas(pdf), "g", "x", "a",
                        "b").to_pandas()
    assert out["ks_d"][0] == 0.0
    assert out["n_a"][0] == out["n_b"][0] == 50


def test_ks_empty_group_null():
    pdf = pd.DataFrame({"g": ["a"] * 5, "x": [1, 2, 3, 4, 5]})
    out = ks_two_sample(rd.from_pandas(pdf), "g", "x", "a",
                        "b").to_pandas()
    assert pd.isna(out["ks_d"][0])
    assert out["n_a"][0] == 5 and out["n_b"][0] == 0


def test_ks_partitioning_invariance():
    pdf = _ks_frame(1200, seed=5)
    a = ks_two_sample(rd.from_pandas(pdf), "g", "x", "a", "b",
                      num_parts=3).to_pandas()
    b = ks_two_sample(rd.from_pandas(pdf).repartition(7), "g", "x",
                      "a", "b", num_parts=19).to_pandas()
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_anova_matches_closed_form():
    from halvesting_geometric_ray.ops.stats import anova_oneway

    rng = np.random.default_rng(12)
    g = rng.integers(0, 4, 900)
    x = (rng.integers(50, 500, 900) + g * 40).astype(np.int64)
    pdf = pd.DataFrame({"g": [f"s{int(i)}" for i in g], "x": x})
    out = anova_oneway(rd.from_pandas(pdf), "g", "x").to_pandas()
    # independent closed form
    groups = [x[g == i] for i in range(4)]
    N = len(x)
    k = 4
    M = x.mean()
    ssb = sum(len(gr) * (gr.mean() - M) ** 2 for gr in groups)
    ssw = sum(((gr - gr.mean()) ** 2).sum() for gr in groups)
    f = (ssb / (k - 1)) / (ssw / (N - k))
    assert out["f_stat"][0] == pytest.approx(f, rel=1e-8)
    assert out["df_between"][0] == 3
    assert out["df_within"][0] == N - 4
    assert out["n"][0] == N


def test_anova_degenerate_cases():
    from halvesting_geometric_ray.ops.stats import anova_oneway

    one = pd.DataFrame({"g": ["a"] * 5, "x": [1, 2, 3, 4, 5]})
    out = anova_oneway(rd.from_pandas(one), "g", "x").to_pandas()
    assert pd.isna(out["f_stat"][0]) and out["df_between"][0] == 0
    const = pd.DataFrame({"g": ["a", "a", "b", "b"],
                          "x": [3, 3, 3, 3]})
    out = anova_oneway(rd.from_pandas(const), "g", "x").to_pandas()
    assert pd.isna(out["f_stat"][0])  # zero within-variance


def test_spearman_matches_scipy_formula():
    from halvesting_geometric_ray.ops.stats import spearman_corr

    rng = np.random.default_rng(8)
    x = rng.integers(0, 60, 800).astype(np.int64)  # heavy ties
    y = (x * 3 + rng.integers(0, 40, 800)).astype(np.int64)
    pdf = pd.DataFrame({"x": x, "y": y})
    out = spearman_corr(rd.from_pandas(pdf), "x", "y").to_pandas()
    # reference: Pearson corr of tie-averaged ranks
    rx = pd.Series(x).rank(method="average").to_numpy()
    ry = pd.Series(y).rank(method="average").to_numpy()
    rho = np.corrcoef(rx, ry)[0, 1]
    assert out["spearman_rho"][0] == pytest.approx(rho, abs=1e-9)
    assert out["n"][0] == 800


def test_spearman_matches_duckdb_window_oracle():
    from halvesting_geometric_ray.ops.stats import spearman_corr

    rng = np.random.default_rng(30)
    pdf = pd.DataFrame({"x": rng.integers(0, 25, 500),
                        "y": rng.normal(0, 1, 500).round(2)})
    out = spearman_corr(rd.from_pandas(pdf), "x", "y").to_pandas()
    exp = _duck(pdf, """
      WITH r AS (SELECT
        rank() OVER (ORDER BY x)
          + (CAST(count(*) OVER (PARTITION BY x) AS DOUBLE) - 1)/2 AS rx,
        rank() OVER (ORDER BY y)
          + (CAST(count(*) OVER (PARTITION BY y) AS DOUBLE) - 1)/2 AS ry
        FROM t)
      SELECT round(corr(rx, ry), 9) AS rho FROM r""")
    assert out["spearman_rho"][0] == pytest.approx(exp["rho"][0],
                                                   abs=2e-9)


def test_spearman_perfect_monotone_and_degenerate():
    from halvesting_geometric_ray.ops.stats import spearman_corr

    pdf = pd.DataFrame({"x": [1, 2, 3, 4, 5],
                        "y": [10, 100, 1000, 10000, 100000]})
    out = spearman_corr(rd.from_pandas(pdf), "x", "y").to_pandas()
    assert out["spearman_rho"][0] == 1.0
    const = pd.DataFrame({"x": [1, 1, 1], "y": [1, 2, 3]})
    out = spearman_corr(rd.from_pandas(const), "x", "y").to_pandas()
    assert pd.isna(out["spearman_rho"][0])


def test_psi_matches_reference_formula():
    from halvesting_geometric_ray.ops.stats import psi_drift

    rng = np.random.default_rng(15)
    n = 2000
    g = np.where(rng.random(n) < 0.5, "a", "b")
    x = np.where(g == "a", rng.normal(100, 20, n),
                 rng.normal(115, 25, n)).astype(np.int64)
    pdf = pd.DataFrame({"g": g, "x": x})
    edges = np.linspace(40.0, 200.0, 9)
    out = psi_drift(rd.from_pandas(pdf), "g", "x", "a", "b",
                    boundaries=edges).to_pandas()
    # reference: same lower-edge-inclusive binning
    def bins(v):
        return np.searchsorted(edges, v, side="right")

    xa, xb = x[g == "a"], x[g == "b"]
    psi = 0.0
    used = 0
    for bin_ in range(len(edges) + 1):
        p = (bins(xa) == bin_).sum() / len(xa)
        q = (bins(xb) == bin_).sum() / len(xb)
        if p > 0 and q > 0:
            psi += (p - q) * np.log(p / q)
            used += 1
    assert out["psi"][0] == pytest.approx(psi, abs=1e-9)
    assert out["n_bins_used"][0] == used
    assert out["n_a"][0] == len(xa) and out["n_b"][0] == len(xb)


def test_psi_identical_zero_and_validation():
    from halvesting_geometric_ray.ops.stats import psi_drift

    pdf = pd.DataFrame({"g": ["a"] * 100 + ["b"] * 100,
                        "x": list(range(100)) * 2})
    out = psi_drift(rd.from_pandas(pdf), "g", "x", "a", "b",
                    boundaries=[0.0, 25.0, 50.0, 75.0, 100.0]
                    ).to_pandas()
    assert out["psi"][0] == 0.0
    with pytest.raises(ValueError):
        psi_drift(rd.from_pandas(pdf), "g", "x", "a", "b",
                  boundaries=[1.0])


def test_anova_rejects_float_and_null_values():
    from halvesting_geometric_ray.ops.stats import anova_oneway

    floats = pd.DataFrame({"g": ["a", "a", "b", "b"],
                           "x": [1.5, 2.5, 3.5, 4.5]})
    with pytest.raises(Exception) as ei:
        anova_oneway(rd.from_pandas(floats), "g", "x").to_pandas()
    assert "integer" in str(ei.value)
    nulls = pd.DataFrame({"g": ["a", "a", "b", "b"],
                          "x": pd.array([1, None, 3, 4],
                                        dtype="Int64")})
    with pytest.raises(Exception) as ei:
        anova_oneway(rd.from_pandas(nulls), "g", "x").to_pandas()
    assert "null" in str(ei.value)
