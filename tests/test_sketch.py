"""HyperLogLog distinct-count sketch vs exact counts."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from halvesting_geometric_ray.ops.sketch import hll_count_distinct


def test_hll_accuracy_across_cardinalities():
    rng = np.random.default_rng(2)
    for true_n in (50, 1000, 100_000):
        vals = rng.choice(10**12, size=true_n, replace=False)
        # duplicate every value ~3x so the sketch must actually dedup
        data = np.concatenate([vals, rng.choice(vals, size=2 * true_n)])
        rng.shuffle(data)
        ds = rd.from_pandas(pd.DataFrame({"v": data})).repartition(8)
        est = hll_count_distinct(ds, "v", p=14)
        rel = abs(est - true_n) / true_n
        assert rel < 0.05, (true_n, est, rel)


def test_hll_deterministic_and_merge_order_free():
    vals = pd.DataFrame({"v": np.arange(5000, dtype=np.int64)})
    a = hll_count_distinct(rd.from_pandas(vals).repartition(2), "v")
    b = hll_count_distinct(rd.from_pandas(vals).repartition(16), "v")
    assert a == b  # register max-merge commutes; partitioning-free


def test_hll_strings():
    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["text"])
    est = hll_count_distinct(docs, "text", p=14)
    import duckdb

    exact = duckdb.connect().execute(
        "SELECT count(DISTINCT text) FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).fetchone()[0]
    assert abs(est - exact) / exact < 0.05


def test_hll_merge_parts_invariant():
    """The distributed tree-merge level must not change the estimate:
    register max-merge is associative, so any merge_parts gives the
    SAME registers and hence an identical count."""
    from halvesting_geometric_ray.ops.sketch import hll_count_distinct_multi

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 50_000, 200_000)
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(24)
    a = hll_count_distinct_multi(ds, ["v"], merge_parts=1)["v"]
    b = hll_count_distinct_multi(ds, ["v"], merge_parts=4)["v"]
    c = hll_count_distinct_multi(ds, ["v"], merge_parts=16)["v"]
    assert a == b == c


def test_heavy_hitters_exact_regime():
    """capacity >= distinct -> the MG summary never trims: output equals
    exact top-k with count_min == count_max == the true count."""
    from halvesting_geometric_ray.ops.sketch import heavy_hitters

    rng = np.random.default_rng(0)
    keys = rng.zipf(1.5, size=50_000) % 1000
    ds = rd.from_pandas(pd.DataFrame({"k": keys.astype("int64")})) \
        .repartition(16)
    out = heavy_hitters(ds, "k", k=10, capacity=4096).to_pandas()
    vc = pd.Series(keys).value_counts()
    truth = sorted(((int(c), int(v)) for v, c in vc.items()),
                   key=lambda t: (-t[0], t[1]))[:10]
    assert list(zip(out.count_min, out.k)) == truth
    assert (out.count_min == out.count_max).all()
    # merge-level invariance in the exact regime
    out1 = heavy_hitters(ds, "k", k=10, capacity=4096,
                         merge_parts=1).to_pandas()
    assert out1.equals(out)


def test_heavy_hitters_bounds_and_top1_in_tight_regime():
    """With capacity far below the distinct count the MG guarantees
    still hold: count_min <= true <= count_max for every reported key,
    and the dominant key of a zipf stream is reported."""
    from halvesting_geometric_ray.ops.sketch import heavy_hitters

    rng = np.random.default_rng(0)
    keys = rng.zipf(1.5, size=50_000) % 1000
    ds = rd.from_pandas(pd.DataFrame({"k": keys.astype("int64")})) \
        .repartition(16)
    vc = pd.Series(keys).value_counts()
    out = heavy_hitters(ds, "k", k=10, capacity=32,
                        merge_parts=4).to_pandas()
    for _, r in out.iterrows():
        true = int(vc.get(r.k, 0))
        assert r.count_min <= true <= r.count_max
    top1 = sorted(((int(c), int(v)) for v, c in vc.items()),
                  key=lambda t: (-t[0], t[1]))[0][1]
    assert top1 in set(out.k)


def test_heavy_hitters_string_keys_and_nulls():
    from halvesting_geometric_ray.ops.sketch import heavy_hitters

    vals = (["a"] * 50 + ["b"] * 30 + ["c"] * 20 + [None] * 10)
    ds = rd.from_arrow(pa.table({"s": pa.array(vals)})).repartition(4)
    out = heavy_hitters(ds, "s", k=3, capacity=100).to_pandas()
    assert list(out.s) == ["a", "b", "c"]
    assert list(out.count_min) == [50, 30, 20]
    assert out.s.notna().all()


# ---------------------------------------------------------------- KLL


from halvesting_geometric_ray.ops.sketch import _KLL, quantile_sketch


def _rank_err(sorted_vals: np.ndarray, est: float, q: float) -> float:
    return abs(np.searchsorted(sorted_vals, est) / len(sorted_vals) - q)


def test_kll_rank_error_bound():
    rng = np.random.default_rng(5)
    x = rng.lognormal(3.0, 1.5, 200_000)  # heavy-tailed
    sk = _KLL(256)
    for chunk in np.array_split(x, 64):
        sk.add(chunk)
    assert sk.n == len(x)
    xs = np.sort(x)
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = sk.quantiles([q])[0]
        assert _rank_err(xs, est, q) < 0.01, q  # 1% rank error at k=256


def test_kll_exact_when_small():
    x = np.arange(100, dtype=np.float64)
    sk = _KLL(256)
    sk.add(x)
    got = sk.quantiles([0.0, 0.5, 1.0])
    assert got[0] == 0.0 and got[2] == 99.0
    assert abs(got[1] - 50.0) <= 1.0


def test_kll_merge_preserves_bound_and_count():
    rng = np.random.default_rng(9)
    x = rng.normal(0, 100, 150_000)
    # build two sketches over disjoint halves, merge via serialization
    a, b = _KLL(256), _KLL(256)
    a.add(x[:70_000]); b.add(x[70_000:])
    m = _KLL(256)
    for s in (a, b):
        lvs, vs = s.rows()
        m.add_weighted(vs, lvs)
    # weighted row mass drifts +-1 per odd-size compaction — the exact
    # count rides on the separate cnt column in quantile_sketch()
    assert abs(m.n - len(x)) / len(x) < 0.01
    xs = np.sort(x)
    for q in (0.1, 0.5, 0.9):
        assert _rank_err(xs, m.quantiles([q])[0], q) < 0.015, q


def test_kll_deterministic():
    rng = np.random.default_rng(13)
    x = rng.uniform(0, 1, 50_000)
    r = []
    for _ in range(2):
        sk = _KLL(128)
        for chunk in np.array_split(x, 10):
            sk.add(chunk)
        r.append(sk.quantiles([0.25, 0.5, 0.75]))
    assert (r[0] == r[1]).all()


def test_quantile_sketch_dataset():
    rng = np.random.default_rng(21)
    x = rng.lognormal(2.0, 1.0, 80_000)
    ds = rd.from_arrow(pa.table({"v": pa.array(x)})).repartition(16)
    out = quantile_sketch(ds, "v", [0.1, 0.5, 0.9, 0.99], k=256)
    assert out["n"] == len(x)
    xs = np.sort(x)
    for q, est in out["quantiles"].items():
        assert _rank_err(xs, est, q) < 0.015, q


def test_quantile_sketch_nulls_and_ints():
    vals = pa.array([1, 2, None, 3, 4, None, 5], type=pa.int64())
    ds = rd.from_arrow(pa.table({"v": vals}))
    out = quantile_sketch(ds, "v", [0.0, 1.0], k=64)
    assert out["n"] == 5
    assert out["quantiles"][0.0] == 1.0 and out["quantiles"][1.0] == 5.0


# --------------------------------------------------------------- Bloom


from halvesting_geometric_ray.ops.sketch import (bloom_anti_filter,
                                                 bloom_build,
                                                 bloom_might_contain)


def test_bloom_no_false_negatives_and_fpr():
    keys = pa.table({"k": [f"key{i}" for i in range(30_000)]})
    ds = rd.from_arrow(keys).repartition(8)
    nb, kh = 1 << 19, 5
    bits = bloom_build(ds, "k", num_bits=nb, num_hashes=kh)
    assert bool(bloom_might_contain(bits, keys.column("k").combine_chunks(),
                                    kh).all())
    other = pa.array([f"other{i}" for i in range(200_000)])
    fpr = bloom_might_contain(bits, other, kh).mean()
    theory = (1 - np.exp(-kh * 30_000 / nb)) ** kh
    assert fpr < 3 * theory + 1e-4, (fpr, theory)


def test_bloom_partitioning_invariant_bitmap():
    keys = pa.table({"k": [f"v{i}" for i in range(5_000)]})
    b1 = bloom_build(rd.from_arrow(keys), "k", num_bits=1 << 16)
    b8 = bloom_build(rd.from_arrow(keys).repartition(8), "k",
                     num_bits=1 << 16)
    assert (b1 == b8).all()  # OR is commutative -> identical bitmap


def test_bloom_anti_filter_matches_exact_in_clean_regime():
    docs = pa.table({"doc_id": pa.array(range(2_000), type=pa.int64()),
                     "fp": pa.array([f"fp{i}" for i in range(2_000)])})
    bench = pa.table({"fp": pa.array([f"fp{i}" for i in range(0, 2_000, 97)])})
    bits = bloom_build(rd.from_arrow(bench), "fp", num_bits=1 << 16)
    kept = bloom_anti_filter(rd.from_arrow(docs).repartition(4), "fp",
                             bits).to_pandas()
    exact_dropped = {i for i in range(0, 2_000, 97)}
    kept_ids = set(kept.doc_id)
    # never keeps a benchmark doc; at 2^16 bits / 21 keys FPs are ~0
    assert kept_ids.isdisjoint(exact_dropped)
    assert kept_ids == set(range(2_000)) - exact_dropped


def test_bloom_nulls_probe_absent():
    bits = bloom_build(rd.from_arrow(pa.table({"k": ["a", "b"]})), "k",
                       num_bits=1 << 12)
    col = pa.array(["a", None, "zz"])
    got = bloom_might_contain(bits, col)
    assert got[0] and not got[1] and not got[2]


def test_key_skew_report_flags_hot_key():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from halvesting_geometric_ray.ops.sketch import key_skew_report

    rng = np.random.default_rng(41)
    # one hub key holding ~40% of rows over a long uniform tail
    keys = np.concatenate([
        np.full(4000, 7, dtype=np.int64),
        rng.integers(100, 3100, 6000).astype(np.int64)])
    ds = rd.from_arrow(pa.Table.from_pandas(
        pd.DataFrame({"k": rng.permutation(keys)}))).repartition(6)
    rep = key_skew_report(ds, "k", k=5, capacity=8192, p=12)
    assert rep["n_rows"] == 10000
    truth_distinct = len(np.unique(keys))
    assert abs(rep["n_distinct_est"] - truth_distinct) / truth_distinct < 0.1
    hot = rep["hot"].to_pandas()
    assert hot.iloc[0].k == 7
    assert 0.35 < hot.iloc[0].share_min <= 0.45


def test_grouped_quantiles_within_rank_error():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from halvesting_geometric_ray.ops.sketch import grouped_quantile_sketch

    rng = np.random.default_rng(23)
    pdf = pd.DataFrame({
        "g": rng.integers(0, 6, 60000).astype(np.int64),
        "x": rng.lognormal(1.0, 0.8, 60000)})
    got = (grouped_quantile_sketch(
        rd.from_arrow(pa.Table.from_pandas(pdf)).repartition(9),
        "g", "x", [0.25, 0.5, 0.9], k=256).to_pandas()
        .set_index("g").sort_index())
    for g, sub in pdf.groupby("g"):
        xs = np.sort(sub.x.to_numpy())
        n = len(xs)
        assert got.loc[g, "n"] == n
        for q, nm in [(0.25, "p25"), (0.5, "p50"), (0.9, "p90")]:
            v = got.loc[g, nm]
            # rank of the returned value must be within 2% of target
            rank = np.searchsorted(xs, v) / n
            assert abs(rank - q) < 0.02, (g, nm, rank)


def test_grouped_quantiles_validation():
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from halvesting_geometric_ray.ops.sketch import grouped_quantile_sketch

    ds = rd.from_arrow(pa.Table.from_pandas(
        pd.DataFrame({"g": [1], "x": [1.0]})))
    import pytest as _pytest
    with _pytest.raises(ValueError):
        grouped_quantile_sketch(ds, "g", "x", [0.0, 0.5])
    with _pytest.raises(ValueError):
        grouped_quantile_sketch(ds, "g", "x", [0.501, 0.502])


# ---- Count-Min sketch ---------------------------------------------------

def test_cms_exact_in_sparse_regime():
    import pandas as pd

    from halvesting_geometric_ray.ops.sketch import cms_build, cms_query

    rng = np.random.default_rng(0)
    keys = rng.integers(0, 50, 5000)
    ds = rd.from_pandas(pd.DataFrame({"k": keys}))
    sk = cms_build(ds, "k", width=1 << 12, depth=4)
    uniq, true = np.unique(keys, return_counts=True)
    est = cms_query(sk, pa.array(uniq))
    # 50 keys in 4096 columns: collisions essentially impossible at
    # depth 4 -> exact
    assert np.array_equal(est, true)
    assert int(sk[0].sum()) == keys.size  # every row sums to N


def test_cms_bound_and_no_underestimate():
    import pandas as pd

    from halvesting_geometric_ray.ops.sketch import cms_build, cms_query

    rng = np.random.default_rng(1)
    keys = (rng.pareto(1.2, 200_000) * 50).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"k": keys}))
    width, depth = 1 << 10, 4
    sk = cms_build(ds, "k", width=width, depth=depth)
    uniq, true = np.unique(keys, return_counts=True)
    est = cms_query(sk, pa.array(uniq))
    assert (est >= true).all()  # CMS never underestimates
    eps_n = np.e / width * keys.size
    # the 1 - e^-4 bound per key; allow a small tail above eps*N
    frac_over = float(np.mean(est - true > eps_n))
    assert frac_over < 0.05, frac_over


def test_cms_partitioning_invariant_and_weighted():
    import pandas as pd

    from halvesting_geometric_ray.ops.sketch import cms_build, cms_query

    rng = np.random.default_rng(2)
    df = pd.DataFrame({"k": rng.integers(0, 30, 3000),
                       "w": rng.integers(1, 9, 3000)})
    a = cms_build(rd.from_pandas(df).repartition(1), "k", width=1 << 12)
    b = cms_build(rd.from_pandas(df).repartition(8), "k", width=1 << 12)
    assert np.array_equal(a, b)  # integer sums: bitwise invariant
    wsk = cms_build(rd.from_pandas(df), "k", width=1 << 12,
                    weight_col="w")
    uniq = np.unique(df.k)
    true_w = df.groupby("k").w.sum().loc[uniq].to_numpy()
    assert np.array_equal(cms_query(wsk, pa.array(uniq)), true_w)


def test_cms_validation():
    import pandas as pd
    import pytest

    from halvesting_geometric_ray.ops.sketch import cms_build

    ds = rd.from_pandas(pd.DataFrame({"k": [1]}))
    with pytest.raises(ValueError, match="width"):
        cms_build(ds, "k", width=1000)
    with pytest.raises(ValueError, match="depth"):
        cms_build(ds, "k", depth=0)


# ---- KMV / theta sketch ----


def test_kmv_exact_regime_and_set_ops():
    from halvesting_geometric_ray.ops.sketch import (
        kmv_build, kmv_estimate, kmv_set_ops, kmv_union)

    a_vals = np.arange(500, dtype=np.int64)
    b_vals = np.arange(300, 800, dtype=np.int64)
    dsa = rd.from_pandas(pd.DataFrame({"v": a_vals})).repartition(4)
    dsb = rd.from_pandas(pd.DataFrame({"v": b_vals})).repartition(3)
    ska = kmv_build(dsa, "v", k=4096)
    skb = kmv_build(dsb, "v", k=4096)
    assert kmv_estimate(ska) == 500.0  # exact below k
    assert kmv_estimate(skb) == 500.0
    ops = kmv_set_ops(ska, skb)
    assert ops["est_intersection"] == 200.0
    assert ops["est_union"] == 800.0
    assert ops["jaccard"] == 200.0 / 800.0
    assert kmv_estimate(kmv_union(ska, skb)) == 800.0


def test_kmv_estimate_error_bound():
    from halvesting_geometric_ray.ops.sketch import kmv_build, kmv_estimate

    n = 200_000
    ds = rd.from_pandas(pd.DataFrame(
        {"v": np.arange(n, dtype=np.int64)})).repartition(8)
    sk = kmv_build(ds, "v", k=1024)
    assert len(sk["vals"]) == 1024
    est = kmv_estimate(sk)
    assert abs(est - n) / n < 0.15  # ~5 sigma at k=1024


def test_kmv_intersection_planted_overlap():
    from halvesting_geometric_ray.ops.sketch import kmv_build, kmv_set_ops

    a = rd.from_pandas(pd.DataFrame(
        {"v": np.arange(0, 50_000, dtype=np.int64)})).repartition(5)
    b = rd.from_pandas(pd.DataFrame(
        {"v": np.arange(25_000, 75_000, dtype=np.int64)})).repartition(7)
    ops = kmv_set_ops(kmv_build(a, "v", k=2048), kmv_build(b, "v", k=2048))
    assert abs(ops["est_intersection"] - 25_000) / 25_000 < 0.2
    assert abs(ops["est_union"] - 75_000) / 75_000 < 0.12
    assert abs(ops["jaccard"] - 1 / 3) < 0.08


def test_kmv_layout_invariance_and_dupes():
    from halvesting_geometric_ray.ops.sketch import kmv_build

    rng = np.random.default_rng(5)
    vals = rng.integers(0, 30_000, 100_000).astype(np.int64)  # dupes
    pdf = pd.DataFrame({"v": vals})
    s1 = kmv_build(rd.from_pandas(pdf).repartition(3), "v", k=512)
    s2 = kmv_build(rd.from_pandas(pdf).repartition(17), "v", k=512,
                   merge_parts=3)
    np.testing.assert_array_equal(s1["vals"], s2["vals"])  # bitwise


def test_kmv_grouped_matches_flat():
    from halvesting_geometric_ray.ops.sketch import (
        kmv_build, kmv_build_grouped)

    rng = np.random.default_rng(9)
    pdf = pd.DataFrame({
        "g": rng.choice(["x", "y", "z"], 60_000),
        "v": rng.integers(0, 20_000, 60_000).astype(np.int64)})
    grouped = kmv_build_grouped(
        rd.from_pandas(pdf).repartition(6), "g", "v", k=256)
    assert set(grouped) == {"x", "y", "z"}
    for gv in ("x", "y", "z"):
        flat = kmv_build(
            rd.from_pandas(pdf[pdf.g == gv][["v"]]), "v", k=256)
        np.testing.assert_array_equal(grouped[gv]["vals"], flat["vals"])


def test_grouped_mad_sketch_close_to_exact():
    from halvesting_geometric_ray.ops.sketch import grouped_mad_sketch
    from halvesting_geometric_ray.ops.stats import grouped_mad

    rng = np.random.default_rng(13)
    pdf = pd.DataFrame({
        "g": rng.integers(0, 6, 40_000).astype(np.int64),
        "x": rng.normal(50.0, 12.0, 40_000)})
    approx = (grouped_mad_sketch(rd.from_pandas(pdf).repartition(8),
                                 "g", "x").to_pandas()
              .set_index("g")["mad"])
    exact = (grouped_mad(rd.from_pandas(pdf), ["g"], "x").to_pandas()
             .set_index("g")["mad"])
    for g in exact.index:
        assert abs(approx.loc[g] - exact.loc[g]) / exact.loc[g] < 0.05


def test_grouped_mad_sketch_overflow_guard():
    from halvesting_geometric_ray.ops.sketch import grouped_mad_sketch
    import pytest as _pt

    pdf = pd.DataFrame({"g": np.arange(40, dtype=np.int64),
                        "x": np.ones(40)})
    with _pt.raises(ValueError, match="broadcast_cap"):
        grouped_mad_sketch(rd.from_pandas(pdf), "g", "x",
                           broadcast_cap=10)


def test_cms_join_size_estimate():
    """CMS inner product: never underestimates the true equi-join
    size, overshoot within the (e/width)*N_l*N_r bound; exact on
    disjoint key sets (0) and on narrow sketches it degrades
    gracefully."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from halvesting_geometric_ray.ops.sketch import (cms_build,
                                                     cms_inner_product,
                                                     cms_join_size)

    rng = np.random.default_rng(8)
    lk = rng.zipf(1.5, 4000) % 500
    rk = rng.zipf(1.5, 3000) % 500
    true = 0
    from collections import Counter

    cl, cr = Counter(lk.tolist()), Counter(rk.tolist())
    true = sum(cl[k] * cr.get(k, 0) for k in cl)
    L = rd.from_pandas(pd.DataFrame({"k": lk.astype(np.int64)}))
    R = rd.from_pandas(pd.DataFrame({"k": rk.astype(np.int64)}))
    got = cms_join_size(L, "k", R, "k", width=1 << 12)
    assert got["n_left"] == 4000 and got["n_right"] == 3000
    assert got["estimate"] >= true
    assert got["estimate"] <= true + got["bound_excess"]
    # disjoint keys -> near-zero (bounded by collisions only)
    R2 = rd.from_pandas(pd.DataFrame(
        {"k": (rng.integers(10**6, 10**7, 2000)).astype(np.int64)}))
    d = cms_join_size(L, "k", R2, "k", width=1 << 12)
    assert d["estimate"] <= d["bound_excess"]
    # shape mismatch refuses
    import pytest

    sa = cms_build(L, "k", width=1 << 10)
    sb = cms_build(R, "k", width=1 << 11)
    with pytest.raises(ValueError):
        cms_inner_product(sa, sb)
