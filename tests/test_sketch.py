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
