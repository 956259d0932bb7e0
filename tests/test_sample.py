"""Deterministic seeded sampling: partitioning-independent, uniform-ish."""

import numpy as np
import pandas as pd
import ray.data as rd

from halvesting_geometric_ray.ops.sample import seeded_sample


def _ids(ds):
    return sorted(ds.to_pandas()["k"].tolist())


def test_sample_partitioning_independent():
    df = pd.DataFrame({"k": np.arange(10_000, dtype=np.int64),
                       "v": np.arange(10_000) * 2})
    a = _ids(seeded_sample(rd.from_pandas(df).repartition(3), "k", 100))
    b = _ids(seeded_sample(rd.from_pandas(df).repartition(17), "k", 100))
    assert a == b and len(a) == 100


def test_sample_seed_changes_selection_and_is_uniformish():
    df = pd.DataFrame({"k": np.arange(20_000, dtype=np.int64)})
    ds = rd.from_pandas(df)
    s1 = set(_ids(seeded_sample(ds, "k", 500, seed=1)))
    s2 = set(_ids(seeded_sample(ds, "k", 500, seed=2)))
    assert s1 != s2
    # uniform-ish: mean of sampled keys near population mean
    m = np.mean(sorted(s1))
    assert abs(m - 10_000) < 1500


def test_stratified_sample_per_group_counts_and_determinism():
    from halvesting_geometric_ray.ops.sample import stratified_sample

    df = pd.DataFrame({
        "lang": np.repeat(["en", "fr", "de"], 3000),
        "k": np.arange(9000, dtype=np.int64)})

    def run(parts):
        out = stratified_sample(rd.from_pandas(df).repartition(parts),
                                "lang", "k", 50).to_pandas()
        return out.sort_values(["lang", "k"]).reset_index(drop=True)

    a, b = run(3), run(13)
    pd.testing.assert_frame_equal(a, b)
    assert a.groupby("lang").size().tolist() == [50, 50, 50]
    assert list(a.columns) == ["lang", "k"]


def test_sample_keeps_payload_columns():
    df = pd.DataFrame({"k": np.arange(100, dtype=np.int64),
                       "v": np.arange(100) * 3})
    out = seeded_sample(rd.from_pandas(df), "k", 10).to_pandas()
    assert list(out.columns) == ["k", "v"]
    assert (out.v == out.k * 3).all()


def test_weighted_sample_proportional_and_invariant():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from halvesting_geometric_ray.ops.sample import weighted_sample

    pdf = pd.DataFrame({
        "id": np.arange(400, dtype=np.int64),
        "w": np.where(np.arange(400) < 40, 20.0, 1.0)})  # 10% heavy
    ds = rd.from_arrow(pa.Table.from_pandas(pdf))

    # partitioning invariance (same seed -> identical draw)
    a = weighted_sample(ds.repartition(1), "id", "w", 50,
                        seed=3).to_pandas().sort_values("id")
    b = weighted_sample(ds.repartition(9), "id", "w", 50,
                        seed=3).to_pandas().sort_values("id")
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
    assert len(a) == 50

    # heavy items (weight 20x, 10% of rows) dominate across seeds
    heavy_frac = np.mean([
        (weighted_sample(ds, "id", "w", 50, seed=s)
         .to_pandas().id < 40).mean()
        for s in range(8)])
    assert heavy_frac > 0.5  # uniform would give 0.10

    # zero/negative weights never sampled
    pdf2 = pdf.copy()
    pdf2.loc[pdf2.id >= 10, "w"] = 0.0
    got = weighted_sample(
        rd.from_arrow(pa.Table.from_pandas(pdf2)), "id", "w", 50,
        seed=1).to_pandas()
    assert (got.id < 10).all() and len(got) == 10


# ---- leakage-free group split -------------------------------------------

def test_split_by_group_atomic_and_nested():
    import pandas as pd

    from halvesting_geometric_ray.ops.sample import split_by_group

    rng = np.random.default_rng(0)
    n = 4000
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "cluster": rng.integers(0, 300, n)})
    out = split_by_group(rd.from_pandas(df), "cluster", 0.25,
                         seed=5).to_pandas()
    # every cluster entirely on one side
    assert (out.groupby("cluster").split.nunique() == 1).all()
    frac = (out.split == "test").mean()
    assert 0.15 < frac < 0.35
    # nested: the 10% test set is a subset of the 25% test set
    small = split_by_group(rd.from_pandas(df), "cluster", 0.10,
                           seed=5).to_pandas()
    t_small = set(small[small.split == "test"].cluster)
    t_big = set(out[out.split == "test"].cluster)
    assert t_small <= t_big
    # partitioning invariance
    out8 = split_by_group(rd.from_pandas(df).repartition(8), "cluster",
                          0.25, seed=5).to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out8.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_split_by_group_validation():
    import pandas as pd
    import pytest

    from halvesting_geometric_ray.ops.sample import split_by_group

    ds = rd.from_pandas(pd.DataFrame({"g": [1]}))
    with pytest.raises(ValueError, match="test_frac"):
        split_by_group(ds, "g", 1.5)
