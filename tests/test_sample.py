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
