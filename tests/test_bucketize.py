"""Equi-depth bucketize: mass balance, monotonicity, boundary reuse."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.ops.bucketize import (
    bucketize, equi_depth_boundaries)


def _ds(n=20000, seed=31):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                        "x": rng.lognormal(0.0, 1.0, n)})
    return pdf, rd.from_arrow(pa.Table.from_pandas(pdf)).repartition(8)


def test_buckets_roughly_equal_mass():
    pdf, ds = _ds()
    nb = 10
    got = bucketize(ds, "x", n_buckets=nb).to_pandas()
    sizes = got.bucket.value_counts()
    assert sorted(sizes.index) == list(range(nb))
    # KLL k=256 keeps each bucket within a few percent of n/nb
    assert (abs(sizes - len(pdf) / nb) / (len(pdf) / nb)).max() < 0.15


def test_assignment_monotone_in_value():
    pdf, ds = _ds(5000)
    got = (bucketize(ds, "x", n_buckets=7).to_pandas()
           .sort_values("x").reset_index(drop=True))
    assert got.bucket.is_monotonic_increasing


def test_boundary_reuse_and_nulls():
    pdf, ds = _ds(3000)
    b = equi_depth_boundaries(ds, "x", 5)
    assert len(b) == 4 and (np.diff(b) >= 0).all()
    pdf2 = pd.DataFrame({"x": [float(b[0]) - 1, float(b[-1]) + 1, None]})
    out = bucketize(rd.from_arrow(pa.Table.from_pandas(pdf2)), "x",
                    boundaries=b).to_pandas()
    assert out.bucket[0] == 0 and out.bucket[1] == 4
    assert pd.isna(out.bucket[2])


def test_bucketize_validation():
    _, ds = _ds(100)
    with pytest.raises(ValueError):
        equi_depth_boundaries(ds, "x", 1)
