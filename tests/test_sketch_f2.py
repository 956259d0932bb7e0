"""AMS F2 sketch: exact parity regime, error bound, mergeability."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.ops.sketch import (ams_f2_build,
                                                 ams_f2_estimate)


def _f2(keys):
    _u, c = np.unique(keys, return_counts=True)
    return int((c.astype(np.int64) ** 2).sum())


def test_estimate_within_bound():
    rng = np.random.default_rng(7)
    keys = rng.zipf(1.5, 20000) % 500
    ds = rd.from_pandas(pd.DataFrame({"k": keys}))
    sk = ams_f2_build(ds, "k", width=256, depth=5)
    est = ams_f2_estimate(sk, width=256, depth=5)
    exact = _f2(keys)
    # rel error ~ sqrt(2/width) ~ 0.09; allow 4x slack
    assert abs(est - exact) / exact < 0.35


def test_mergeability_bitwise():
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 100, 5000)
    a = ams_f2_build(rd.from_pandas(pd.DataFrame({"k": keys})), "k")
    b = ams_f2_build(
        rd.from_pandas(pd.DataFrame({"k": keys})).repartition(9), "k")
    assert (a == b).all()  # counter sums are partitioning-invariant
    # split-merge law: sketch(A ∪ B) = sketch(A) + sketch(B)
    s1 = ams_f2_build(rd.from_pandas(pd.DataFrame({"k": keys[:2000]})),
                      "k")
    s2 = ams_f2_build(rd.from_pandas(pd.DataFrame({"k": keys[2000:]})),
                      "k")
    assert (a == s1 + s2).all()


def test_single_heavy_key_exactish():
    # one key only: F2 = n^2; every counter is ±n -> estimate exact
    ds = rd.from_pandas(pd.DataFrame({"k": ["x"] * 300}))
    sk = ams_f2_build(ds, "k", width=16, depth=3)
    assert ams_f2_estimate(sk, width=16, depth=3) == 300.0 ** 2
    with pytest.raises(ValueError):
        ams_f2_estimate(sk, width=99, depth=2)
