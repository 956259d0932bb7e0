"""Disparity filter: exact NumPy p-value oracle (both modes),
degree-1 convention, undirected min-p semantics, alpha membership."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.config import DEFAULT
from halvesting_geometric_ray.graph.backbone import disparity_filter


def wedges_ds(rows):
    return rd.from_pandas(pd.DataFrame(
        {"src": np.array([r[0] for r in rows], dtype=np.int64),
         "dst": np.array([r[1] for r in rows], dtype=np.int64),
         "w": np.array([r[2] for r in rows], dtype=np.float64)}))


def oracle(rows, mode):
    if mode == "directed":
        out_k, out_s = {}, {}
        for s, d, w in rows:
            out_k[s] = out_k.get(s, 0) + 1
            out_s[s] = out_s.get(s, 0.0) + w
        return {(s, d): (1.0 - w / out_s[s]) ** (out_k[s] - 1)
                for s, d, w in rows}
    # undirected: fold reciprocal rows to canonical (min, max) with
    # summed weights, THEN per-endpoint degree/strength
    fold = {}
    for s, d, w in rows:
        key = (min(s, d), max(s, d))
        fold[key] = fold.get(key, 0.0) + w
    out_k, out_s = {}, {}
    for (u, v), w in fold.items():
        ends = (u,) if u == v else (u, v)
        for x in ends:
            out_k[x] = out_k.get(x, 0) + 1
            out_s[x] = out_s.get(x, 0.0) + w
    res = {}
    for (u, v), w in fold.items():
        p = (1.0 - w / out_s[u]) ** (out_k[u] - 1)
        p2 = (1.0 - w / out_s[v]) ** (out_k[v] - 1)
        res[(u, v)] = min(p, p2)
    return res


@pytest.mark.parametrize("mode", ["directed", "undirected"])
@pytest.mark.parametrize("seed", [0, 2])
def test_matches_numpy_oracle(mode, seed):
    rng = np.random.default_rng(seed)
    n = 30
    rows = []
    seen = set()
    for _ in range(150):
        s, d = int(rng.integers(0, n)), int(rng.integers(0, n))
        if s != d and (s, d) not in seen:
            seen.add((s, d))
            rows.append((s, d, float(rng.integers(1, 50))))
    got = disparity_filter(wedges_ds(rows), DEFAULT, alpha=0.05,
                           mode=mode).to_pandas()
    exp = oracle(rows, mode)
    assert len(got) == len(exp)  # undirected: one row per folded edge
    for r in got.itertuples():
        assert np.isclose(r.p, exp[(r.src, r.dst)], atol=1e-12), \
            (r.src, r.dst, mode)
        assert r.keep == (r.p < 0.05)


def test_degree_one_never_significant():
    # a star center certifies nothing about its leaves' single edges;
    # leaves (degree 1) give p = 0^0 = 1
    rows = [(0, i, 10.0) for i in range(1, 5)]
    got = disparity_filter(wedges_ds(rows), DEFAULT,
                           mode="directed").to_pandas()
    # center spreads evenly: p = (1 - 1/4)^3 for every edge
    assert np.allclose(got.p, 0.75 ** 3)
    got_u = disparity_filter(wedges_ds(rows), DEFAULT,
                             mode="undirected").to_pandas()
    # leaf side gives p=1; min with center side = center side
    assert np.allclose(got_u.p, 0.75 ** 3)


def test_skewed_hub_keeps_heavy_edge():
    # hub with one dominant edge + many tiny ones: only the dominant
    # edge is significant
    rows = [(0, 1, 1000.0)] + [(0, i, 1.0) for i in range(2, 22)]
    got = disparity_filter(wedges_ds(rows), DEFAULT, alpha=0.05,
                           mode="directed").to_pandas()
    heavy = got[got.dst == 1].iloc[0]
    assert heavy.keep and heavy.p < 1e-6
    light = got[got.dst != 1]
    assert not light.keep.any()


def test_mode_validation():
    with pytest.raises(ValueError):
        disparity_filter(wedges_ds([(0, 1, 1.0)]), DEFAULT,
                         mode="bogus")


def test_undirected_folds_reciprocal_pairs():
    """(A,B,w1) + (B,A,w2) must behave exactly like one undirected
    edge of weight w1+w2 — one output row, consistent keep."""
    # triangle with one reciprocal pair + a pendant
    rows = [(0, 1, 10.0), (1, 0, 30.0), (1, 2, 5.0), (2, 0, 5.0),
            (0, 3, 1.0)]
    got = disparity_filter(wedges_ds(rows), DEFAULT,
                           mode="undirected").to_pandas()
    assert len(got) == 4  # (0,1) folded
    r01 = got[(got.src == 0) & (got.dst == 1)].iloc[0]
    assert r01.w == 40.0
    exp = oracle(rows, "undirected")
    for r in got.itertuples():
        assert np.isclose(r.p, exp[(r.src, r.dst)], atol=1e-12)
    # equivalent single-row input gives identical p values
    folded_rows = [(0, 1, 40.0), (1, 2, 5.0), (0, 2, 5.0), (0, 3, 1.0)]
    got2 = disparity_filter(wedges_ds(folded_rows), DEFAULT,
                            mode="undirected").to_pandas()
    m1 = {(r.src, r.dst): r.p for r in got.itertuples()}
    m2 = {(r.src, r.dst): r.p for r in got2.itertuples()}
    assert m1 == m2
