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
    out_k, out_s = {}, {}
    inc = rows if mode == "directed" else \
        rows + [(d, s, w) for s, d, w in rows]
    for s, d, w in inc:
        out_k[s] = out_k.get(s, 0) + 1
        out_s[s] = out_s.get(s, 0.0) + w
    res = {}
    for s, d, w in rows:
        p = (1.0 - w / out_s[s]) ** (out_k[s] - 1)
        if mode == "undirected":
            p2 = (1.0 - w / out_s[d]) ** (out_k[d] - 1)
            p = min(p, p2)
        res[(s, d)] = p
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
    assert len(got) == len(rows)
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
