"""Configuration-model rewiring: degree preservation + determinism."""

import numpy as np
import pandas as pd
import ray.data as rd

from halvesting_geometric_ray.graph.nullmodel import (
    motif_significance, rewire_configuration)


def _edges(n_v, m, seed):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({"src": rng.integers(0, n_v, m),
                         "dst": rng.integers(0, n_v, m)})


def test_degrees_preserved_exactly():
    pdf = _edges(40, 500, 3)
    out = rewire_configuration(rd.from_pandas(pdf)).to_pandas()
    assert len(out) == len(pdf)
    # out-degree per vertex EXACT
    a = pdf.groupby("src").size().sort_index()
    b = out.groupby("src").size().sort_index()
    pd.testing.assert_series_equal(a, b)
    # in-degree MULTISET exact
    assert sorted(pdf.dst) == sorted(out.dst)


def test_deterministic_and_layout_invariant():
    pdf = _edges(30, 300, 9)
    a = (rewire_configuration(rd.from_pandas(pdf), seed=5)
         .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True))
    b = (rewire_configuration(rd.from_pandas(pdf).repartition(7),
                              seed=5)
         .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    c = (rewire_configuration(rd.from_pandas(pdf), seed=6)
         .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True))
    assert not a.equals(c)  # different seed -> different pairing


def test_rewiring_destroys_clustering():
    # clique-of-cliques: heavy triangles; null should have far fewer
    blocks = []
    for c in range(8):
        ids = np.arange(c * 10, c * 10 + 10)
        src, dst = np.meshgrid(ids, ids)
        m = src < dst
        blocks.append(pd.DataFrame({"src": src[m], "dst": dst[m]}))
    pdf = pd.concat(blocks, ignore_index=True)
    sig = motif_significance(rd.from_pandas(pdf), seed=11)
    assert sig["n_triangles"] == 8 * 120  # 8 * C(10,3)
    assert sig["n_triangles_null"] < sig["n_triangles"] / 3
    assert sig["ratio"] > 3
