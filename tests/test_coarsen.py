"""Matching-based coarsening vs a pandas contraction oracle +
weight-conservation / count invariants + both relabel paths."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.coarsen import coarsen_by_matching
from halvesting_geometric_ray.graph.matching import maximal_matching


def _fixture(seed=5, n=100, p=0.05):
    rng = np.random.default_rng(seed)
    m = rng.random((n, n)) < p
    src, dst = np.nonzero(np.triu(m, 1))
    s = np.concatenate([src, dst]).astype(np.int64)
    d = np.concatenate([dst, src]).astype(np.int64)
    w = rng.uniform(0.5, 2.0, src.size)
    w2 = np.concatenate([w, w])
    return n, s, d, w2


def _oracle(s, d, w, sup):
    df = pd.DataFrame({"src": sup[s], "dst": sup[d], "w": w})
    return (df.groupby(["src", "dst"], as_index=False)["w"].sum()
            .sort_values(["src", "dst"]).reset_index(drop=True))


@pytest.mark.parametrize("cap", [20_000_000, 0])
def test_matches_pandas_oracle(tmp_path, cap):
    n, s, d, w = _fixture()
    edges = rd.from_pandas(pd.DataFrame({"src": s, "dst": d, "w": w}))
    offsets = np.array([0, n], dtype=np.int64)
    mt, _ = maximal_matching(edges, offsets, str(tmp_path / f"m{cap}"))
    mdf = mt.to_pandas().sort_values("vid")
    sup = np.where(mdf.partner.to_numpy() >= 0,
                   np.minimum(mdf.vid.to_numpy(), mdf.partner.to_numpy()),
                   mdf.vid.to_numpy())
    coarse, mapping, info = coarsen_by_matching(
        edges, mt, weight_col="w", broadcast_cap=cap)
    got = (coarse.to_pandas().sort_values(["src", "dst"])
           .reset_index(drop=True))
    exp = _oracle(s, d, w, sup)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # mapping agrees with min(vid, partner)
    mp = mapping.to_pandas().sort_values("vid")
    assert (mp["super"].to_numpy() == sup).all()
    # counts + weight conservation (self-loops kept)
    assert info["n_fine"] == n
    assert info["n_coarse"] == n - info["n_matched_pairs"]
    assert got.w.sum() == pytest.approx(w.sum())
    assert mp["super"].nunique() == info["n_coarse"]


def test_unweighted_counts_multiplicity(tmp_path):
    # triangle 0-1-2 symmetrized; matching pairs two of them -> the
    # coarse graph has a self-loop of weight 2 (the internal edge both
    # directions) and a 2-path of weight 2 each way
    s = np.array([0, 1, 1, 2, 0, 2], dtype=np.int64)
    d = np.array([1, 0, 2, 1, 2, 0], dtype=np.int64)
    edges = rd.from_pandas(pd.DataFrame({"src": s, "dst": d}))
    mt, info_m = maximal_matching(edges, np.array([0, 3], dtype=np.int64),
                                  str(tmp_path / "tri"))
    assert info_m["n_matched_pairs"] == 1
    coarse, _, info = coarsen_by_matching(edges, mt)
    got = coarse.to_pandas()
    assert info["n_coarse"] == 2
    assert got.w.sum() == pytest.approx(6.0)  # 6 directed unit edges
    self_w = got[got.src == got.dst].w.sum()
    assert self_w == pytest.approx(2.0)
