"""Structural mirror detection (graph/mirror.py) vs brute-force
set oracles."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.dedup import _MOD, _perm_params
from halvesting_geometric_ray.functions.hashing import stable_hash64
from halvesting_geometric_ray.graph.mirror import (adjacency_minhash,
                                                   mirror_candidates)


def _edges_df(adj: dict) -> pd.DataFrame:
    rows = [(s, d) for s, ds in adj.items() for d in ds]
    return pd.DataFrame(rows, columns=["src", "dst"]).astype(np.int64)


def _planted(seed=3):
    """Vertices 0/1 share 38 of 42 targets (J ~ 0.81); 2/3 share all
    5 (J = 1.0); 10..29 get random mostly-disjoint sets."""
    rng = np.random.default_rng(seed)
    base = list(range(100, 140))
    adj = {0: base[:39] + [900], 1: base[1:40] + [901],
           2: [200, 201, 202, 203, 204], 3: [200, 201, 202, 203, 204]}
    for v in range(10, 30):
        adj[v] = list(rng.choice(np.arange(300, 800), 12,
                                 replace=False))
    return adj


def _jaccard(adj, a, b):
    sa, sb = set(adj[a]), set(adj[b])
    return len(sa & sb) / len(sa | sb)


def test_adjacency_minhash_matches_sequential_oracle():
    adj = _planted()
    pdf = _edges_df(adj)
    sigs = (adjacency_minhash(rd.from_pandas(pdf).repartition(5),
                              num_perm=16, seed=11)
            .to_pandas().set_index("vid").sort_index())
    a_perm, b_perm = _perm_params(16, 11)
    for v, ds in adj.items():
        h = np.asarray(stable_hash64(
            pd.Series(np.array(ds, dtype=np.int64)))).astype(np.uint64)
        for i in range(16):
            exp = int(((np.uint64(a_perm[i]) * h + np.uint64(b_perm[i]))
                       % np.uint64(_MOD)).min())
            assert sigs.loc[v, f"m_{i}"] == exp, (v, i)


def test_mirror_candidates_planted_pairs():
    adj = _planted()
    pdf = _edges_df(adj)
    got = mirror_candidates(rd.from_pandas(pdf).repartition(4),
                            num_perm=32, bands=8,
                            min_jaccard=0.5).to_pandas()
    pairs = set(zip(got.a, got.b))
    assert (0, 1) in pairs and (2, 3) in pairs
    for _, r in got.iterrows():
        assert r.jaccard == pytest.approx(_jaccard(adj, r.a, r.b))
        assert 0.0 <= r.est_jaccard <= 1.0
    row23 = got[(got.a == 2) & (got.b == 3)].iloc[0]
    assert row23.jaccard == 1.0 and row23.n_common == 5
    # random 12-of-500 sets never reach jaccard 0.5
    assert all(a in (0, 2) for a in got.a)


def test_mirror_layout_invariance_and_estimate_only():
    adj = _planted(seed=8)
    pdf = _edges_df(adj)
    a = (mirror_candidates(rd.from_pandas(pdf).repartition(3),
                           min_jaccard=0.5).to_pandas()
         .sort_values(["a", "b"]).reset_index(drop=True))
    b = (mirror_candidates(rd.from_pandas(pdf).repartition(11),
                           min_jaccard=0.5, num_parts=7).to_pandas()
         .sort_values(["a", "b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    est = mirror_candidates(rd.from_pandas(pdf), verify=False,
                            min_jaccard=0.5).to_pandas()
    assert set(est.columns) == {"a", "b", "est_jaccard"}
    assert {(0, 1), (2, 3)} <= set(zip(est.a, est.b))


def test_mirror_bucket_cap_star():
    # 50 vertices with IDENTICAL 5-target adjacency collide in every
    # band; cap=8 emits a star around the min vid, not 1225 pairs
    adj = {v: [1000, 1001, 1002, 1003, 1004] for v in range(50)}
    pdf = _edges_df(adj)
    got = mirror_candidates(rd.from_pandas(pdf).repartition(4),
                            bucket_cap=8, min_jaccard=0.9).to_pandas()
    assert len(got) == 49  # star: (0, v) for every other v
    assert (got.a == 0).all()
    assert (got.jaccard == 1.0).all()


def test_mirror_validation():
    pdf = _edges_df({0: [1, 2]})
    with pytest.raises(ValueError, match="divide"):
        mirror_candidates(rd.from_pandas(pdf), num_perm=30, bands=8)
    with pytest.raises(ValueError, match="num_perm"):
        adjacency_minhash(rd.from_pandas(pdf), num_perm=2)
