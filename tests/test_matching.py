"""Greedy maximal matching vs the sequential greedy oracle +
maximality/symmetry invariants + layout independence."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.matching import (edge_priority,
                                                     maximal_matching)


def greedy_oracle(n, src, dst, seed):
    """Sequential greedy matching under the engine's global edge order
    (edge_priority, min_vid, max_vid)."""
    a = np.minimum(np.asarray(src), np.asarray(dst)).astype(np.int64)
    b = np.maximum(np.asarray(src), np.asarray(dst)).astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    pairs = np.unique(np.stack([a, b], axis=1), axis=0)
    a, b = pairs[:, 0], pairs[:, 1]
    prio = edge_priority(a, b, seed)
    order = np.lexsort((b, a, prio))
    partner = np.full(n, -1, dtype=np.int64)
    for i in order:
        u, v = int(a[i]), int(b[i])
        if partner[u] == -1 and partner[v] == -1:
            partner[u] = v
            partner[v] = u
    return partner


def _run(n, src, dst, tmp, tag, num_parts=1, seed=42, **kw):
    s = np.concatenate([src, dst]).astype(np.int64)
    d = np.concatenate([dst, src]).astype(np.int64)
    m = s != d
    pairs = np.unique(np.stack([s[m], d[m]], axis=1), axis=0)
    edges = rd.from_pandas(pd.DataFrame({"src": pairs[:, 0],
                                         "dst": pairs[:, 1]}))
    offsets = (np.array([0, n], dtype=np.int64) if num_parts == 1 else
               np.unique(np.linspace(0, n, num_parts + 1).astype(np.int64)))
    ds, info = maximal_matching(edges, offsets, str(tmp / tag),
                                seed=seed, **kw)
    got = ds.to_pandas().sort_values("vid").reset_index(drop=True)
    assert len(got) == n
    return got, info


def test_path_graph_matches_oracle(tmp_path):
    # 0-1-2-3-4 path: greedy picks disjoint edges by priority
    src = np.array([0, 1, 2, 3])
    dst = np.array([1, 2, 3, 4])
    got, info = _run(5, src, dst, tmp_path, "path")
    exp = greedy_oracle(5, src, dst, 42)
    assert (got.partner.to_numpy() == exp).all()
    assert info["n_matched_pairs"] == (exp >= 0).sum() // 2


@pytest.mark.parametrize("seed", [0, 7])
def test_random_matches_oracle_all_layouts(tmp_path, seed):
    rng = np.random.default_rng(seed)
    n = 150
    m = rng.random((n, n)) < 0.04
    src, dst = np.nonzero(np.triu(m, 1))
    exp = greedy_oracle(n, src, dst, seed)
    outs = []
    for parts in (1, 5):
        got, info = _run(n, src, dst, tmp_path, f"r{seed}p{parts}",
                         num_parts=parts, seed=seed)
        pr = got.partner.to_numpy()
        assert (pr == exp).all(), parts
        outs.append(pr)
        # symmetry: partner[partner[v]] == v for matched v
        mt = np.flatnonzero(pr >= 0)
        assert (pr[pr[mt]] == mt).all()
    assert (outs[0] == outs[1]).all()  # layout-independent


def test_maximality(tmp_path):
    rng = np.random.default_rng(3)
    n = 80
    m = rng.random((n, n)) < 0.06
    src, dst = np.nonzero(np.triu(m, 1))
    got, _ = _run(n, src, dst, tmp_path, "maxl", num_parts=3)
    pr = got.partner.to_numpy()
    # no edge may have BOTH endpoints unmatched
    bad = (pr[src] == -1) & (pr[dst] == -1)
    assert not bad.any()


def test_star_single_pair(tmp_path):
    # star: center 0 can match exactly one leaf
    src = np.zeros(6, dtype=np.int64)
    dst = np.arange(1, 7)
    got, info = _run(7, src, dst, tmp_path, "star")
    pr = got.partner.to_numpy()
    assert info["n_matched_pairs"] == 1
    assert pr[0] >= 1 and pr[pr[0]] == 0
    assert (pr == greedy_oracle(7, src, dst, 42)).all()


def test_empty_graph(tmp_path):
    edges = rd.from_pandas(pd.DataFrame(
        {"src": pd.Series([], dtype="int64"),
         "dst": pd.Series([], dtype="int64")}))
    ds, info = maximal_matching(edges, np.array([0], dtype=np.int64),
                                str(tmp_path / "e"))
    assert ds.count() == 0 and info["n_matched_pairs"] == 0
