"""Jones-Plassmann coloring vs sequential replay + validity."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.coloring import (_segment_mex,
                                                     greedy_coloring,
                                                     jp_priority)


def coloring_oracle(n, adj, seed):
    """Sequential replay: color in decreasing (priority, vid) order,
    each vertex taking the mex of its HIGHER-priority neighbors."""
    prio = jp_priority(np.arange(n, dtype=np.int64), seed)
    order = sorted(range(n), key=lambda v: (int(prio[v]), v), reverse=True)
    color = np.full(n, -1, dtype=np.int64)
    for v in order:
        used = {int(color[u]) for u in adj[v]
                if (int(prio[u]), u) > (int(prio[v]), v)}
        c = 0
        while c in used:
            c += 1
        color[v] = c
    return color


def _adj(n, src, dst):
    adj = [set() for _ in range(n)]
    for a, b in zip(src, dst):
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    return adj


def _run(n, src, dst, tmp, tag, num_parts=1, seed=42):
    s = np.concatenate([src, dst]).astype(np.int64)
    d = np.concatenate([dst, src]).astype(np.int64)
    m = s != d
    pairs = np.unique(np.stack([s[m], d[m]], axis=1), axis=0)
    edges = rd.from_pandas(pd.DataFrame({"src": pairs[:, 0],
                                         "dst": pairs[:, 1]}))
    offsets = (np.array([0, n], dtype=np.int64) if num_parts == 1 else
               np.unique(np.linspace(0, n, num_parts + 1).astype(np.int64)))
    ds, info = greedy_coloring(edges, offsets, str(tmp / tag), seed=seed)
    got = ds.to_pandas().sort_values("vid").reset_index(drop=True)
    assert len(got) == n
    return got, info


def test_segment_mex_kernel():
    # row 0: {0,1,3} -> 2 ; row 1: {1} -> 0 ; row 2: none -> 0 ;
    # row 3: {0} -> 1 ; row 4: {0,0,1,2} -> 3 (dupes collapse)
    colors = np.array([0, 1, 3, 1, 0, 0, 0, 1, 2], dtype=np.int64)
    row = np.array([0, 0, 0, 1, 3, 4, 4, 4, 4])
    assert _segment_mex(colors, row, 5).tolist() == [2, 0, 0, 1, 3]


@pytest.mark.parametrize("seed,p", [(0, 0.04), (1, 0.1), (42, 0.2)])
def test_random_matches_replay_and_valid(tmp_path, seed, p):
    rng = np.random.default_rng(seed)
    n = 110
    m = np.triu(rng.random((n, n)) < p, k=1)
    src, dst = np.nonzero(m)
    adj = _adj(n, src, dst)
    exp = coloring_oracle(n, adj, seed)
    for parts in (1, 4):
        got, info = _run(n, src, dst, tmp_path, f"r{seed}p{parts}",
                         num_parts=parts, seed=seed)
        assert (got.color.to_numpy() == exp).all(), parts
        assert info["n_colors"] == int(exp.max()) + 1
    # validity: adjacent vertices always differ
    for a, b in zip(src, dst):
        assert exp[a] != exp[b]
    # greedy tightness: color c implies c distinct lower colors among
    # HIGHER-priority neighbors
    prio = jp_priority(np.arange(n, dtype=np.int64), seed)
    for v in range(n):
        hi_cols = {int(exp[u]) for u in adj[v]
                   if (int(prio[u]), u) > (int(prio[v]), v)}
        assert set(range(int(exp[v]))) <= hi_cols


def test_color_zero_is_an_mis(tmp_path):
    """JP color class 0 with the same priorities is a maximal
    independent set."""
    rng = np.random.default_rng(9)
    n = 80
    m = np.triu(rng.random((n, n)) < 0.12, k=1)
    src, dst = np.nonzero(m)
    adj = _adj(n, src, dst)
    got, _ = _run(n, src, dst, tmp_path, "mis0", seed=5)
    zero = set(got.loc[got.color == 0, "vid"].tolist())
    for v in zero:
        assert not (adj[v] & zero)
    for v in range(n):
        if v not in zero:
            assert adj[v] & zero
