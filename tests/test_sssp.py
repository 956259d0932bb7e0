"""Weighted SSSP vs a heapq Dijkstra oracle."""

import heapq

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.sssp import sssp


def dijkstra(n, src, dst, w, sources):
    adj = [[] for _ in range(n)]
    for a, b, ww in zip(src, dst, w):
        adj[a].append((b, ww))
    dist = np.full(n, np.inf)
    h = []
    for s in sources:
        dist[s] = 0.0
        heapq.heappush(h, (0.0, s))
    while h:
        d, u = heapq.heappop(h)
        if d > dist[u]:
            continue
        for v, ww in adj[u]:
            nd = d + ww
            if nd < dist[v]:
                dist[v] = nd
                heapq.heappush(h, (nd, v))
    return dist


def _run(n, src, dst, w, sources, tmp, tag, num_parts=1, **kw):
    edges = rd.from_pandas(pd.DataFrame({
        "src": np.asarray(src, dtype=np.int64),
        "dst": np.asarray(dst, dtype=np.int64),
        "w": np.asarray(w, dtype=np.float64)}))
    offsets = (np.array([0, n], dtype=np.int64) if num_parts == 1 else
               np.unique(np.linspace(0, n, num_parts + 1).astype(np.int64)))
    ds, info = sssp(edges, offsets, str(tmp / tag),
                    np.asarray(sources, dtype=np.int64), **kw)
    got = ds.to_pandas().set_index("vid").dist
    return got, info


def test_crafted_weighted_paths(tmp_path):
    # 0->1 (1.0), 1->2 (1.0), 0->2 (5.0): two-hop path wins
    got, info = _run(4, [0, 1, 0], [1, 2, 2], [1.0, 1.0, 5.0], [0],
                     tmp_path, "c")
    assert got[0] == 0.0 and got[1] == 1.0 and got[2] == 2.0
    assert 3 not in got.index  # unreachable absent


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_matches_dijkstra(tmp_path, seed):
    rng = np.random.default_rng(seed)
    n = 150
    m = rng.random((n, n)) < 0.04
    np.fill_diagonal(m, False)
    src, dst = np.nonzero(m)
    w = rng.uniform(0.1, 4.0, src.size)
    exp = dijkstra(n, src, dst, w, [0, 7])
    for parts in (1, 4):
        got, _ = _run(n, src, dst, w, [0, 7], tmp_path,
                      f"r{seed}p{parts}", num_parts=parts)
        reach = np.flatnonzero(np.isfinite(exp))
        assert set(got.index) == set(reach.tolist()), parts
        assert np.allclose(got.loc[reach].to_numpy(), exp[reach],
                           atol=1e-12), parts


def test_validation(tmp_path):
    edges = rd.from_pandas(pd.DataFrame(
        {"src": [0], "dst": [1], "w": [1.0]}))
    offsets = np.array([0, 2], dtype=np.int64)
    with pytest.raises(ValueError, match="non-empty"):
        sssp(edges, offsets, str(tmp_path / "v"), np.array([]))
    with pytest.raises(ValueError, match="out of range"):
        sssp(edges, offsets, str(tmp_path / "v2"), np.array([9]))
