"""Landmark distance oracle (graph/landmarks.py): upper-bound property
vs exact BFS, exactness through landmarks, degree-based selection,
determinism, validation."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.landmarks import (estimate_distances,
                                                      landmark_distances,
                                                      select_landmarks)


def _sym_graph(n=50, p=0.08, seed=3):
    """Symmetric random graph (both directions present)."""
    rng = np.random.default_rng(seed)
    m = rng.random((n, n)) < p
    m = m | m.T
    np.fill_diagonal(m, False)
    src, dst = np.nonzero(m)
    ds = rd.from_arrow(pa.table({
        "src": pa.array(src.astype(np.int64)),
        "dst": pa.array(dst.astype(np.int64))}))
    return ds, m, n


def _true_dists(m, n):
    INF = 10 ** 9
    d = np.full((n, n), INF, dtype=np.int64)
    for s in range(n):
        d[s, s] = 0
        frontier = [s]
        lvl = 0
        while frontier:
            lvl += 1
            nxt = []
            for u in frontier:
                for v in np.nonzero(m[u])[0]:
                    if d[s, v] > lvl:
                        d[s, v] = lvl
                        nxt.append(v)
            frontier = nxt
    return d


def test_upper_bound_and_landmark_exactness(tmp_path):
    edges, m, n = _sym_graph()
    offsets = np.array([0, n // 2, n], dtype=np.int64)
    dist, lms, info = landmark_distances(
        edges, offsets, str(tmp_path / "lm"), k=4)
    true = _true_dists(m, n)
    # oracle layer itself is exact BFS
    df = dist.to_pandas()
    for r in df.itertuples():
        assert r.dist == true[r.landmark, r.vid]
    # estimates: upper bound always; exact when a landmark lies on a
    # shortest path (in particular d(u, L) + d(L, v) == d(u, v))
    rng = np.random.default_rng(7)
    us = rng.integers(0, n, 40).astype(np.int64)
    vs = rng.integers(0, n, 40).astype(np.int64)
    pairs = rd.from_arrow(pa.table({"src": pa.array(us),
                                    "dst": pa.array(vs)}))
    est = estimate_distances(dist, pairs).to_pandas()
    INF = 10 ** 9
    for r in est.itertuples():
        t = true[r.src, r.dst]
        assert t < INF
        assert r.d_hat >= t, (r.src, r.dst)
        want = min(true[r.src, L] + true[L, r.dst] for L in lms)
        assert r.d_hat == want, (r.src, r.dst)


def test_star_graph_is_exact(tmp_path):
    """Center landmark of a star: every estimate equals the true
    distance (all shortest paths pass the center)."""
    n = 12
    src = np.concatenate([np.zeros(n - 1, dtype=np.int64),
                          np.arange(1, n, dtype=np.int64)])
    dst = np.concatenate([np.arange(1, n, dtype=np.int64),
                          np.zeros(n - 1, dtype=np.int64)])
    edges = rd.from_arrow(pa.table({"src": pa.array(src),
                                    "dst": pa.array(dst)}))
    offsets = np.array([0, n], dtype=np.int64)
    # degree selection must pick the center (vid 0, degree n-1)
    lms = select_landmarks(edges, 1)
    assert lms.tolist() == [0]
    dist, _, _ = landmark_distances(edges, offsets,
                                    str(tmp_path / "s"), landmarks=lms)
    pairs = rd.from_arrow(pa.table({
        "src": pa.array([1, 2, 0], type=pa.int64()),
        "dst": pa.array([2, 3, 5], type=pa.int64())}))
    est = {(r.src, r.dst): r.d_hat
           for r in estimate_distances(dist, pairs)
           .to_pandas().itertuples()}
    assert est == {(1, 2): 2, (2, 3): 2, (0, 5): 1}


def test_validation(tmp_path):
    edges, _, n = _sym_graph(seed=9)
    off = np.array([0, n], dtype=np.int64)
    with pytest.raises(ValueError, match="k must be"):
        landmark_distances(edges, off, str(tmp_path), k=0)
