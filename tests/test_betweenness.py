"""Betweenness centrality vs an exact pure-Python Brandes oracle."""

from collections import deque

import numpy as np
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.betweenness import betweenness


def brandes_oracle(n, src, dst, sources=None):
    adj = [[] for _ in range(n)]
    for a, b in zip(src, dst):
        adj[a].append(b)
    bc = np.zeros(n)
    for s in (range(n) if sources is None else sources):
        S = []
        P = [[] for _ in range(n)]
        sigma = np.zeros(n)
        sigma[s] = 1
        d = np.full(n, -1)
        d[s] = 0
        Q = deque([s])
        while Q:
            v = Q.popleft()
            S.append(v)
            for w in adj[v]:
                if d[w] < 0:
                    d[w] = d[v] + 1
                    Q.append(w)
                if d[w] == d[v] + 1:
                    sigma[w] += sigma[v]
                    P[w].append(v)
        delta = np.zeros(n)
        while S:
            w = S.pop()
            for v in P[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def _graph_arrays(g):
    es = rd.read_parquet(g.edges).to_pandas()
    return es.src.to_numpy(), es.dst.to_numpy()


def test_betweenness_exact_matches_brandes(tiny_graph, tmp_path):
    src, dst = _graph_arrays(tiny_graph)
    n = tiny_graph.num_vertices
    exp = brandes_oracle(n, src, dst)
    ds, info = betweenness(rd.read_parquet(tiny_graph.edges),
                           tiny_graph.offsets, str(tmp_path / "b"),
                           batch_k=48)
    got = ds.to_pandas().sort_values("vid").betweenness.to_numpy()
    assert got.shape == (n,)
    assert np.allclose(got, exp, atol=1e-9)
    assert info["n_sources"] == n


def test_betweenness_path_graph(tmp_path):
    """Directed path 0->1->...->5: BC(v) = (v)(n-1-v) interior products."""
    import pyarrow as pa

    n = 6
    edges = rd.from_arrow(pa.table({
        "src": np.arange(n - 1, dtype=np.int64),
        "dst": np.arange(1, n, dtype=np.int64)}))
    offsets = np.array([0, n], dtype=np.int64)
    ds, _ = betweenness(edges, offsets, str(tmp_path / "p"))
    got = ds.to_pandas().sort_values("vid").betweenness.to_numpy()
    exp = np.array([v * (n - 1 - v) for v in range(n)], dtype=np.float64)
    assert np.allclose(got, exp)


def test_betweenness_batch_and_layout_independent(tiny_graph, tmp_path):
    src, dst = _graph_arrays(tiny_graph)
    exp = brandes_oracle(tiny_graph.num_vertices, src, dst)
    for batch_k, na in ((16, 1), (128, 3)):
        ds, _ = betweenness(rd.read_parquet(tiny_graph.edges),
                            tiny_graph.offsets, str(tmp_path / f"l{na}"),
                            batch_k=batch_k, num_actors=na)
        got = ds.to_pandas().sort_values("vid").betweenness.to_numpy()
        assert np.allclose(got, exp, atol=1e-9)


def test_betweenness_explicit_sources(tiny_graph, tmp_path):
    src, dst = _graph_arrays(tiny_graph)
    srcs = np.array([0, 5, 11], dtype=np.int64)
    exp = brandes_oracle(tiny_graph.num_vertices, src, dst, srcs)
    ds, info = betweenness(rd.read_parquet(tiny_graph.edges),
                           tiny_graph.offsets, str(tmp_path / "s"),
                           sources=srcs)
    got = ds.to_pandas().sort_values("vid").betweenness.to_numpy()
    assert np.allclose(got, exp, atol=1e-9)
    assert info["scale"] == 1.0


def test_betweenness_sampled_estimator(tiny_graph, tmp_path):
    """Deterministic hash sample; K = N reproduces the exact values
    (scale 1), smaller K is a scaled deterministic estimate."""
    src, dst = _graph_arrays(tiny_graph)
    n = tiny_graph.num_vertices
    exp = brandes_oracle(n, src, dst)
    ds, info = betweenness(rd.read_parquet(tiny_graph.edges),
                           tiny_graph.offsets, str(tmp_path / "k_all"),
                           n_samples=n)
    got = ds.to_pandas().sort_values("vid").betweenness.to_numpy()
    assert np.allclose(got, exp, atol=1e-9)
    ds1, info1 = betweenness(rd.read_parquet(tiny_graph.edges),
                             tiny_graph.offsets, str(tmp_path / "k1"),
                             n_samples=20, seed=9)
    ds2, info2 = betweenness(rd.read_parquet(tiny_graph.edges),
                             tiny_graph.offsets, str(tmp_path / "k2"),
                             n_samples=20, seed=9)
    a = ds1.to_pandas().sort_values("vid").betweenness.to_numpy()
    b = ds2.to_pandas().sort_values("vid").betweenness.to_numpy()
    assert np.allclose(a, b)
    assert info1["scale"] == pytest.approx(n / 20)


def test_betweenness_validation(tiny_graph, tmp_path):
    with pytest.raises(ValueError):
        betweenness(rd.read_parquet(tiny_graph.edges), tiny_graph.offsets,
                    str(tmp_path / "v"), n_samples=0)
    with pytest.raises(ValueError):
        betweenness(rd.read_parquet(tiny_graph.edges), tiny_graph.offsets,
                    str(tmp_path / "v"),
                    sources=np.array([tiny_graph.num_vertices]))
