"""BFS hop distances vs a single-process NumPy oracle."""

import numpy as np
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.bfs import bfs
from halvesting_geometric_ray.graph.build import symmetrize


def bfs_oracle(n: int, src: np.ndarray, dst: np.ndarray,
               sources) -> np.ndarray:
    """Exact undirected hop distances; -1 = unreachable."""
    a = np.concatenate([src, dst])
    b = np.concatenate([dst, src])
    dist = np.full(n, -1, dtype=np.int64)
    frontier = np.unique(np.asarray(sources))
    dist[frontier] = 0
    k = 0
    while frontier.size:
        k += 1
        m = np.isin(a, frontier)
        nxt = np.unique(b[m])
        nxt = nxt[dist[nxt] == -1]
        dist[nxt] = k
        frontier = nxt
    return dist


def _sym(g):
    return symmetrize(rd.read_parquet(g.edges), dedup=False)


def _check(g, sources, tmp, tag, **kw):
    es = rd.read_parquet(g.edges).to_pandas()
    exp = bfs_oracle(g.num_vertices, es.src.to_numpy(), es.dst.to_numpy(),
                     sources)
    ds, info = bfs(_sym(g), g.offsets, str(tmp / tag),
                   np.asarray(sources, dtype=np.int64), **kw)
    got = ds.to_pandas()
    got_d = np.full(g.num_vertices, -1, dtype=np.int64)
    got_d[got.vid.to_numpy()] = got.dist.to_numpy()
    assert (got_d == exp).all()
    assert info["reached"] == int((exp >= 0).sum())
    return info


def test_bfs_matches_oracle(tiny_graph, tmp_path):
    _check(tiny_graph, [0], tmp_path, "b0")


def test_bfs_multi_source(tiny_graph, tmp_path):
    _check(tiny_graph, [3, 17, 17, 42], tmp_path, "bm")


def test_bfs_num_actors_independent(tiny_graph, tmp_path):
    es = rd.read_parquet(tiny_graph.edges).to_pandas()
    exp = bfs_oracle(tiny_graph.num_vertices, es.src.to_numpy(),
                     es.dst.to_numpy(), [1])
    for na in (1, 3):
        ds, _ = bfs(_sym(tiny_graph), tiny_graph.offsets,
                    str(tmp_path / f"na{na}"), np.array([1]), num_actors=na)
        got = ds.to_pandas()
        got_d = np.full(tiny_graph.num_vertices, -1, dtype=np.int64)
        got_d[got.vid.to_numpy()] = got.dist.to_numpy()
        assert (got_d == exp).all(), na


def test_bfs_source_validation(tiny_graph, tmp_path):
    with pytest.raises(ValueError):
        bfs(_sym(tiny_graph), tiny_graph.offsets, str(tmp_path / "v"),
            np.array([], dtype=np.int64))
    with pytest.raises(ValueError):
        bfs(_sym(tiny_graph), tiny_graph.offsets, str(tmp_path / "v"),
            np.array([tiny_graph.num_vertices]))
