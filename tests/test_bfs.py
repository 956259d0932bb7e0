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


# ---------------- double-sweep diameter ----------------

def _double_sweep_oracle(n, src, dst, start, sweeps=2):
    """Exact replication of double_sweep_diameter's semantics."""
    s = int(start)
    lb = 0
    trace = []
    for _ in range(sweeps):
        dist = bfs_oracle(n, src, dst, [s])
        reach = dist >= 0
        ecc = int(dist[reach].max())
        peak = int(np.flatnonzero(reach & (dist == ecc)).min())
        trace.append((s, ecc, peak, int(reach.sum())))
        lb = max(lb, ecc)
        if peak == s and ecc == 0:
            break
        s = peak
    return lb, trace


def test_double_sweep_diameter_matches_oracle(tiny_graph, tmp_path):
    from halvesting_geometric_ray.graph.bfs import double_sweep_diameter

    es = rd.read_parquet(tiny_graph.edges).to_pandas()
    src, dst = es.src.to_numpy(), es.dst.to_numpy()
    n = tiny_graph.num_vertices
    got = double_sweep_diameter(
        symmetrize(rd.read_parquet(tiny_graph.edges), dedup=False),
        tiny_graph.offsets, str(tmp_path / "dsw"), start=0)
    lb, trace = _double_sweep_oracle(n, src, dst, 0)
    assert got["diameter_lb"] == lb
    assert [(s["source"], s["ecc_lb"], s["peak_vid"], s["reached"])
            for s in got["sweeps"]] == trace

    # sandwich: ecc(start) <= lb <= exact diameter of start's component
    d0 = bfs_oracle(n, src, dst, [0])
    comp = np.flatnonzero(d0 >= 0)
    exact_diam = 0
    for v in comp:
        dv = bfs_oracle(n, src, dst, [v])
        exact_diam = max(exact_diam, int(dv[dv >= 0].max()))
    assert int(d0.max()) <= lb <= exact_diam


def test_double_sweep_isolated_vertex(tmp_path):
    """A source with no edges: lb 0, single early-stopped sweep."""
    import pyarrow as pa

    from halvesting_geometric_ray.graph.bfs import double_sweep_diameter

    edges = rd.from_arrow(pa.table({
        "src": pa.array([1, 2], type=pa.int64()),
        "dst": pa.array([2, 3], type=pa.int64())}))
    offsets = np.array([0, 4], dtype=np.int64)
    r = double_sweep_diameter(symmetrize(edges, dedup=False), offsets,
                              str(tmp_path / "iso"), start=0)
    assert r["diameter_lb"] == 0
    assert len(r["sweeps"]) == 1 and r["sweeps"][0]["reached"] == 1


def test_bfs_sources_ds_parity(tiny_graph, tmp_path):
    """The Dataset seed path (sources_ds) must give bitwise the same
    distances as the driver-array path, at 1 and 3 actors."""
    import pandas as pd
    import pyarrow as pa

    seeds = [3, 17, 42]
    for na in (1, 3):
        a, ia = bfs(_sym(tiny_graph), tiny_graph.offsets,
                    str(tmp_path / f"arr{na}"),
                    np.asarray(seeds, dtype=np.int64), num_actors=na)
        seeds_ds = rd.from_arrow(pa.table(
            {"vid": pa.array(seeds, type=pa.int64())})).repartition(2)
        b, ib = bfs(_sym(tiny_graph), tiny_graph.offsets,
                    str(tmp_path / f"ds{na}"), sources_ds=seeds_ds,
                    num_actors=na)
        pd.testing.assert_frame_equal(
            a.to_pandas().sort_values("vid").reset_index(drop=True),
            b.to_pandas().sort_values("vid").reset_index(drop=True))
        assert "sources" not in ib  # no O(#seeds) driver state
    # both-or-neither seed argument validation
    with pytest.raises(ValueError):
        bfs(_sym(tiny_graph), tiny_graph.offsets, str(tmp_path / "x"))
    with pytest.raises(ValueError):
        bfs(_sym(tiny_graph), tiny_graph.offsets, str(tmp_path / "x"),
            np.array([0]), sources_ds=rd.from_items([{"vid": 0}]))
