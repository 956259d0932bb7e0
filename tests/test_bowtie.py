"""Bow-tie decomposition vs exact NumPy reachability oracles."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.bowtie import CLASSES, bowtie


def reach(n, src, dst, start):
    """Exact forward reachability set via BFS."""
    adj = [[] for _ in range(n)]
    for a, b in zip(src, dst):
        adj[a].append(b)
    seen = np.zeros(n, dtype=bool)
    seen[start] = True
    frontier = [start]
    while frontier:
        nxt = []
        for u in frontier:
            for w in adj[u]:
                if not seen[w]:
                    seen[w] = True
                    nxt.append(w)
        frontier = nxt
    return seen


def bowtie_oracle(n, src, dst, pivot):
    fwd = reach(n, src, dst, pivot)
    bwd = reach(n, dst, src, pivot)
    weak = reach(n, np.concatenate([src, dst]), np.concatenate([dst, src]),
                 pivot)
    cls = np.full(n, 4, dtype=np.int8)
    cls[weak] = 3
    cls[fwd & ~bwd] = 2
    cls[bwd & ~fwd] = 1
    cls[fwd & bwd] = 0
    return np.array(CLASSES)[cls]


def _run(n, src, dst, tmp, tag, offsets=None, **kw):
    edges = rd.from_pandas(pd.DataFrame({
        "src": np.asarray(src, dtype=np.int64),
        "dst": np.asarray(dst, dtype=np.int64)}))
    offsets = offsets if offsets is not None else np.array([0, n],
                                                           dtype=np.int64)
    ds, info = bowtie(edges, offsets, str(tmp / tag), **kw)
    got = ds.to_pandas().sort_values("vid").reset_index(drop=True)
    assert len(got) == n
    return got, info


def test_bowtie_crafted(tmp_path):
    # core cycle {1,2,3}; 0 -> core (IN); core -> 4 (OUT);
    # 5 -> 4 (TENDRIL: weak comp, no path through core); 6 isolated DISC
    src = [1, 2, 3, 0, 3, 5]
    dst = [2, 3, 1, 1, 4, 4]
    got, info = _run(7, src, dst, tmp_path, "c", pivot=1)
    exp = bowtie_oracle(7, np.array(src), np.array(dst), 1)
    assert (got.cls.to_numpy() == exp).all()
    assert got.cls.tolist() == ["IN", "SCC", "SCC", "SCC", "OUT",
                                "TENDRIL", "DISC"]
    assert info["sizes"] == {"SCC": 3, "IN": 1, "OUT": 1, "TENDRIL": 1,
                             "DISC": 1}


def test_bowtie_auto_pivot_matches_oracle(tiny_graph, tmp_path):
    es = rd.read_parquet(tiny_graph.edges).to_pandas()
    src, dst = es.src.to_numpy(), es.dst.to_numpy()
    n = tiny_graph.num_vertices
    ds, info = bowtie(rd.read_parquet(tiny_graph.edges), tiny_graph.offsets,
                      str(tmp_path / "auto"))
    got = ds.to_pandas().sort_values("vid").reset_index(drop=True)
    exp = bowtie_oracle(n, src, dst, info["pivot"])
    assert (got.cls.to_numpy() == exp).all()
    assert sum(info["sizes"].values()) == n
    # auto pivot = max out-degree among vertices with in-degree >= 1
    outd = np.bincount(src, minlength=n)
    has_in = np.zeros(n, dtype=bool)
    has_in[dst] = True
    cand = np.where(has_in, outd, -1)
    assert outd[info["pivot"]] == cand.max()
    assert info["pivot"] == int(np.flatnonzero(cand == cand.max()).min())


def test_bowtie_explicit_pivot_multi_part(tiny_graph, tmp_path):
    es = rd.read_parquet(tiny_graph.edges).to_pandas()
    n = tiny_graph.num_vertices
    ds, info = bowtie(rd.read_parquet(tiny_graph.edges), tiny_graph.offsets,
                      str(tmp_path / "p0"), pivot=0, num_actors=3)
    got = ds.to_pandas().sort_values("vid").reset_index(drop=True)
    exp = bowtie_oracle(n, es.src.to_numpy(), es.dst.to_numpy(), 0)
    assert (got.cls.to_numpy() == exp).all()


def test_bowtie_pivot_validation(tmp_path):
    with pytest.raises(ValueError):
        _run(3, [0], [1], tmp_path, "v", pivot=5)


def test_giant_scc_pivot_exact(tmp_path):
    from halvesting_geometric_ray.graph.bowtie import giant_scc_pivot

    # big cycle {0..4} (giant SCC), small cycle {8,9}, tail 5->6->7
    src = [0, 1, 2, 3, 4, 8, 9, 5, 6, 4]
    dst = [1, 2, 3, 4, 0, 9, 8, 6, 7, 5]
    edges = rd.from_pandas(pd.DataFrame({
        "src": np.array(src, dtype=np.int64),
        "dst": np.array(dst, dtype=np.int64)}))
    offsets = np.array([0, 5, 10], dtype=np.int64)
    pivot = giant_scc_pivot(edges, offsets, str(tmp_path / "gp"))
    assert pivot == 0  # min vid of the size-5 SCC
    ds, info = bowtie(edges, offsets, str(tmp_path / "bt"), pivot=pivot)
    assert info["sizes"]["SCC"] == 5
