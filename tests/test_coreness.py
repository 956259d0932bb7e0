"""Core decomposition (h-index iteration) vs exact peeling oracle."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.config import EngineConfig
from halvesting_geometric_ray.graph.coreness import (_segment_h_index,
                                                     coreness)


def coreness_oracle(n, src, dst):
    """Batagelj-Zaversnik peeling: core number = running max of the
    degree at removal time, removing min-degree vertices first."""
    adj = [set() for _ in range(n)]
    for a, b in zip(src, dst):
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    deg = np.array([len(s) for s in adj])
    alive = np.ones(n, dtype=bool)
    core = np.zeros(n, dtype=np.int64)
    k = 0
    for _ in range(n):
        cand = np.flatnonzero(alive)
        v = cand[np.argmin(deg[cand])]
        k = max(k, deg[v])
        core[v] = k
        alive[v] = False
        for u in adj[v]:
            if alive[u]:
                deg[u] -= 1
    return core


def _sym(src, dst):
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    m = s != d
    pairs = np.unique(np.stack([s[m], d[m]], axis=1), axis=0)
    return pd.DataFrame({"src": pairs[:, 0], "dst": pairs[:, 1]})


def _run(n, src, dst, tmp, tag, num_parts=1, **kw):
    edges = rd.from_pandas(_sym(np.asarray(src, dtype=np.int64),
                                np.asarray(dst, dtype=np.int64)))
    offsets = (np.array([0, n], dtype=np.int64) if num_parts == 1 else
               np.unique(np.linspace(0, n, num_parts + 1).astype(np.int64)))
    ds, info = coreness(edges, offsets, str(tmp / tag),
                        EngineConfig(num_parts=max(num_parts, 1)), **kw)
    got = ds.to_pandas().sort_values("vid").reset_index(drop=True)
    assert len(got) == n
    return got, info


def test_segment_h_index_kernel():
    # rows: [3,1,4,1,5] -> h=3; [2,2] -> 2; [] -> 0; [1] -> 1; [0,0] -> 0
    vals = np.array([3, 1, 4, 1, 5, 2, 2, 1, 0, 0], dtype=np.int64)
    indptr = np.array([0, 5, 7, 7, 8, 10])
    assert _segment_h_index(vals, indptr).tolist() == [3, 2, 0, 1, 0]


def test_clique_cycle_tree(tmp_path):
    # 5-clique (coreness 4) + cycle (2) + star tail (1) + isolate (0)
    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    cyc = [(5, 6), (6, 7), (7, 5)]
    tail = [(0, 8), (8, 9)]
    src = [e[0] for e in k5 + cyc + tail]
    dst = [e[1] for e in k5 + cyc + tail]
    got, info = _run(11, src, dst, tmp_path, "c")
    exp = coreness_oracle(11, np.array(src), np.array(dst))
    assert (got.coreness.to_numpy() == exp).all()
    assert got.coreness.tolist() == [4, 4, 4, 4, 4, 2, 2, 2, 1, 1, 0]


@pytest.mark.parametrize("seed,p", [(0, 0.05), (1, 0.1), (2, 0.2)])
def test_random_matches_peeling(tmp_path, seed, p):
    rng = np.random.default_rng(seed)
    n = 120
    m = np.triu(rng.random((n, n)) < p, k=1)
    src, dst = np.nonzero(m)
    exp = coreness_oracle(n, src, dst)
    for parts in (1, 4):
        got, _ = _run(n, src, dst, tmp_path, f"r{seed}p{parts}",
                      num_parts=parts)
        assert (got.coreness.to_numpy() == exp).all(), parts


def test_kcore_consistency(tmp_path):
    """coreness >= k iff vertex is in the k-core (cross-operator)."""
    from halvesting_geometric_ray.graph.build import symmetrize
    from halvesting_geometric_ray.graph.kcore import k_core

    rng = np.random.default_rng(9)
    n = 80
    m = np.triu(rng.random((n, n)) < 0.08, k=1)
    src, dst = np.nonzero(m)
    got, _ = _run(n, src, dst, tmp_path, "x", num_parts=3)
    edges = rd.from_pandas(pd.DataFrame({
        "src": src.astype(np.int64), "dst": dst.astype(np.int64)}))
    offsets = np.array([0, n], dtype=np.int64)
    for k in (2, 3):
        kc, _ = k_core(symmetrize(edges, dedup=False), offsets, k,
                       str(tmp_path / f"kc{k}"))
        member = (kc.to_pandas().sort_values("vid")
                  .in_kcore.to_numpy().astype(bool))
        assert ((got.coreness.to_numpy() >= k) == member).all(), k
