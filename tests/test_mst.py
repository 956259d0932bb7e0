"""Boruvka minimum spanning forest vs a sequential Kruskal oracle.

The engine breaks weight ties by the lexicographic (w, u, v) total
order, so the MSF is unique — the oracle applies the SAME order, making
edge-SET equality (not just total weight) the assertion.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.mst import minimum_spanning_forest


def kruskal_oracle(edges):
    """edges: iterable of (src, dst, w).  Returns (sorted tree edge list
    in canonical (u, v, w) form, total weight, n_vertices)."""
    canon = {}
    verts = set()
    for s, d, w in edges:
        verts.add(s)
        verts.add(d)
        if s == d:
            continue
        u, v = (s, d) if s < d else (d, s)
        if (u, v) not in canon or w < canon[(u, v)]:
            canon[(u, v)] = w
    parent = {x: x for x in verts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    tree = []
    for (u, v), w in sorted(canon.items(), key=lambda kv: (kv[1], kv[0])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            tree.append((u, v, w))
    return sorted(tree), sum(w for _, _, w in tree), len(verts)


def run_engine(rows, weighted=True, **kw):
    src = [r[0] for r in rows]
    dst = [r[1] for r in rows]
    cols = {"src": pa.array(src, type=pa.int64()),
            "dst": pa.array(dst, type=pa.int64())}
    if weighted:
        cols["w"] = pa.array([float(r[2]) for r in rows], type=pa.float64())
    ds = rd.from_arrow(pa.table(cols))
    msf, info = minimum_spanning_forest(
        ds, weight_col="w" if weighted else None, **kw)
    got = sorted((int(r["u"]), int(r["v"]), float(r["w"]))
                 for r in msf.take_all())
    return got, info


def random_graph(seed, n, m, max_w=10):
    rng = np.random.default_rng(seed)
    rows = []
    for _ in range(m):
        s, d = rng.integers(0, n, size=2)
        # coarse weights so ties happen and the tiebreak matters
        rows.append((int(s), int(d), float(rng.integers(1, max_w)) / 2.0))
    return rows


def test_random_graph_matches_kruskal():
    rows = random_graph(42, 60, 150)
    got, info = run_engine(rows, num_parts=4)
    want, total, nv = kruskal_oracle(rows)
    assert got == want
    assert info["total_weight"] == pytest.approx(total)
    assert info["n_vertices"] == nv
    assert info["n_tree_edges"] == len(want)
    assert info["n_components"] == nv - len(want)


def test_scipy_total_weight_parity():
    scipy = pytest.importorskip("scipy")
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import minimum_spanning_tree

    rows = random_graph(7, 40, 120)
    got, info = run_engine(rows, num_parts=4)
    # scipy wants a single min-weight entry per undirected pair
    canon = {}
    for s, d, w in rows:
        if s == d:
            continue
        u, v = min(s, d), max(s, d)
        canon[(u, v)] = min(w, canon.get((u, v), np.inf))
    us = [k[0] for k in canon]
    vs = [k[1] for k in canon]
    ws = [canon[k] for k in canon]
    n = max(max(us), max(vs)) + 1
    t = minimum_spanning_tree(coo_matrix((ws, (us, vs)), shape=(n, n)))
    # MST total weight is unique even under ties
    assert info["total_weight"] == pytest.approx(t.sum())


def test_unweighted_spanning_forest():
    rows = [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (3, 4, 1.0)]
    got, info = run_engine(rows, weighted=False, num_parts=2)
    want, _, _ = kruskal_oracle([(s, d, 1.0) for s, d, _ in rows])
    assert got == want
    assert info["n_tree_edges"] == 3  # triangle keeps 2, pair keeps 1
    assert info["n_components"] == 2


def test_self_loops_and_parallel_edges():
    rows = [(5, 5, 0.1), (0, 1, 3.0), (1, 0, 2.0), (0, 1, 9.0),
            (1, 2, 4.0), (2, 1, 4.0)]
    got, info = run_engine(rows, num_parts=2)
    # loop at 5 contributes the vertex but no edge; parallel (0,1)
    # collapses to w=2.0
    assert got == [(0, 1, 2.0), (1, 2, 4.0)]
    assert info["n_vertices"] == 4  # 0,1,2,5
    assert info["n_components"] == 2


def test_disconnected_cliques():
    rows = []
    for base in (0, 100):
        for i in range(5):
            for j in range(i + 1, 5):
                rows.append((base + i, base + j, float(i + j + base % 7)))
    got, info = run_engine(rows, num_parts=3)
    want, total, nv = kruskal_oracle(rows)
    assert got == want
    assert info["n_components"] == 2
    assert info["total_weight"] == pytest.approx(total)


def test_long_chain_pointer_jumping():
    # increasing weights along a 200-vertex path: every component picks
    # its left edge, building the longest possible pointer chains
    rows = [(i, i + 1, float(i)) for i in range(199)]
    got, info = run_engine(rows, num_parts=4)
    want, total, _ = kruskal_oracle(rows)
    assert got == want
    assert info["n_tree_edges"] == 199
    assert info["n_components"] == 1


def test_layout_invariance():
    rows = random_graph(11, 50, 140)
    src = pa.array([r[0] for r in rows], type=pa.int64())
    dst = pa.array([r[1] for r in rows], type=pa.int64())
    w = pa.array([r[2] for r in rows], type=pa.float64())
    t = pa.table({"src": src, "dst": dst, "w": w})
    outs = []
    for blocks, parts in ((1, 2), (8, 5)):
        ds = rd.from_arrow(t)
        if blocks > 1:
            ds = ds.repartition(blocks)
        msf, info = minimum_spanning_forest(ds, weight_col="w",
                                            num_parts=parts)
        outs.append((sorted((int(r["u"]), int(r["v"]), float(r["w"]))
                            for r in msf.take_all()), info["total_weight"]))
    assert outs[0] == outs[1]


def test_driver_and_distributed_root_paths_agree():
    """driver_root_cap=0 forces the distributed pointer-jumping joins;
    the MSF edge set must match the (default) driver fold exactly."""
    rows = random_graph(23, 70, 200)
    a, ia = run_engine(rows, num_parts=3)
    b, ib = run_engine(rows, num_parts=3, driver_root_cap=0)
    assert a == b
    assert ia["n_components"] == ib["n_components"]
    assert ia["total_weight"] == pytest.approx(ib["total_weight"])
