"""bridges / 2ECC vs a sequential Tarjan low-link oracle."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.bridges import bridges


def _tarjan_bridges(n, pairs):
    """Iterative Tarjan bridge finding on the simple undirected graph."""
    adj = [[] for _ in range(n)]
    und = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    for i, (a, b) in enumerate(und):
        adj[a].append((b, i))
        adj[b].append((a, i))
    disc = [-1] * n
    low = [0] * n
    out = set()
    timer = [0]
    for root in range(n):
        if disc[root] != -1:
            continue
        stack = [(root, -1, iter(adj[root]))]
        disc[root] = low[root] = timer[0]
        timer[0] += 1
        while stack:
            v, pe, it = stack[-1]
            adv = False
            for w, ei in it:
                if ei == pe:
                    continue
                if disc[w] == -1:
                    disc[w] = low[w] = timer[0]
                    timer[0] += 1
                    stack.append((w, ei, iter(adj[w])))
                    adv = True
                    break
                low[v] = min(low[v], disc[w])
            if not adv:
                stack.pop()
                if stack:
                    u = stack[-1][0]
                    low[u] = min(low[u], low[v])
                    if low[v] > disc[u]:
                        e = und[pe]
                        out.add(e)
        # NB: parallel edges absent (simple graph input here)
    return out


def _run(n, pairs, tmp, tag, parts=1):
    edges = rd.from_pandas(pd.DataFrame(
        {"src": [a for a, _ in pairs], "dst": [b for _, b in pairs]}))
    offsets = (np.array([0, n], dtype=np.int64) if parts == 1 else
               np.unique(np.linspace(0, n, parts + 1).astype(np.int64)))
    return bridges(edges, offsets, str(tmp / tag))


def test_tree_all_bridges(tmp_path):
    pairs = [(0, 1), (1, 2), (1, 3), (3, 4)]
    b, l2, info = _run(5, pairs, tmp_path, "tree")
    got = set(map(tuple, b.to_pandas()[["u", "v"]].to_numpy()))
    assert got == {(0, 1), (1, 2), (1, 3), (3, 4)}
    # every vertex alone in its 2ECC
    lab = l2.to_pandas()
    assert lab.label.nunique() == 5


def test_cycle_no_bridges(tmp_path):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0)]
    b, l2, info = _run(4, pairs, tmp_path, "cycle")
    assert b.count() == 0
    assert l2.to_pandas().label.nunique() == 1


def test_two_triangles_one_bridge(tmp_path):
    pairs = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    b, l2, info = _run(6, pairs, tmp_path, "tri")
    got = set(map(tuple, b.to_pandas()[["u", "v"]].to_numpy()))
    assert got == {(2, 3)}
    lab = l2.to_pandas().set_index("vid").label
    assert lab[0] == lab[1] == lab[2]
    assert lab[3] == lab[4] == lab[5]
    assert lab[0] != lab[3]


def test_random_graphs_match_tarjan(tmp_path):
    rng = np.random.default_rng(23)
    for trial in range(3):
        n = 30
        m = int(rng.integers(25, 60))
        pairs = [(int(a), int(b)) for a, b in
                 rng.integers(0, n, (m, 2)) if a != b]
        b, l2, info = _run(n, pairs, tmp_path, f"r{trial}",
                           parts=3)
        got = set(map(tuple, b.to_pandas()[["u", "v"]].to_numpy()))
        exp = _tarjan_bridges(n, pairs)
        assert got == exp, f"trial {trial}"


def test_2ecc_labels_match_bridge_free_components(tmp_path):
    rng = np.random.default_rng(4)
    n = 25
    pairs = [(int(a), int(b)) for a, b in
             rng.integers(0, n, (40, 2)) if a != b]
    b, l2, info = _run(n, pairs, tmp_path, "ecc")
    exp_bridges = _tarjan_bridges(n, pairs)
    # oracle 2ecc: union-find over non-bridge edges
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, bb in {(min(a, b), max(a, b)) for a, b in pairs if a != b}:
        if (a, bb) not in exp_bridges:
            ra, rb = find(a), find(bb)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    exp = np.array([find(v) for v in range(n)])
    lab = l2.to_pandas().sort_values("vid").label.to_numpy()
    # same partition (labels are min-vid so actually equal)
    assert (lab == exp).all()
