"""four_cycle_stats / butterfly_stats vs brute-force motif oracles."""

import itertools

import numpy as np
import pandas as pd
import ray.data as rd

from halvesting_geometric_ray.graph.metrics import (butterfly_stats,
                                                    four_cycle_stats)


def _edges_ds(pairs):
    return rd.from_pandas(pd.DataFrame(
        {"src": [p[0] for p in pairs], "dst": [p[1] for p in pairs]}))


def _brute_c4(pairs):
    """Count 4-vertex cycles in the canonical undirected simple graph."""
    und = set()
    for s, d in pairs:
        if s != d:
            und.add((min(s, d), max(s, d)))
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    verts = sorted(adj)
    n = 0
    for quad in itertools.combinations(verts, 4):
        # a 4-cycle on {a,b,c,d} exists per cyclic ordering; count
        # distinct C4 subgraphs = number of 3 pairings that close a cycle
        a, b, c, d = quad
        for perm in ((a, b, c, d), (a, b, d, c), (a, c, b, d)):
            w, x, y, z = perm
            if (x in adj[w] and y in adj[x] and z in adj[y]
                    and w in adj[z]):
                n += 1
    return n


def test_square_and_diagonals():
    # plain square = 1 cycle; adding one diagonal keeps 1; both
    # diagonals (K4) -> 3 cycles
    sq = [(0, 1), (1, 2), (2, 3), (3, 0)]
    assert four_cycle_stats(_edges_ds(sq)).to_pandas()["n_cycles4"][0] == 1
    k4 = sq + [(0, 2), (1, 3)]
    out = four_cycle_stats(_edges_ds(k4)).to_pandas()
    assert out["n_cycles4"][0] == 3 == _brute_c4(k4)


def test_random_graph_matches_bruteforce():
    rng = np.random.default_rng(5)
    pairs = [(int(a), int(b)) for a, b in rng.integers(0, 18, (120, 2))]
    out = four_cycle_stats(_edges_ds(pairs)).to_pandas()
    assert out["n_cycles4"][0] == _brute_c4(pairs)
    # codeg invariants
    assert out["max_codeg"][0] >= 2 and out["n_codeg_pairs"][0] > 0


def test_triangle_has_no_c4_and_selfloop_dropped():
    tri = [(0, 1), (1, 2), (2, 0), (1, 1)]
    out = four_cycle_stats(_edges_ds(tri)).to_pandas()
    assert out["n_cycles4"][0] == 0
    assert out["n_codeg_pairs"][0] == 3  # each pair shares 1 neighbor


def test_center_degree_cap_drops_hub_wedges():
    # star + square: capping the hub removes its wedge pairs
    star = [(9, i) for i in range(5)]
    sq = [(0, 1), (1, 2), (2, 3), (3, 0)]
    full = four_cycle_stats(_edges_ds(star + sq)).to_pandas()
    capped = four_cycle_stats(_edges_ds(star + sq),
                              max_center_degree=3).to_pandas()
    assert capped["n_codeg_pairs"][0] < full["n_codeg_pairs"][0]


def _brute_butterflies(rows):
    pq = set(rows)
    left = {}
    for o, p in pq:
        left.setdefault(o, set()).add(p)
    n = 0
    for o1, o2 in itertools.combinations(sorted(left), 2):
        k = len(left[o1] & left[o2])
        n += k * (k - 1) // 2
    return n


def test_butterflies_match_bruteforce():
    rng = np.random.default_rng(11)
    rows = [(int(o), int(p)) for o, p in
            np.c_[rng.integers(0, 25, 300), rng.integers(100, 115, 300)]]
    ds = rd.from_pandas(pd.DataFrame(rows, columns=["o", "p"]))
    out = butterfly_stats(ds, "o", "p").to_pandas()
    assert out["n_butterflies"][0] == _brute_butterflies(rows)


def test_butterflies_duplicates_collapse():
    rows = [(1, 10), (1, 11), (2, 10), (2, 11), (1, 10), (2, 11)]
    ds = rd.from_pandas(pd.DataFrame(rows, columns=["o", "p"]))
    out = butterfly_stats(ds, "o", "p").to_pandas()
    assert out["n_butterflies"][0] == 1
    assert out["n_codeg_pairs"][0] == 1 and out["max_codeg"][0] == 2


def test_butterflies_partitioning_invariance():
    rng = np.random.default_rng(3)
    rows = pd.DataFrame({"o": rng.integers(0, 40, 500),
                         "p": rng.integers(0, 30, 500)})
    a = butterfly_stats(rd.from_pandas(rows), "o", "p").to_pandas()
    b = butterfly_stats(rd.from_pandas(rows).repartition(9), "o",
                        "p").to_pandas()
    pd.testing.assert_frame_equal(a, b)
