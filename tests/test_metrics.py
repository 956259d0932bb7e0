"""Structural/link-prediction metrics vs brute-force NumPy oracles.

Independent of the DuckDB SQL oracles in queries_graph.build_oracles():
these recompute clustering coefficients, common-neighbor scores,
reciprocity and assortativity from adjacency sets in one process.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from halvesting_geometric_ray.graph.metrics import (
    clustering_coefficients, common_neighbor_scores, degree_assortativity,
    reciprocity)


def _edges_ds(src, dst):
    return rd.from_arrow(pa.table({"src": pa.array(src, type=pa.int64()),
                                   "dst": pa.array(dst, type=pa.int64())}))


def _rand_graph(n=60, m=300, seed=7):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    return src.astype(np.int64), dst.astype(np.int64), n


def _adj(src, dst, n):
    """Undirected simple-graph adjacency sets."""
    nbrs = [set() for _ in range(n)]
    for s, d in zip(src, dst):
        if s != d:
            nbrs[int(s)].add(int(d))
            nbrs[int(d)].add(int(s))
    return nbrs


def test_clustering_matches_bruteforce():
    src, dst, n = _rand_graph()
    nbrs = _adj(src, dst, n)
    got = clustering_coefficients(_edges_ds(src, dst)).to_pandas()
    got = got.set_index("vid").sort_index()
    for v in range(n):
        deg = len(nbrs[v])
        if deg == 0:
            assert v not in got.index
            continue
        tri = sum(1 for a in nbrs[v] for b in nbrs[v]
                  if a < b and b in nbrs[a]) if deg >= 2 else 0
        assert got.loc[v, "degree"] == deg
        assert got.loc[v, "n_triangles"] == tri
        exp_lcc = 2.0 * tri / (deg * (deg - 1)) if deg >= 2 else 0.0
        assert got.loc[v, "lcc"] == exp_lcc  # single int division: exact


def test_common_neighbors_matches_bruteforce():
    src, dst, n = _rand_graph(n=40, m=160, seed=11)
    nbrs = _adj(src, dst, n)
    got = common_neighbor_scores(_edges_ds(src, dst)).to_pandas()
    got_map = {(int(r.a), int(r.b)): (int(r.common_neighbors), float(r.jaccard))
               for r in got.itertuples()}
    exp_map = {}
    for a in range(n):
        for b in range(a + 1, n):
            cn = len(nbrs[a] & nbrs[b])
            if cn:
                union = len(nbrs[a]) + len(nbrs[b]) - cn
                exp_map[(a, b)] = (cn, cn / union)
    assert got_map == exp_map
    # a < b canonical ordering holds on every row
    assert (got.a < got.b).all()


def test_common_neighbors_hub_cap():
    # star: hub 0 adjacent to 1..9; every leaf pair has cn=1 via the hub
    src = np.zeros(9, dtype=np.int64)
    dst = np.arange(1, 10, dtype=np.int64)
    full = common_neighbor_scores(_edges_ds(src, dst)).to_pandas()
    assert len(full) == 36  # C(9,2) leaf pairs
    capped = common_neighbor_scores(_edges_ds(src, dst),
                                    max_center_degree=5).to_pandas()
    assert len(capped) == 0  # hub excluded as center, leaves have deg 1


def test_reciprocity_matches_bruteforce():
    src, dst, n = _rand_graph(n=25, m=200, seed=3)
    de = {(int(s), int(d)) for s, d in zip(src, dst) if s != d}
    n_recip = sum(1 for s, d in de if (d, s) in de)
    got = reciprocity(_edges_ds(src, dst))
    assert got["n_edges"] == len(de)
    assert got["n_reciprocal"] == n_recip
    assert got["reciprocity"] == n_recip / len(de)


def test_assortativity_matches_bruteforce():
    src, dst, n = _rand_graph(n=50, m=250, seed=19)
    nbrs = _adj(src, dst, n)
    deg = np.array([len(s) for s in nbrs])
    xs, ys = [], []
    for a in range(n):
        for b in nbrs[a]:  # each directed orientation once -> 2E samples
            xs.append(deg[a])
            ys.append(deg[b])
    xs, ys = np.array(xs, dtype=np.float64), np.array(ys, dtype=np.float64)
    exp_r = np.corrcoef(xs, ys)[0, 1]
    got = degree_assortativity(_edges_ds(src, dst))
    assert got["m"] == len(xs)
    assert got["sx"] == int(xs.sum())
    assert got["sxy"] == int((xs * ys).sum())
    assert got["sxx"] == int((xs * xs).sum())
    assert abs(got["assortativity"] - exp_r) < 1e-12


def test_assortativity_partitioning_independent():
    src, dst, _ = _rand_graph(n=80, m=400, seed=23)
    ds1 = _edges_ds(src, dst)
    ds8 = _edges_ds(src, dst).repartition(8)
    r1 = degree_assortativity(ds1)
    r8 = degree_assortativity(ds8)
    assert r1 == r8  # integer stats -> bitwise identical coefficient


def test_adamic_adar_matches_bruteforce():
    from halvesting_geometric_ray.graph.metrics import adamic_adar_scores

    src, dst, n = _rand_graph(n=40, m=160, seed=29)
    nbrs = _adj(src, dst, n)
    got = adamic_adar_scores(_edges_ds(src, dst)).to_pandas()
    got_map = {(int(r.a), int(r.b)):
               (int(r.common_neighbors), float(r.adamic_adar),
                float(r.resource_allocation))
               for r in got.itertuples()}
    exp_map = {}
    for a in range(n):
        for b in range(a + 1, n):
            shared = nbrs[a] & nbrs[b]
            if shared:
                aa = sum(1.0 / np.log(len(nbrs[z])) for z in shared)
                ra = sum(1.0 / len(nbrs[z]) for z in shared)
                exp_map[(a, b)] = (len(shared), aa, ra)
    assert set(got_map) == set(exp_map)
    for k, (cn, aa, ra) in exp_map.items():
        g = got_map[k]
        assert g[0] == cn
        assert abs(g[1] - aa) < 1e-9 and abs(g[2] - ra) < 1e-9, k


def test_modularity_exact_oracle():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from halvesting_geometric_ray.graph.metrics import modularity

    # two triangles joined by one bridge edge: known-good communities
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    labels = {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}

    def py_modularity(edges, labels):
        m = len(edges)
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        comms = set(labels.values())
        q = 0.0
        for c in comms:
            e_in = sum(1 for a, b in edges
                       if labels[a] == c and labels[b] == c)
            d_c = sum(d for v, d in deg.items() if labels[v] == c)
            q += e_in / m - (d_c / (2 * m)) ** 2
        return q

    eds = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges], type=pa.int64()),
        "dst": pa.array([b for _, b in edges], type=pa.int64())}))
    lds = rd.from_arrow(pa.table({
        "vid": pa.array(sorted(labels), type=pa.int64()),
        "label": pa.array([labels[v] for v in sorted(labels)],
                          type=pa.int64())}))
    q, per = modularity(eds.repartition(3), lds.repartition(2))
    assert abs(q - py_modularity(edges, labels)) < 1e-12
    # good communities beat a degenerate all-one labeling
    l1 = rd.from_arrow(pa.table({
        "vid": pa.array(sorted(labels), type=pa.int64()),
        "label": pa.array([0] * 6, type=pa.int64())}))
    q1, _ = modularity(eds, l1)
    assert q > q1
    assert abs(q1) < 1e-12  # single community: Q = 0 by definition


def test_edge_cut_report():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from halvesting_geometric_ray.graph.metrics import edge_cut_report

    # parts: [0,4) and [4,8).  2 cross edges, 4 intra
    src = np.array([0, 1, 2, 4, 3, 5], dtype=np.int64)
    dst = np.array([1, 2, 3, 5, 4, 1], dtype=np.int64)
    edges = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
    rep = edge_cut_report(edges, np.array([0, 4, 8]))
    assert rep["n_edges"] == 6 and rep["n_cut"] == 2
    assert rep["cut_fraction"] == 2 / 6
    assert rep["parts"][0]["src_edges"] == 4  # srcs 0,1,2,3
    assert rep["parts"][1]["src_edges"] == 2
    assert rep["imbalance"] == 4 / 3
    # multi-block layout gives identical totals
    rep2 = edge_cut_report(edges.repartition(3), np.array([0, 4, 8]))
    assert rep2 == rep


# ---- community conductance ----------------------------------------------

def test_conductance_two_cliques_exact():
    import pandas as pd
    import ray.data as rd

    from halvesting_geometric_ray.graph.metrics import community_conductance

    # two 5-cliques bridged by one edge; labels = the cliques
    pairs = []
    for lo in (0, 5):
        vv = range(lo, lo + 5)
        pairs += [(a, b) for a in vv for b in vv if a < b]
    pairs.append((4, 5))
    edges = rd.from_pandas(pd.DataFrame(
        {"src": np.array([a for a, b in pairs], dtype=np.int64),
         "dst": np.array([b for a, b in pairs], dtype=np.int64)}))
    labels = rd.from_pandas(pd.DataFrame(
        {"vid": np.arange(10, dtype=np.int64),
         "label": np.array([0] * 5 + [5] * 5, dtype=np.int64)}))
    ds, info = community_conductance(edges, labels)
    df = ds.to_pandas().set_index("label")
    # per clique: e_in=10, deg=21 (20 + bridge endpoint), cut=1
    assert df.volume.tolist() == [21, 21]
    assert df.cut.tolist() == [1, 1]
    assert np.allclose(df.conductance, 1 / 21)
    assert info["m"] == 21
    # degenerate whole-graph community -> conductance 0
    one = rd.from_pandas(pd.DataFrame(
        {"vid": np.arange(10, dtype=np.int64),
         "label": np.zeros(10, dtype=np.int64)}))
    d1, _ = community_conductance(edges, one)
    assert d1.to_pandas().conductance.tolist() == [0.0]


def test_conductance_brute_force():
    import itertools

    import pandas as pd
    import ray.data as rd

    from halvesting_geometric_ray.graph.metrics import community_conductance

    rng = np.random.default_rng(6)
    n = 40
    m = rng.random((n, n)) < 0.12
    iu = np.triu_indices(n, 1)
    pairs = [(a, b) for a, b in zip(*iu) if m[a, b]]
    lab = rng.integers(0, 5, n)
    edges = rd.from_pandas(pd.DataFrame(
        {"src": np.array([a for a, b in pairs], dtype=np.int64),
         "dst": np.array([b for a, b in pairs], dtype=np.int64)}))
    labels = rd.from_pandas(pd.DataFrame(
        {"vid": np.arange(n, dtype=np.int64),
         "label": lab.astype(np.int64)}))
    ds, info = community_conductance(edges, labels)
    df = ds.to_pandas().set_index("label").sort_index()
    m2 = 2 * len(pairs)
    for c in np.unique(lab):
        vol = sum(int(lab[a] == c) + int(lab[b] == c)
                  for a, b in pairs)
        cut = sum(1 for a, b in pairs if (lab[a] == c) != (lab[b] == c))
        den = min(vol, m2 - vol)
        exp = cut / den if den > 0 else 0.0
        assert df.volume.loc[c] == vol, c
        assert df.cut.loc[c] == cut, c
        assert np.isclose(df.conductance.loc[c], exp), c


def test_rich_club_matches_bruteforce():
    import pandas as pd

    from halvesting_geometric_ray.config import EngineConfig
    from halvesting_geometric_ray.graph.metrics import rich_club

    rng = np.random.default_rng(13)
    n, m = 50, 300
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    # brute force on the canonical simple graph
    pairs = {(min(a, b), max(a, b)) for a, b in zip(src, dst) if a != b}
    deg = np.zeros(n, dtype=np.int64)
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    ds = rd.from_pandas(pd.DataFrame({"src": src.astype(np.int64),
                                      "dst": dst.astype(np.int64)}))
    ks = (0, 1, 2, 4, 8, 16, 64)
    got = rich_club(ds, ks=ks, cfg=EngineConfig(num_parts=4)).to_pandas()
    for r in got.itertuples():
        keep = np.flatnonzero(deg > r.k)
        n_k = len(keep)
        ks_set = set(keep.tolist())
        e_k = sum(1 for a, b in pairs if a in ks_set and b in ks_set)
        assert (r.n_k, r.e_k) == (n_k, e_k), r.k
        want = round(2.0 * e_k / (n_k * (n_k - 1)), 9) if n_k >= 2 else 0.0
        assert r.phi == want
    # monotone coverage: n_k decreasing, k=64 empties on this fixture
    assert (np.diff(got.n_k.to_numpy()) <= 0).all()
    assert got.n_k.iloc[-1] == 0 and got.phi.iloc[-1] == 0.0


def test_categorical_assortativity_oracle():
    """Newman eq.2 vs a dense mixing-matrix numpy replay + the
    perfect/anti cases."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from halvesting_geometric_ray.graph.metrics import \
        categorical_assortativity

    rng = np.random.default_rng(7)
    cats = np.array(["en", "fr", "de"])
    la = cats[rng.integers(0, 3, 300)]
    lb = cats[rng.integers(0, 3, 300)]
    ds = rd.from_pandas(pd.DataFrame({"la": la, "lb": lb}))
    got = categorical_assortativity(ds)
    e = np.zeros((3, 3))
    for x, y in zip(la, lb):
        e[list(cats).index(x), list(cats).index(y)] += 1
    e /= e.sum()
    exp = (np.trace(e) - (e.sum(1) * e.sum(0)).sum()) / \
        (1.0 - (e.sum(1) * e.sum(0)).sum())
    assert abs(got["assortativity"] - exp) < 1e-12
    assert got["n_edges"] == 300
    # perfect homophily -> r == 1 (two categories so denominator != 0)
    same = rd.from_pandas(pd.DataFrame(
        {"la": ["en"] * 5 + ["fr"] * 5, "lb": ["en"] * 5 + ["fr"] * 5}))
    assert categorical_assortativity(same)["assortativity"] == 1.0
    # perfect disassortativity on balanced two-category mixing -> -1
    anti = rd.from_pandas(pd.DataFrame(
        {"la": ["en"] * 5 + ["fr"] * 5, "lb": ["fr"] * 5 + ["en"] * 5}))
    assert categorical_assortativity(anti)["assortativity"] == -1.0
