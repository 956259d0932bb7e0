"""HyperBall / ANF vs exact in-ball NumPy oracles.

The sketch is approximate, so the oracle checks are (seeded,
deterministic) error-bound assertions; the structural invariants —
monotone neighborhood function, fixpoint round count, bitwise
partitioning/actor independence — are exact.
"""

import numpy as np
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.anf import (anf, hll_estimate,
                                                init_registers, splitmix64)
from halvesting_geometric_ray.graph.build import symmetrize


def inball_oracle(n, src, dst):
    """Exact per-vertex in-ball sizes by radius: sizes[v][t] =
    |{u : d(u->v) <= t}|, plus harmonic centrality and in-eccentricity."""
    adj_in = [[] for _ in range(n)]
    for s, d in zip(src, dst):
        adj_in[d].append(s)
    reach = np.zeros(n)
    harm = np.zeros(n)
    ecc = np.zeros(n, dtype=np.int64)
    nf = []
    for v in range(n):
        dist = {v: 0}
        frontier = [v]
        r = 0
        while frontier:
            r += 1
            nxt = []
            for u in frontier:
                for w in adj_in[u]:
                    if w not in dist:
                        dist[w] = r
                        nxt.append(w)
            frontier = nxt
        reach[v] = len(dist)
        harm[v] = sum(1.0 / d for d in dist.values() if d > 0)
        ecc[v] = max(dist.values())
        for t, d in enumerate(sorted(dist.values())):
            pass
        sizes = np.bincount(list(dist.values()))
        nf.append(np.cumsum(sizes))
    return reach, harm, ecc, nf


def _edges(g):
    es = rd.read_parquet(g.edges).to_pandas()
    return es.src.to_numpy(), es.dst.to_numpy()


def test_anf_matches_exact_oracle(tiny_graph, tmp_path):
    src, dst = _edges(tiny_graph)
    n = tiny_graph.num_vertices
    reach, harm, ecc, nf = inball_oracle(n, src, dst)
    ds, info = anf(rd.read_parquet(tiny_graph.edges), tiny_graph.offsets,
                   str(tmp_path / "anf"), p_bits=9)
    df = ds.to_pandas().sort_values("vid").reset_index(drop=True)
    assert (df.vid.to_numpy() == np.arange(n)).all()
    r = df.reach_est.to_numpy()
    h = df.harmonic.to_numpy()
    # per-vertex HLL rel error: sigma = 1.04/sqrt(512) ~ 4.6%; allow 5 sigma
    rel = np.abs(r - reach) / np.maximum(reach, 1)
    assert rel.mean() < 0.03, rel.mean()
    assert rel.max() < 0.23, rel.max()
    m = reach > 1
    hrel = np.abs(h[m] - harm[m]) / harm[m]
    assert hrel.mean() < 0.05, hrel.mean()
    # neighborhood function: N(t) vs exact, and monotone
    tmax = int(ecc.max())
    exact_nf = [sum(s[min(t, len(s) - 1)] for s in nf)
                for t in range(tmax + 1)]
    got_nf = info["nf"]
    assert len(got_nf) == tmax + 1  # fixpoint exactly at max in-ecc
    assert all(b >= a for a, b in zip(got_nf, got_nf[1:]))
    for a, b in zip(got_nf, exact_nf):
        assert abs(a - b) / b < 0.05, (a, b)
    # rounds = fixpoint detection one past the last change
    assert info["num_rounds"] <= tmax + 2
    # closeness consistent with its own fields
    sd = df.sum_dist_est.to_numpy()
    cm = sd > 0
    assert np.allclose(df.closeness.to_numpy()[cm], (r[cm] - 1) / sd[cm])


def test_anf_partitioning_and_actor_independent(tiny_graph, tmp_path):
    ref = None
    for na in (1, 3):
        ds, info = anf(rd.read_parquet(tiny_graph.edges), tiny_graph.offsets,
                       str(tmp_path / f"a{na}"), p_bits=6, num_actors=na,
                       shards_dir=str(tmp_path / f"a{na}" / "csr"))
        df = ds.to_pandas().sort_values("vid").reset_index(drop=True)
        cur = (df.reach_est.to_numpy(), df.harmonic.to_numpy(),
               tuple(info["nf"]))
        if ref is None:
            ref = cur
        else:
            # BITWISE identical: max-merges of deterministic hashes
            assert (ref[0] == cur[0]).all()
            assert (ref[1] == cur[1]).all()
            assert ref[2] == cur[2]


def test_anf_undirected_reach_is_component_size(tiny_graph, tmp_path):
    src, dst = _edges(tiny_graph)
    n = tiny_graph.num_vertices
    # exact undirected component sizes via union-find
    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(src, dst):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots = np.array([find(v) for v in range(n)])
    comp_size = np.bincount(roots, minlength=n)[roots].astype(np.float64)
    ds, _ = anf(symmetrize(rd.read_parquet(tiny_graph.edges), dedup=False),
                tiny_graph.offsets, str(tmp_path / "sym"), p_bits=9,
                shards_dir=str(tmp_path / "sym" / "csr"))
    df = ds.to_pandas().sort_values("vid").reset_index(drop=True)
    rel = np.abs(df.reach_est.to_numpy() - comp_size) / comp_size
    assert rel.mean() < 0.03
    assert rel.max() < 0.25


def test_hll_estimate_and_registers():
    # singleton rows estimate ~1
    vids = np.arange(5000, dtype=np.int64)
    idx, rho = init_registers(vids, 7, seed=42)
    assert idx.min() >= 0 and idx.max() < 128
    assert rho.min() >= 1 and rho.max() <= 64 - 7 + 1
    R = np.zeros((len(vids), 128), dtype=np.uint8)
    R[np.arange(len(vids)), idx] = rho
    est = hll_estimate(R)
    assert np.all(np.abs(est - 1.0) < 0.05)
    # a merged row over k distinct vertices estimates ~k
    merged = np.zeros(128, dtype=np.uint8)
    np.maximum.at(merged, idx, rho)
    est_all = hll_estimate(merged[None, :])[0]
    assert abs(est_all - 5000) / 5000 < 0.15
    # chunked == unchunked
    assert (hll_estimate(R, chunk=17) == hll_estimate(R)).all()


def test_splitmix64_determinism_and_spread():
    x = np.arange(100000, dtype=np.uint64)
    h1 = splitmix64(x, seed=1)
    h2 = splitmix64(x, seed=1)
    assert (h1 == h2).all()
    assert len(np.unique(h1)) == len(x)  # injective on this range
    assert (splitmix64(x, seed=2) != h1).mean() > 0.999


def test_anf_rejects_bad_pbits(tiny_graph, tmp_path):
    with pytest.raises(ValueError):
        anf(rd.read_parquet(tiny_graph.edges), tiny_graph.offsets,
            str(tmp_path / "bad"), p_bits=3)


def test_effective_diameter():
    from halvesting_geometric_ray.graph.anf import effective_diameter

    # path-graph-like nf: N(t) grows linearly
    nf = [10, 20, 30, 40, 50]
    assert effective_diameter(nf, q=1.0) == 4.0
    assert effective_diameter(nf, q=0.5) == pytest.approx(1.5)
    assert effective_diameter([7.0]) == 0.0
    with pytest.raises(ValueError):
        effective_diameter(nf, q=0.0)
    with pytest.raises(ValueError):
        effective_diameter([])


def test_effective_diameter_on_real_nf(tiny_graph, tmp_path):
    from halvesting_geometric_ray.graph.anf import anf, effective_diameter

    _, info = anf(rd.read_parquet(tiny_graph.edges), tiny_graph.offsets,
                  str(tmp_path / "ed"), p_bits=8)
    ed = effective_diameter(info["nf"], 0.9)
    assert 0 < ed <= info["num_rounds"]
