"""SCAN structural clustering vs a sequential pure-Python oracle, on
crafted graphs with known cores/borders/hubs/outliers, plus layout
invariance."""

import itertools
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.scan import scan_clusters


def _edges_ds(pairs, blocks=1):
    df = pd.DataFrame(pairs, columns=["src", "dst"]).astype("int64")
    return rd.from_pandas(df).repartition(blocks)


def _offsets(n, parts=4):
    return np.linspace(0, n, parts + 1).astype(np.int64)


def _oracle_scan(pairs, n, eps, mu):
    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    adj = {v: set() for v in range(n)}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    incident = {v for v in range(n) if adj[v]}

    def sigma(u, v):
        cn = len(adj[u] & adj[v])
        return round((cn + 2)
                     / math.sqrt((len(adj[u]) + 1) * (len(adj[v]) + 1)), 9)

    eps_adj = {v: {u for u in adj[v] if sigma(u, v) >= eps}
               for v in incident}
    cores = {v for v in incident if 1 + len(eps_adj[v]) >= mu}
    # clusters: CC over core-core eps edges, label = min core vid
    label = {}
    for c in sorted(cores):
        if c in label:
            continue
        comp, stack = set(), [c]
        while stack:
            x = stack.pop()
            if x in comp:
                continue
            comp.add(x)
            stack.extend(u for u in eps_adj[x] if u in cores)
        m = min(comp)
        for x in comp:
            label[x] = m
    roles = {v: "core" for v in cores}
    for v in incident - cores:
        attach = sorted(label[u] for u in eps_adj[v] if u in cores)
        if attach:
            label[v] = attach[0]
            roles[v] = "border"
    members = set(label)
    for v in incident - members:
        seen = {label[u] for u in adj[v] if u in members}
        roles[v] = "hub" if len(seen) >= 2 else "outlier"
        label[v] = -1
    return {v: (label[v], roles[v]) for v in incident}


# two 4-cliques bridged by vertex 8 (hub), a pendant chain (its center
# is a core at mu=3 — pendant edges are structurally similar), and an
# isolated edge (outliers at mu=3: closed eps-neighborhoods of size 2)
CLIQ_A = list(itertools.combinations([0, 1, 2, 3], 2))
CLIQ_B = list(itertools.combinations([4, 5, 6, 7], 2))
BRIDGE = [(0, 8), (8, 4)]
CHAIN = [(9, 10), (10, 11)]
LONE = [(12, 13)]
PAIRS = CLIQ_A + CLIQ_B + BRIDGE + CHAIN + LONE
N = 14


@pytest.mark.parametrize("eps,mu", [(0.6, 3), (0.5, 2), (0.75, 4)])
def test_scan_matches_oracle(tmp_path, eps, mu):
    out, info = scan_clusters(_edges_ds(PAIRS), _offsets(N),
                              str(tmp_path / f"wd_{eps}_{mu}"),
                              eps=eps, mu=mu)
    got = {r.vid: (r.label, r.role)
           for r in out.to_pandas().itertuples()}
    exp = _oracle_scan(PAIRS, N, eps, mu)
    assert got == exp


def test_scan_hub_vs_outlier(tmp_path):
    out, _ = scan_clusters(_edges_ds(PAIRS), _offsets(N),
                           str(tmp_path / "wd"), eps=0.6, mu=3)
    df = out.to_pandas().set_index("vid")
    # the two cliques are separate clusters; 8 bridges both -> hub
    assert df.loc[8, "role"] == "hub"
    assert df.loc[8, "label"] == -1
    assert df.loc[0, "role"] == "core"
    assert df.loc[4, "role"] == "core"
    assert df.loc[0, "label"] != df.loc[4, "label"]
    # chain center is a core (pendant sigma = 2/sqrt(6) >= 0.6); the
    # ends attach as borders, all labeled by the single core vid 10
    assert df.loc[10, "role"] == "core"
    assert set(df.loc[[9, 11], "role"]) == {"border"}
    assert set(df.loc[[9, 10, 11], "label"]) == {10}
    # the isolated edge has no cores and no member neighbors -> outliers
    assert set(df.loc[[12, 13], "role"]) == {"outlier"}
    assert set(df.loc[[12, 13], "label"]) == {-1}


def test_scan_layout_invariance(tmp_path):
    a, _ = scan_clusters(_edges_ds(PAIRS, blocks=1), _offsets(N),
                         str(tmp_path / "w1"), eps=0.6, mu=3)
    b, _ = scan_clusters(_edges_ds(PAIRS, blocks=6), _offsets(N, parts=2),
                         str(tmp_path / "w6"), eps=0.6, mu=3)
    pa_ = a.to_pandas().sort_values("vid").reset_index(drop=True)
    pb_ = b.to_pandas().sort_values("vid").reset_index(drop=True)
    pd.testing.assert_frame_equal(pa_, pb_)
