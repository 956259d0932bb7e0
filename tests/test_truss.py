"""k-truss vs an exact single-process peeling oracle."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.config import EngineConfig
from halvesting_geometric_ray.graph.truss import k_truss


def truss_oracle(src, dst, k):
    """Exact k-truss edge set via iterated support recompute."""
    edges = {(min(a, b), max(a, b)) for a, b in zip(src, dst) if a != b}
    while True:
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {e: len(adj[e[0]] & adj[e[1]]) for e in edges}
        keep = {e for e in edges if sup[e] >= k - 2}
        if keep == edges:
            return {e: sup[e] for e in edges}
        edges = keep


def _run(src, dst, k, num_parts=4):
    edges = rd.from_pandas(pd.DataFrame({
        "src": np.asarray(src, dtype=np.int64),
        "dst": np.asarray(dst, dtype=np.int64)}))
    ds, info = k_truss(edges, k, EngineConfig(num_parts=num_parts))
    got = ds.to_pandas()
    if got.empty:  # empty-ds to_pandas drops the schema (Ray quirk)
        got = pd.DataFrame(columns=["src", "dst", "support"])
    got = got.sort_values(["src", "dst"]).reset_index(drop=True)
    return got, info


def test_clique_plus_tail():
    # 6-clique (every edge support 4) + a pendant tail + a triangle
    k6 = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    extra = [(5, 6), (6, 7), (7, 8), (8, 6), (0, 9)]
    src = [e[0] for e in k6 + extra]
    dst = [e[1] for e in k6 + extra]
    # 3-truss: clique + the {6,7,8} triangle survive; tails drop
    got, info = _run(src, dst, 3)
    exp = truss_oracle(src, dst, 3)
    assert {(r.src, r.dst) for r in got.itertuples()} == set(exp)
    assert all(exp[(r.src, r.dst)] == r.support for r in got.itertuples())
    # 5-truss: only the clique
    got5, _ = _run(src, dst, 5)
    assert {(r.src, r.dst) for r in got5.itertuples()} == set(k6)
    # 7-truss: nothing
    got7, _ = _run(src, dst, 7)
    assert len(got7) == 0


def test_tree_has_empty_3truss():
    src, dst = np.arange(20), np.arange(1, 21)
    got, _ = _run(src, dst, 3)
    assert len(got) == 0


@pytest.mark.parametrize("seed,k", [(0, 3), (1, 4), (2, 5)])
def test_random_matches_oracle(seed, k):
    rng = np.random.default_rng(seed)
    n = 60
    m = np.triu(rng.random((n, n)) < 0.12, k=1)
    src, dst = np.nonzero(m)
    exp = truss_oracle(src, dst, k)
    for parts in (1, 5):
        got, _ = _run(src, dst, k, num_parts=parts)
        pairs = {(r.src, r.dst): r.support for r in got.itertuples()}
        assert pairs == exp, (parts, k)


def test_k_validation():
    ds = rd.from_pandas(pd.DataFrame({"src": [0], "dst": [1]}))
    with pytest.raises(ValueError, match="k >= 3"):
        k_truss(ds, 2)
