"""Densest subgraph vs a sequential replay + planted-clique recovery."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.densest import densest_subgraph


def densest_oracle(n, adj, eps, max_rounds=500):
    """Sequential replay of the synchronous Bahmani rounds."""
    alive = set(range(n))
    deg = {v: len(adj[v]) for v in range(n)}
    removed = np.full(n, -1, dtype=np.int64)
    best_rho, best_round = -1.0, 0
    for rnd in range(max_rounds):
        if not alive:
            break
        e = sum(deg[v] for v in alive) / 2.0
        rho = e / len(alive)
        if rho > best_rho:
            best_rho, best_round = rho, rnd
        thresh = 2.0 * (1.0 + eps) * rho
        dying = [v for v in alive if deg[v] <= thresh]
        for v in dying:
            removed[v] = rnd
            alive.discard(v)
        for v in dying:
            for u in adj[v]:
                if u in alive:
                    deg[u] -= 1
    member = (removed == -1) | (removed >= best_round)
    return removed, member, best_rho, best_round


def _adj(n, src, dst):
    adj = [set() for _ in range(n)]
    for a, b in zip(src, dst):
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    return adj


def _run(n, src, dst, tmp, tag, num_parts=1, eps=0.1):
    s = np.concatenate([src, dst]).astype(np.int64)
    d = np.concatenate([dst, src]).astype(np.int64)
    m = s != d
    pairs = np.unique(np.stack([s[m], d[m]], axis=1), axis=0)
    edges = rd.from_pandas(pd.DataFrame({"src": pairs[:, 0],
                                         "dst": pairs[:, 1]}))
    offsets = (np.array([0, n], dtype=np.int64) if num_parts == 1 else
               np.unique(np.linspace(0, n, num_parts + 1).astype(np.int64)))
    ds, info = densest_subgraph(edges, offsets, str(tmp / tag), eps=eps)
    got = ds.to_pandas().sort_values("vid").reset_index(drop=True)
    assert len(got) == n
    return got, info


def test_planted_clique_recovered(tmp_path):
    # 12-clique planted in a sparse random background
    rng = np.random.default_rng(0)
    n = 150
    m = np.triu(rng.random((n, n)) < 0.02, k=1)
    src, dst = np.nonzero(m)
    kq = [(i, j) for i in range(12) for j in range(i + 1, 12)]
    src = np.concatenate([src, [e[0] for e in kq]])
    dst = np.concatenate([dst, [e[1] for e in kq]])
    got, info = _run(n, src, dst, tmp_path, "pc")
    members = set(got.loc[got.in_densest, "vid"].tolist())
    assert set(range(12)) <= members
    # density of the returned set is at least the guarantee bound
    # relative to the clique's density (11/2 = 5.5)
    assert info["best_density"] >= 5.5 / (2 * 1.1) - 1e-9


@pytest.mark.parametrize("seed,p,eps", [(1, 0.05, 0.1), (2, 0.1, 0.3)])
def test_matches_sequential_replay(tmp_path, seed, p, eps):
    rng = np.random.default_rng(seed)
    n = 120
    m = np.triu(rng.random((n, n)) < p, k=1)
    src, dst = np.nonzero(m)
    adj = _adj(n, src, dst)
    exp_rem, exp_mem, exp_rho, exp_round = densest_oracle(n, adj, eps)
    for parts in (1, 4):
        got, info = _run(n, src, dst, tmp_path, f"r{seed}p{parts}",
                         num_parts=parts, eps=eps)
        assert (got.removal_round.to_numpy() == exp_rem).all(), parts
        assert (got.in_densest.to_numpy() == exp_mem).all(), parts
        assert info["best_density"] == pytest.approx(exp_rho)
        assert info["best_round"] == exp_round


def test_eps_validation(tmp_path):
    edges = rd.from_pandas(pd.DataFrame({"src": [0], "dst": [1]}))
    with pytest.raises(ValueError, match="eps"):
        densest_subgraph(edges, np.array([0, 2]), str(tmp_path / "v"),
                         eps=0.0)
