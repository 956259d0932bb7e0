"""Luby MIS vs a sequential replay of the same rounds + invariants."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.mis import (maximal_independent_set,
                                                round_priority)


def mis_oracle(n, adj, seed, max_rounds=200):
    """Sequential replay of the synchronous rounds with the same
    stateless priorities."""
    state = np.zeros(n, dtype=np.int8)  # 0 undecided, 1 mis, -1 out
    for rnd in range(max_rounds):
        und = np.flatnonzero(state == 0)
        if und.size == 0:
            return state
        prio = {int(v): int(round_priority(np.array([v]), rnd, seed)[0])
                for v in range(n)}
        new_mis = []
        for v in und:
            nb = [u for u in adj[v] if state[u] == 0]
            if all((prio[v], v) < (prio[u], u) for u in nb):
                new_mis.append(v)
        for v in new_mis:
            state[v] = 1
        for v in new_mis:
            for u in adj[v]:
                if state[u] == 0:
                    state[u] = -1
    raise AssertionError("oracle did not converge")


def _adj(n, src, dst):
    adj = [set() for _ in range(n)]
    for a, b in zip(src, dst):
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    return adj


def _run(n, src, dst, tmp, tag, num_parts=1, seed=42, **kw):
    s = np.concatenate([src, dst]).astype(np.int64)
    d = np.concatenate([dst, src]).astype(np.int64)
    m = s != d
    pairs = np.unique(np.stack([s[m], d[m]], axis=1), axis=0)
    edges = rd.from_pandas(pd.DataFrame({"src": pairs[:, 0],
                                         "dst": pairs[:, 1]}))
    offsets = (np.array([0, n], dtype=np.int64) if num_parts == 1 else
               np.unique(np.linspace(0, n, num_parts + 1).astype(np.int64)))
    ds, info = maximal_independent_set(edges, offsets, str(tmp / tag),
                                       seed=seed, **kw)
    got = ds.to_pandas().sort_values("vid").reset_index(drop=True)
    assert len(got) == n
    return got, info


@pytest.mark.parametrize("seed,p", [(0, 0.03), (1, 0.08), (42, 0.15)])
def test_random_matches_sequential_replay(tmp_path, seed, p):
    rng = np.random.default_rng(seed)
    n = 120
    m = np.triu(rng.random((n, n)) < p, k=1)
    src, dst = np.nonzero(m)
    adj = _adj(n, src, dst)
    exp = mis_oracle(n, adj, seed)
    for parts in (1, 4):
        got, info = _run(n, src, dst, tmp_path, f"r{seed}p{parts}",
                         num_parts=parts, seed=seed)
        assert (got.in_mis.to_numpy() == (exp == 1)).all(), parts
        assert info["mis_size"] == int((exp == 1).sum())
    # invariants against the raw adjacency
    mis = set(np.flatnonzero(exp == 1).tolist())
    for v in mis:
        assert not (adj[v] & mis)  # independence
    for v in range(n):
        if v not in mis:
            assert adj[v] & mis  # maximality


def test_crafted_structures(tmp_path):
    # star: either the hub alone or all leaves
    src = np.zeros(6, dtype=np.int64)
    dst = np.arange(1, 7, dtype=np.int64)
    got, info = _run(7, src, dst, tmp_path, "star")
    mis = set(got.loc[got.in_mis, "vid"])
    assert mis == {0} or mis == set(range(1, 7))
    # edgeless graph: everything is in the MIS, one round
    got2, info2 = _run(5, np.array([], dtype=np.int64),
                       np.array([], dtype=np.int64), tmp_path, "empty")
    assert got2.in_mis.all() and info2["num_rounds"] == 1


def test_seed_changes_result_deterministically(tmp_path):
    rng = np.random.default_rng(3)
    n = 60
    m = np.triu(rng.random((n, n)) < 0.1, k=1)
    src, dst = np.nonzero(m)
    a, _ = _run(n, src, dst, tmp_path, "s1", seed=1)
    a2, _ = _run(n, src, dst, tmp_path, "s1b", seed=1, num_parts=3)
    b, _ = _run(n, src, dst, tmp_path, "s2", seed=2)
    assert (a.in_mis.to_numpy() == a2.in_mis.to_numpy()).all()
    exp1 = mis_oracle(n, _adj(n, src, dst), 1)
    exp2 = mis_oracle(n, _adj(n, src, dst), 2)
    assert (a.in_mis.to_numpy() == (exp1 == 1)).all()
    assert (b.in_mis.to_numpy() == (exp2 == 1)).all()
