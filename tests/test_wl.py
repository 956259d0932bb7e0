"""WL color refinement (graph/wl.py) vs two oracles: (1) a sequential
NumPy replay of the pinned hash update, (2) a SEMANTIC classic-WL
implementation using sorted-tuple relabeling (no shared hashing) whose
per-round PARTITIONS must coincide with the engine's."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.wl import mix64, wl_refinement, wl_update


def _adj(n, src, dst):
    adj = [set() for _ in range(n)]
    for a, b in zip(src, dst):
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    return adj


def _replay(n, adj, rounds):
    """Sequential replay of the engine's exact update."""
    c = np.array([len(adj[v]) for v in range(n)], dtype=np.uint64)
    hist = [c.copy()]
    for _ in range(rounds):
        s1 = np.zeros(n, dtype=np.uint64)
        s2 = np.zeros(n, dtype=np.uint64)
        cnt = np.zeros(n, dtype=np.int64)
        with np.errstate(over="ignore"):
            for v in range(n):
                for u in adj[v]:
                    s1[v] += mix64(np.array([c[u]], dtype=np.uint64))[0]
                    s2[v] += mix64(np.array(
                        [c[u] ^ np.uint64(0x9E3779B97F4A7C15)],
                        dtype=np.uint64))[0]
                    cnt[v] += 1
        c = wl_update(c, s1, s2, cnt)
        hist.append(c.copy())
    return hist


def _classic_wl(n, adj, rounds):
    """Independent classic WL: sorted neighbor-label tuples + dict
    relabeling.  Returns the partition (tuple of frozensets) per
    round."""
    lab = [len(adj[v]) for v in range(n)]
    parts = []
    for _ in range(rounds + 1):
        groups = {}
        for v in range(n):
            groups.setdefault(lab[v], set()).add(v)
        parts.append(frozenset(frozenset(g) for g in groups.values()))
        sig = {v: (lab[v], tuple(sorted(lab[u] for u in adj[v])))
               for v in range(n)}
        relab = {s: i for i, s in enumerate(sorted(set(sig.values())))}
        lab = [relab[sig[v]] for v in range(n)]
    return parts


def _run(n, src, dst, tmp, tag, num_parts=1, **kw):
    s = np.concatenate([src, dst]).astype(np.int64)
    d = np.concatenate([dst, src]).astype(np.int64)
    m = s != d
    pairs = np.unique(np.stack([s[m], d[m]], axis=1), axis=0)
    edges = rd.from_pandas(pd.DataFrame({"src": pairs[:, 0],
                                         "dst": pairs[:, 1]}))
    offsets = (np.array([0, n], dtype=np.int64) if num_parts == 1 else
               np.unique(np.linspace(0, n, num_parts + 1).astype(np.int64)))
    ds, info = wl_refinement(edges, offsets, str(tmp / tag), **kw)
    got = ds.to_pandas().sort_values("vid").reset_index(drop=True)
    assert len(got) == n
    return got, info


def _partition(labels):
    groups = {}
    for v, c in enumerate(labels):
        groups.setdefault(c, set()).add(v)
    return frozenset(frozenset(g) for g in groups.values())


def test_matches_replay_and_classic_partition(tmp_path):
    rng = np.random.default_rng(7)
    n = 80
    m = np.triu(rng.random((n, n)) < 0.05, k=1)
    src, dst = np.nonzero(m)
    adj = _adj(n, src, dst)
    got, info = _run(n, src, dst, tmp_path, "rand", num_parts=4)
    rounds = info["num_rounds"]
    assert info["converged"]
    # (1) bitwise replay: final dense ranks == ranks of replay colors
    hist = _replay(n, adj, rounds)
    final = hist[-1]
    ranks = np.searchsorted(np.unique(final), final)
    assert (got.wl_color.to_numpy() == ranks).all()
    # (2) semantic: engine partition == classic-WL fixpoint partition
    classic = _classic_wl(n, adj, rounds + 2)
    assert _partition(got.wl_color.tolist()) == classic[-1]
    # per-round class counts match classic refinement
    for r, rec in enumerate(info["rounds"]):
        assert rec["n_classes"] == len(classic[r]), r


def test_regular_graph_single_class(tmp_path):
    # cycles are 2-regular: WL-1 can never split them (classic C3 vs
    # C4 indistinguishability)
    src = np.array([0, 1, 2, 3, 4, 5, 6])
    dst = np.array([1, 2, 0, 4, 5, 6, 3])  # C3 + C4
    got, info = _run(7, src, dst, tmp_path, "cyc")
    assert info["n_classes"] == 1
    assert got.wl_color.nunique() == 1


def test_star_and_layout_invariance(tmp_path):
    # star: hub vs leaves — exactly 2 classes after 1 round
    n = 12
    src = np.zeros(n - 1, dtype=np.int64)
    dst = np.arange(1, n, dtype=np.int64)
    a, _ = _run(n, src, dst, tmp_path, "s1", num_parts=1)
    b, _ = _run(n, src, dst, tmp_path, "s2", num_parts=5)
    assert a.equals(b)
    assert a.wl_color.nunique() == 2
    assert (a.wl_color[1:] == a.wl_color[1]).all()
    rng = np.random.default_rng(3)
    n = 60
    m = np.triu(rng.random((n, n)) < 0.08, k=1)
    src, dst = np.nonzero(m)
    x, _ = _run(n, src, dst, tmp_path, "l1", num_parts=1)
    y, _ = _run(n, src, dst, tmp_path, "l2", num_parts=6)
    pd.testing.assert_frame_equal(x, y)
