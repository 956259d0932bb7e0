"""Leiden connectivity refinement: exact induced-subgraph-CC oracle,
identity on already-connected labelings, modularity monotonicity, the
end-to-end louvain_leiden guarantee, layout invariance."""

import collections

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.config import DEFAULT
from halvesting_geometric_ray.graph.leiden import (
    louvain_leiden, refine_connectivity)

from tests.test_louvain import _edges_ds, _offsets, clique_edges


def labels_ds(lab):
    return rd.from_pandas(pd.DataFrame(
        {"vid": np.arange(len(lab), dtype=np.int64),
         "community": np.asarray(lab, dtype=np.int64)}))


def oracle_refine(n, pairs, lab):
    """Sequential truth: per community, BFS connected components of
    the induced subgraph; refined label = min vid of the piece."""
    adj = collections.defaultdict(list)
    for a, b in pairs:
        if lab[a] == lab[b] and a != b:
            adj[a].append(b)
            adj[b].append(a)
    out = np.full(n, -1, dtype=np.int64)
    for v in range(n):
        if out[v] >= 0:
            continue
        comp, queue, seen = [v], [v], {v}
        while queue:
            u = queue.pop()
            for w in adj[u]:
                if w not in seen:
                    seen.add(w)
                    comp.append(w)
                    queue.append(w)
        rep = min(comp)
        for u in comp:
            out[u] = rep
    return out


def run_refine(pairs, lab, tmp_path, *, parts=1, job="j", stats=True):
    n = len(lab)
    ds, info = refine_connectivity(
        _edges_ds(pairs), labels_ds(lab), _offsets(n, parts),
        str(tmp_path / job), DEFAULT, job=job, stats=stats)
    got = ds.to_pandas().sort_values("vid")["community"].to_numpy()
    return got, info


def test_refine_splits_disconnected(tmp_path):
    # one label over two cliques with no bridge + one isolate: the
    # Louvain failure mode in miniature
    pairs = clique_edges(0, 5) + clique_edges(5, 10)
    lab = [0] * 11  # vertex 10 has no edges at all
    got, info = run_refine(pairs, lab, tmp_path)
    exp = oracle_refine(11, pairs, lab)
    assert np.array_equal(got, exp)
    assert got[0] == 0 and got[5] == 5 and got[10] == 10
    assert info["n_before"] == 1
    assert info["n_after"] == 3
    assert info["n_split"] == 1


def test_refine_identity_on_connected(tmp_path):
    # labels already = connected communities (min-vid canonical):
    # refinement must return them bitwise unchanged
    pairs = clique_edges(0, 4) + clique_edges(4, 9) + [(0, 4)]
    lab = [0] * 4 + [4] * 5
    got, info = run_refine(pairs, lab, tmp_path)
    assert np.array_equal(got, np.asarray(lab))
    assert info["n_split"] == 0
    assert info["n_before"] == info["n_after"] == 2


@pytest.mark.parametrize("seed", [0, 5])
@pytest.mark.parametrize("parts", [1, 4])
def test_refine_matches_oracle_random(tmp_path, seed, parts):
    rng = np.random.default_rng(seed)
    n = 80
    m = rng.random((n, n)) < 0.05
    iu = np.triu_indices(n, 1)
    pairs = [(a, b) for a, b in zip(*iu) if m[a, b]]
    # coarse random labeling: plenty of disconnected label classes
    lab = rng.integers(0, 5, size=n).astype(np.int64)
    got, info = run_refine(pairs, lab, tmp_path, parts=parts,
                           job=f"r{seed}p{parts}")
    exp = oracle_refine(n, pairs, lab)
    assert np.array_equal(got, exp), (seed, parts)
    assert info["n_after"] == len(np.unique(exp))
    assert info["n_before"] == len(np.unique(lab))


def test_modularity_non_decreasing(tmp_path):
    from halvesting_geometric_ray.graph.metrics import modularity

    rng = np.random.default_rng(11)
    n = 60
    m = rng.random((n, n)) < 0.06
    iu = np.triu_indices(n, 1)
    pairs = [(a, b) for a, b in zip(*iu) if m[a, b]]
    lab = rng.integers(0, 4, size=n).astype(np.int64)
    got, info = run_refine(pairs, lab, tmp_path, job="q")
    assert info["n_split"] > 0  # the interesting case

    und = _edges_ds(pairs)

    def as_lab(arr):
        return rd.from_pandas(pd.DataFrame(
            {"vid": np.arange(n, dtype=np.int64),
             "label": np.asarray(arr, dtype=np.int64)}))

    q_before, _ = modularity(und, as_lab(lab))
    q_after, _ = modularity(und, as_lab(got))
    # splitting a disconnected community strictly increases Q
    assert q_after > q_before


def test_louvain_leiden_guarantee(tmp_path):
    rng = np.random.default_rng(3)
    n = 70
    # two planted blocks + sparse noise
    pairs = set(clique_edges(0, 12)) | set(clique_edges(40, 52))
    m = rng.random((n, n)) < 0.03
    iu = np.triu_indices(n, 1)
    pairs |= {(a, b) for a, b in zip(*iu) if m[a, b]}
    pairs = sorted(pairs)
    labels, info = louvain_leiden(
        _edges_ds(pairs), _offsets(n), str(tmp_path / "ll"), DEFAULT,
        seed=9)
    got = labels.to_pandas().sort_values("vid")["community"].to_numpy()
    # the guarantee: every community's induced subgraph is connected
    assert np.array_equal(got, oracle_refine(n, pairs, got))
    # refinement of the louvain labels: each refined community sits
    # inside exactly one louvain community
    assert "refine" in info and info["refine"]["n_split"] >= 0
    assert info["refine"]["n_after"] == len(np.unique(got))
    # labels are a valid min-vid-canonical partition
    for rep in np.unique(got):
        members = np.where(got == rep)[0]
        assert members.min() == rep
