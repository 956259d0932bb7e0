"""ACL PPR push: fixpoint parity vs the pagerank engine, l1 invariant,
locality bound, sweep-cut community recovery."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.pprpush import local_cluster, ppr_push


def _edges_ds(pairs, both=False):
    src = [a for a, b in pairs] + ([b for a, b in pairs] if both else [])
    dst = [b for a, b in pairs] + ([a for a, b in pairs] if both else [])
    return rd.from_pandas(pd.DataFrame(
        {"src": np.array(src, dtype=np.int64),
         "dst": np.array(dst, dtype=np.int64)}))


def clique(lo, hi):
    vv = range(lo, hi)
    return [(a, b) for a in vv for b in vv if a < b]


def test_fixpoint_matches_pagerank(tmp_path):
    # dangling-free strongly-connected-ish graph: push with tiny eps
    # must reach pagerank(seeds=..., damping = 1 - alpha)
    rng = np.random.default_rng(0)
    n = 60
    m = rng.random((n, n)) < 0.1
    np.fill_diagonal(m, False)
    # ensure no dangling: add a cycle
    src, dst = np.nonzero(m)
    src = np.concatenate([src, np.arange(n)])
    dst = np.concatenate([dst, (np.arange(n) + 1) % n])
    edges = rd.from_pandas(pd.DataFrame(
        {"src": src.astype(np.int64), "dst": dst.astype(np.int64)}))
    offsets = np.array([0, n], dtype=np.int64)
    alpha = 0.15
    sup, info = ppr_push(edges, offsets, str(tmp_path / "fx"),
                         np.array([3], dtype=np.int64),
                         alpha=alpha, eps=1e-12, max_rounds=3000)
    sdf = sup.to_pandas().set_index("vid")
    assert sdf.r.abs().sum() < 1e-9  # residual drained
    assert np.isclose(sdf.p.sum(), 1.0, atol=1e-9)

    from halvesting_geometric_ray.graph.pagerank import pagerank

    pr, _ = pagerank(edges, offsets, str(tmp_path / "pr"),
                     damping=1 - alpha, tol=1e-13,
                     seeds=np.array([3], dtype=np.int64))
    prdf = pr.to_pandas().set_index("vid")
    joined = sdf.join(prdf[["rank"]], how="outer").fillna(0.0)
    assert np.allclose(joined.p, joined["rank"], atol=1e-8)


def test_l1_invariant_and_locality(tmp_path):
    # long path graph; seed in the middle: support stays local
    n = 2000
    pairs = [(i, i + 1) for i in range(n - 1)]
    edges = _edges_ds(pairs, both=True)
    offsets = np.unique(np.linspace(0, n, 5).astype(np.int64))
    sup, info = ppr_push(edges, offsets, str(tmp_path / "loc"),
                         np.array([1000], dtype=np.int64),
                         alpha=0.2, eps=1e-4)
    sdf = sup.to_pandas()
    assert np.isclose(sdf.p.sum() + sdf.r.sum(), 1.0, atol=1e-12)
    assert (sdf.r.to_numpy() <= 1e-4 * np.maximum(
        sdf.outdeg.to_numpy(), 1) + 1e-15).all()
    # ACL bound: total pushes <= 1 / (alpha * eps); support far below n
    assert info["total_pushes"] <= 1 / (0.2 * 1e-4) + 1
    assert len(sdf) < n / 4


@pytest.mark.parametrize("parts", [1, 4])
def test_sweep_recovers_clique(tmp_path, parts):
    # two 8-cliques + bridge; seed inside clique A -> sweep = clique A
    pairs = clique(0, 8) + clique(8, 16) + [(7, 8)]
    edges = _edges_ds(pairs, both=True)
    n = 16
    offsets = (np.array([0, n], dtype=np.int64) if parts == 1 else
               np.unique(np.linspace(0, n, parts + 1).astype(np.int64)))
    members, phi, info = local_cluster(
        edges, offsets, str(tmp_path / f"sw{parts}"), seed_vid=2,
        alpha=0.15, eps=1e-7)
    assert members.tolist() == list(range(8)), parts
    # conductance of clique A: cut 1 (the bridge), vol 8*7+1 = 57
    assert np.isclose(phi, 1 / 57), phi


def test_validation(tmp_path):
    edges = _edges_ds([(0, 1)])
    off = np.array([0, 2], dtype=np.int64)
    with pytest.raises(ValueError, match="non-empty"):
        ppr_push(edges, off, str(tmp_path / "v"), np.array([]))
    with pytest.raises(ValueError, match="alpha"):
        ppr_push(edges, off, str(tmp_path / "v2"),
                 np.array([0]), alpha=1.5)
