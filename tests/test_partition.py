"""Batch-synchronous LDG partitioner vs a sequential spec oracle.

The spec (graph/partition.py docstring) fully determines the
assignment from (adjacency, offsets, chunk, k, eps); the oracle below
replays it with plain Python dict/list scans — an independent
implementation of the SAME spec, so equality is bitwise.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.config import EngineConfig
from halvesting_geometric_ray.graph.partition import (ldg_partition,
                                                      waterfill_assign)


def _sym_pairs(src, dst):
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    m = s != d
    pairs = np.unique(np.stack([s[m], d[m]], axis=1), axis=0)
    return pairs


def ldg_oracle(n, pairs, k, eps, chunk, offsets):
    """Sequential replay of the batch-synchronous spec (chunks respect
    partition boundaries, exactly like the engine's per-shard walk)."""
    adj = [[] for _ in range(n)]
    for a, b in pairs:
        adj[a].append(b)
    cap = int(np.ceil((1.0 + eps) * n / k)) if n else 0
    block = [-1] * n
    sizes = [0] * k
    bounds = []
    for p in range(len(offsets) - 1):
        for lo in range(int(offsets[p]), int(offsets[p + 1]), chunk):
            bounds.append((lo, min(lo + chunk, int(offsets[p + 1]))))
    for lo, hi in bounds:
        frozen_sizes = list(sizes)
        frozen_block = list(block)
        # per-vertex claims resolved by waterfilling
        members = list(range(lo, hi))
        scores = {}
        prefs = {}
        for u in members:
            cnt = [0] * k
            for v in adj[u]:
                if frozen_block[v] >= 0:
                    cnt[frozen_block[v]] += 1
            sc = [cnt[i] * (1.0 - frozen_sizes[i] / cap) for i in range(k)]
            scores[u] = sc
            prefs[u] = sorted(range(k),
                              key=lambda i: (-sc[i], frozen_sizes[i], i))
        remaining = [cap - s for s in frozen_sizes]
        choice = {u: 0 for u in members}
        live = list(members)
        for _ in range(k):
            if not live:
                break
            claims = {}
            for u in live:
                claims.setdefault(prefs[u][choice[u]], []).append(u)
            next_live = []
            for b in sorted(claims):
                us = claims[b]
                if remaining[b] <= 0:
                    for u in us:
                        choice[u] += 1
                    next_live.extend(us)
                    continue
                if len(us) <= remaining[b]:
                    for u in us:
                        block[u] = b
                        sizes[b] += 1
                    remaining[b] -= len(us)
                    continue
                ranked = sorted(us, key=lambda u: (-scores[u][b], u))
                for u in ranked[: remaining[b]]:
                    block[u] = b
                    sizes[b] += 1
                for u in ranked[remaining[b]:]:
                    choice[u] += 1
                    next_live.append(u)
                remaining[b] = 0
            live = next_live
        assert not live
    return np.array(block), np.array(sizes)


def _run(n, pairs, tmp, tag, k, eps=0.1, chunk=16, num_parts=4,
         num_actors=0):
    edges = rd.from_pandas(pd.DataFrame(
        {"src": pairs[:, 0], "dst": pairs[:, 1]}))
    offsets = np.unique(np.linspace(0, n, num_parts + 1).astype(np.int64))
    ds, info = ldg_partition(edges, offsets, str(tmp / tag),
                             EngineConfig(num_parts=len(offsets) - 1),
                             k=k, eps=eps, chunk=chunk,
                             num_actors=num_actors)
    got = ds.to_pandas().sort_values("vid").reset_index(drop=True)
    assert len(got) == n
    return got, info


def _random_graph(seed, n, m):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, size=m)
    dst = rng.integers(0, n, size=m)
    return _sym_pairs(src.astype(np.int64), dst.astype(np.int64))


def test_waterfill_respects_cap_and_priority():
    # 3 blocks, cap leaves room for 1 in block 0; two vertices want it
    scores = np.array([[5.0, 1.0, 0.0],
                       [4.0, 3.0, 0.0],
                       [0.0, 0.0, 0.0]])
    frozen = np.array([9, 0, 0], dtype=np.int64)
    got = waterfill_assign(scores, np.array([7, 8, 9]), frozen, cap=10)
    # vid 7 outranks vid 8 on block 0 (higher score); 8 spills to its
    # next choice (block 1); the zero-score vertex prefers the
    # smallest frozen block among ties (1 vs 2 tie -> lower id wins,
    # but block 1 now holds 8? frozen sizes are what tie-break)
    assert got.tolist() == [0, 1, 1]


def test_matches_sequential_oracle_random():
    pairs = _random_graph(5, 90, 300)
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        from pathlib import Path

        got, info = _run(90, pairs, Path(tmp), "a", k=4, chunk=16)
    off = np.unique(np.linspace(0, 90, 5).astype(np.int64))
    want_block, want_sizes = ldg_oracle(90, pairs, k=4, eps=0.1, chunk=16,
                                        offsets=off)
    assert got.block.to_numpy().tolist() == want_block.tolist()
    assert info["sizes"] == want_sizes.tolist()
    assert max(info["sizes"]) <= info["cap"]


def test_matches_oracle_other_params(tmp_path):
    pairs = _random_graph(11, 140, 500)
    got, info = _run(140, pairs, tmp_path, "b", k=7, eps=0.25, chunk=32,
                     num_parts=5)
    off = np.unique(np.linspace(0, 140, 6).astype(np.int64))
    want_block, want_sizes = ldg_oracle(140, pairs, k=7, eps=0.25,
                                        chunk=32, offsets=off)
    assert got.block.to_numpy().tolist() == want_block.tolist()
    assert max(info["sizes"]) <= info["cap"]


def test_actor_layout_invariance(tmp_path):
    pairs = _random_graph(3, 120, 420)
    outs = []
    for na, tag in ((1, "c1"), (3, "c3")):
        got, _ = _run(120, pairs, tmp_path, tag, k=4, chunk=16,
                      num_parts=6, num_actors=na)
        outs.append(got.block.to_numpy())
    assert (outs[0] == outs[1]).all()


def test_beats_random_hash_on_planted_communities(tmp_path):
    """4 planted communities (dense intra, sparse inter): the LDG cut
    must be far under the random-hash expectation of ~3/4."""
    rng = np.random.default_rng(42)
    n, per = 400, 100
    src, dst = [], []
    for c in range(4):
        base = c * per
        for _ in range(per * 8):
            a, b = rng.integers(0, per, 2)
            src.append(base + a)
            dst.append(base + b)
    for _ in range(80):  # sparse inter-community noise
        a, b = rng.integers(0, n, 2)
        src.append(a)
        dst.append(b)
    pairs = _sym_pairs(np.array(src, dtype=np.int64),
                       np.array(dst, dtype=np.int64))
    got, info = _run(n, pairs, tmp_path, "plant", k=4, chunk=50,
                     num_parts=4)
    blk = np.full(n, -1, dtype=np.int64)
    blk[got.vid.to_numpy()] = got.block.to_numpy()
    cut = (blk[pairs[:, 0]] != blk[pairs[:, 1]]).mean()
    rand = (pairs[:, 0] % 4 != pairs[:, 1] % 4).mean()
    assert max(info["sizes"]) <= info["cap"]
    assert cut < 0.5 * rand, (cut, rand)


def test_balance_under_adversarial_star(tmp_path):
    """A giant star: greedy wants every leaf beside the hub; the cap
    must force spreading while keeping the result exact vs oracle."""
    n = 150
    hub_edges = np.array([[0, i] for i in range(1, n)], dtype=np.int64)
    pairs = _sym_pairs(hub_edges[:, 0], hub_edges[:, 1])
    got, info = _run(n, pairs, tmp_path, "star", k=3, eps=0.0, chunk=8,
                     num_parts=3)
    off = np.unique(np.linspace(0, n, 4).astype(np.int64))
    want_block, _ = ldg_oracle(n, pairs, k=3, eps=0.0, chunk=8,
                               offsets=off)
    assert got.block.to_numpy().tolist() == want_block.tolist()
    assert max(info["sizes"]) <= info["cap"] == 50


def test_relabel_by_blocks_roundtrip(tmp_path):
    """Relabel is a bijection onto 0..N-1, blocks become contiguous
    vid ranges, and the new-offsets edge cut EQUALS the LDG cut."""
    import ray.data as rd

    from halvesting_geometric_ray.graph.metrics import edge_cut_report
    from halvesting_geometric_ray.graph.partition import (
        partition_cut, relabel_by_blocks)

    n, k = 130, 5
    pairs = _random_graph(17, n, 420)
    edges = rd.from_pandas(pd.DataFrame(
        {"src": pairs[:, 0], "dst": pairs[:, 1]}))
    verts = rd.from_pandas(pd.DataFrame(
        {"url": [f"u{v}" for v in range(n)],
         "vid": np.arange(n, dtype=np.int64)}))
    offsets = np.unique(np.linspace(0, n, 5).astype(np.int64))
    blocks, info = ldg_partition(edges, offsets, str(tmp_path / "r"),
                                 EngineConfig(num_parts=4), k=k,
                                 chunk=16)
    blocks = blocks.materialize()
    cut0 = partition_cut(edges, blocks, num_parts=4)

    v2, e2, off2 = relabel_by_blocks(verts, edges, blocks, k,
                                     num_parts=4)
    v2p = v2.to_pandas().sort_values("vid").reset_index(drop=True)
    # bijection onto 0..N-1
    assert v2p.vid.tolist() == list(range(n))
    # block sizes become the offsets
    assert off2.tolist() == np.concatenate(
        [[0], np.cumsum(info["sizes"])]).tolist()
    # the physical-layout cut now equals the LDG cut
    rep = edge_cut_report(e2, off2)
    assert rep["n_cut"] == cut0["n_cut"]
    assert rep["n_edges"] == cut0["n_edges"]
    # old->new preserves adjacency: same multiset of (url_src, url_dst)
    old_urls = dict(zip(range(n), [f"u{v}" for v in range(n)]))
    new_urls = dict(zip(v2p.vid, v2p.url))
    e2p = e2.to_pandas()
    got = sorted((new_urls[s], new_urls[d])
                 for s, d in zip(e2p.src, e2p.dst))
    want = sorted((old_urls[s], old_urls[d]) for s, d in pairs)
    assert got == want


def test_relabel_pagerank_permutation_invariance(tmp_path):
    """PageRank on the relabeled graph = the permuted PageRank of the
    original (per-url rank equality) — the layout changes the
    exchange pattern, never the math."""
    import ray.data as rd

    from halvesting_geometric_ray.graph.pagerank import pagerank
    from halvesting_geometric_ray.graph.partition import relabel_by_blocks

    n, k = 90, 4
    pairs = _random_graph(29, n, 260)
    edges = rd.from_pandas(pd.DataFrame(
        {"src": pairs[:, 0], "dst": pairs[:, 1]}))
    verts = rd.from_pandas(pd.DataFrame(
        {"url": [f"u{v}" for v in range(n)],
         "vid": np.arange(n, dtype=np.int64)}))
    offsets = np.unique(np.linspace(0, n, 4).astype(np.int64))
    blocks, _ = ldg_partition(edges, offsets, str(tmp_path / "p"),
                              EngineConfig(num_parts=3), k=k, chunk=16)
    blocks = blocks.materialize()
    v2, e2, off2 = relabel_by_blocks(verts, edges, blocks, k,
                                     num_parts=4)

    r1, _ = pagerank(edges, offsets, str(tmp_path / "pr1"),
                     resume=False)
    r2, _ = pagerank(e2.materialize(), off2, str(tmp_path / "pr2"),
                     resume=False)
    p1 = r1.to_pandas()
    p2 = r2.to_pandas()
    v2p = v2.to_pandas()
    old = dict(zip(p1.vid, p1["rank"]))
    new_by_vid = dict(zip(p2.vid, p2["rank"]))
    new2old = dict(zip(v2p.url, v2p.vid))
    for u, old_vid in ((f"u{v}", v) for v in range(n)):
        assert abs(old[old_vid] - new_by_vid[new2old[u]]) < 1e-9
