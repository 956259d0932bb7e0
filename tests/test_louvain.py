"""Louvain: pure-Python phase-1 replay oracle, planted-structure
recovery, layout invariance, m2 conservation, modularity fitness."""

import collections

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.louvain import _phase1, louvain
from halvesting_geometric_ray.graph.mis import round_priority
from halvesting_geometric_ray.config import DEFAULT


def clique_edges(lo, hi):
    vv = range(lo, hi)
    return [(a, b) for a in vv for b in vv if a < b]


def sym_arrays(pairs):
    """Directed both-ways representation with unit weights."""
    src = np.array([a for a, b in pairs] + [b for a, b in pairs],
                   dtype=np.int64)
    dst = np.array([b for a, b in pairs] + [a for a, b in pairs],
                   dtype=np.int64)
    return src, dst, np.ones(src.size, dtype=np.float64)


def phase1_replay(n, src, dst, w, *, seed=42, resolution=1.0,
                  gain_eps=1e-9, max_subrounds=32):
    """Sequential mirror of the distributed phase 1: same hash
    activation, same gain formula, same tie-breaks, same BSP semantics
    (all decisions read sub-round-start state; Sigma_tot deltas apply
    after the round)."""
    k = np.bincount(src, weights=w, minlength=n)
    m2 = k.sum()
    c = np.arange(n, dtype=np.int64)
    ctot = k.copy()
    hist = []
    for t in range(max_subrounds if m2 > 0 else 0):
        act = (round_priority(dst, t, seed) & np.uint64(1)) == 0
        cand = collections.defaultdict(float)
        for s_, d_ in zip(src[act], dst[act]):
            cand[(d_, c[s_])] += 1.0
        per_v = collections.defaultdict(list)
        for (v, C), wv in cand.items():
            per_v[v].append((C, wv))
        decisions = []
        for v, lst in per_v.items():
            kv = k[v]
            stay = None
            best = None
            for C, wv in lst:
                if C == c[v]:
                    stay = wv - resolution * kv * (ctot[C] - kv) / m2
                else:
                    s = wv - resolution * kv * ctot[C] / m2
                    if best is None or s > best[0] or \
                            (s == best[0] and C < best[1]):
                        best = (s, C)
            if stay is None:
                stay = -resolution * kv * (ctot[c[v]] - kv) / m2
            if best is not None and best[0] > stay + gain_eps:
                decisions.append((v, c[v], best[1]))
        for v, old, new in decisions:
            c[v] = new
            ctot[old] -= k[v]
            ctot[new] += k[v]
        hist.append(len(decisions))
        if len(hist) >= 3 and sum(hist[-3:]) == 0:
            break
    return c


def _edges_ds(pairs, weights=None):
    """Canonical one-direction edge table — louvain symmetrizes."""
    df = {"src": np.array([a for a, b in pairs], dtype=np.int64),
          "dst": np.array([b for a, b in pairs], dtype=np.int64)}
    if weights is not None:
        df["w"] = np.asarray(weights, dtype=np.float64)
    return rd.from_pandas(pd.DataFrame(df))


def _sym_ds(pairs):
    """Both-direction weighted table — _phase1's expected input."""
    src, dst, w = sym_arrays(pairs)
    return rd.from_pandas(pd.DataFrame({"src": src, "dst": dst, "w": w}))


def _offsets(n, parts=1):
    if parts == 1:
        return np.array([0, n], dtype=np.int64)
    return np.unique(np.linspace(0, n, parts + 1).astype(np.int64))


@pytest.mark.parametrize("seed", [0, 3])
@pytest.mark.parametrize("parts,actors", [(1, 0), (4, 3)])
def test_phase1_matches_replay(tmp_path, seed, parts, actors):
    rng = np.random.default_rng(seed)
    n = 60
    m = rng.random((n, n)) < 0.08
    m |= m.T
    np.fill_diagonal(m, False)
    iu = np.triu_indices(n, 1)
    pairs = [(a, b) for a, b in zip(*iu) if m[a, b]]
    src, dst, w = sym_arrays(pairs)
    exp = phase1_replay(n, src, dst, w, seed=7)
    ds, moves, moves_hist, m2, _descs = _phase1(
        _sym_ds(pairs), _offsets(n, parts),
        str(tmp_path / f"p{parts}s{seed}"), 0, DEFAULT,
        resolution=1.0, gain_eps=1e-9, max_subrounds=32,
        num_actors=actors, seed=7)
    got = ds.to_pandas().sort_values("vid").label.to_numpy()
    assert np.array_equal(got, exp), (parts, actors)
    assert m2 == w.sum()


def test_two_cliques(tmp_path):
    pairs = clique_edges(0, 5) + clique_edges(5, 10) + [(4, 5)]
    ds, info = louvain(_edges_ds(pairs), _offsets(10),
                       str(tmp_path / "c2"))
    df = ds.to_pandas().sort_values("vid")
    assert df.community.tolist() == [0] * 5 + [5] * 5
    # m2 conserved across every level
    assert len({lv["m2"] for lv in info["levels"]}) == 1
    assert info["n_communities"] == 2


def test_ring_of_cliques(tmp_path):
    # 6 cliques of 5, ring-connected: each clique is one community
    pairs = []
    for i in range(6):
        pairs += clique_edges(5 * i, 5 * i + 5)
        pairs.append((5 * i + 4, (5 * i + 5) % 30))
    ds, info = louvain(_edges_ds(pairs), _offsets(30, 4),
                       str(tmp_path / "ring"))
    df = ds.to_pandas().sort_values("vid")
    groups = df.groupby("community").vid.apply(
        lambda s: tuple(sorted(s))).tolist()
    assert sorted(groups) == [tuple(range(5 * i, 5 * i + 5))
                              for i in range(6)]
    assert len({lv["m2"] for lv in info["levels"]}) == 1


def test_layout_invariance(tmp_path):
    rng = np.random.default_rng(11)
    # planted partition: 4 groups of 10, dense in, sparse out
    n, g = 40, 10
    pairs = []
    for i in range(4):
        for a in range(g * i, g * i + g):
            for b in range(a + 1, g * i + g):
                if rng.random() < 0.7:
                    pairs.append((a, b))
    for _ in range(12):
        a, b = rng.integers(0, n, 2)
        if a // g != b // g:
            pairs.append((int(min(a, b)), int(max(a, b))))
    pairs = sorted(set(pairs))
    outs = []
    for parts, actors in ((1, 0), (4, 2), (6, 6)):
        ds, _ = louvain(_edges_ds(pairs), _offsets(n, parts),
                        str(tmp_path / f"li{parts}_{actors}"),
                        num_actors=actors)
        outs.append(ds.to_pandas().sort_values("vid")
                    .reset_index(drop=True))
    assert outs[0].equals(outs[1])
    assert outs[0].equals(outs[2])


def test_planted_partition_quality(tmp_path):
    rng = np.random.default_rng(5)
    n, g = 48, 12
    pairs = set()
    for i in range(4):
        for a in range(g * i, g * i + g):
            for b in range(a + 1, g * i + g):
                if rng.random() < 0.6:
                    pairs.add((a, b))
    for _ in range(20):
        a, b = sorted(rng.integers(0, n, 2).tolist())
        if a // g != b // g:
            pairs.add((a, b))
    pairs = sorted(pairs)
    ds, info = louvain(_edges_ds(pairs), _offsets(n, 3),
                       str(tmp_path / "pp"))
    df = ds.to_pandas().sort_values("vid")
    # exact planted recovery
    for i in range(4):
        blk = df[df.vid // g == i].community
        assert blk.nunique() == 1, i
    assert df.community.nunique() == 4
    # fitness: Q positive and substantial on the canonical edge list
    from halvesting_geometric_ray.graph.metrics import modularity

    e = rd.from_pandas(pd.DataFrame(
        {"src": np.array([a for a, b in pairs], dtype=np.int64),
         "dst": np.array([b for a, b in pairs], dtype=np.int64)}))
    labels = rd.from_pandas(
        df.rename(columns={"community": "label"})[["vid", "label"]])
    q, _ = modularity(e, labels)
    assert q > 0.45


def test_contraction_regimes_agree(tmp_path):
    """small_edge_cap=0 forces the distributed contraction on every
    level; the output must be IDENTICAL to the small-regime run —
    certifies that _dense_ids_np mints the same community ids as
    assign_dense_ids_hash (the gate must never change results)."""
    pairs = []
    for i in range(6):
        pairs += clique_edges(5 * i, 5 * i + 5)
        pairs.append((5 * i + 4, (5 * i + 5) % 30))
    a, _ = louvain(_edges_ds(pairs), _offsets(30, 4),
                   str(tmp_path / "small"))
    b, info_b = louvain(_edges_ds(pairs), _offsets(30, 4),
                        str(tmp_path / "big"), small_edge_cap=0)
    assert all(lv.get("contract") in (None, "distributed")
               for lv in info_b["levels"])
    pa_ = a.to_pandas().sort_values("vid").reset_index(drop=True)
    pb_ = b.to_pandas().sort_values("vid").reset_index(drop=True)
    assert pa_.equals(pb_)


def test_mirror_owner_parity(tmp_path):
    """mirror_cap=0 forces the 4-barrier owner request-answer protocol
    on every level; default runs the fused 2-barrier mirrored-Sigma_tot
    mode.  Labels must be IDENTICAL (the fusion may never change a move
    decision) across a multi-part, multi-actor layout."""
    rng = np.random.default_rng(7)
    n = 400
    src = rng.integers(0, n, 3000)
    dst = rng.integers(0, n, 3000)
    keep = src != dst
    pairs = list(zip(src[keep].tolist(), dst[keep].tolist()))
    pairs += clique_edges(0, 8) + clique_edges(100, 108)
    ds = _edges_ds(pairs)
    a, info_a = louvain(ds, _offsets(n, 4), str(tmp_path / "mirror"),
                        num_actors=3)
    b, info_b = louvain(ds, _offsets(n, 4), str(tmp_path / "owner"),
                        num_actors=3, mirror_cap=0)
    pa_ = a.to_pandas().sort_values("vid").reset_index(drop=True)
    pb_ = b.to_pandas().sort_values("vid").reset_index(drop=True)
    assert pa_.equals(pb_)
    assert [lv["moves_hist"] for lv in info_a["levels"]] == \
        [lv["moves_hist"] for lv in info_b["levels"]]


def _rand_pairs(seed=11, n=300, m=2200):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    return list(zip(src[keep].tolist(), dst[keep].tolist())) \
        + clique_edges(0, 7) + clique_edges(200, 207)


def test_checkpoint_does_not_perturb(tmp_path):
    """Checkpointing ON must be bitwise-transparent: flushing deltas at
    dump points applies the same messages in the same order the next
    scatter would."""
    pairs = _rand_pairs()
    a, ia = louvain(_edges_ds(pairs), _offsets(300, 4),
                    str(tmp_path / "plain"), num_actors=3)
    b, ib = louvain(_edges_ds(pairs), _offsets(300, 4),
                    str(tmp_path / "ck"), num_actors=3,
                    checkpoint=True, ckpt_every=2)
    assert a.to_pandas().sort_values("vid").reset_index(drop=True).equals(
        b.to_pandas().sort_values("vid").reset_index(drop=True))
    assert [lv["moves_hist"] for lv in ia["levels"]] == \
        [lv["moves_hist"] for lv in ib["levels"]]


@pytest.mark.parametrize("mirror_cap", [8_000_000, 0])
def test_phase1_crash_resume_bitwise(tmp_path, mirror_cap):
    """Kill the phase right after a mid-run checkpoint commit; the
    rerun must resume from that sub-round and finish with labels
    bitwise equal to the uninterrupted run — in both the mirrored and
    the owner Sigma_tot protocols."""
    pairs = _rand_pairs(seed=5)
    ds = _sym_ds(pairs)
    off = _offsets(300, 4)
    kw = dict(resolution=1.0, gain_eps=1e-9, max_subrounds=16,
              num_actors=3, seed=42, mirror_cap=mirror_cap)
    ref_labels, ref_moves, ref_hist, ref_m2, _ = _phase1(
        ds, off, str(tmp_path / "ref"), 0, DEFAULT, **kw)

    wd = str(tmp_path / "crash")
    with pytest.raises(RuntimeError, match="test-injected"):
        _phase1(ds, off, wd, 0, DEFAULT, checkpoint=True, ckpt_every=3,
                _fail_after_commit=3, **kw)
    got_labels, got_moves, got_hist, got_m2, _ = _phase1(
        ds, off, wd, 0, DEFAULT, checkpoint=True, ckpt_every=3, **kw)
    assert got_hist == ref_hist and got_moves == ref_moves
    assert got_m2 == ref_m2
    assert ref_labels.to_pandas().sort_values("vid").reset_index(
        drop=True).equals(got_labels.to_pandas().sort_values(
            "vid").reset_index(drop=True))

    # third run: the done marker loads the finished phase actor-free
    again, again_moves, again_hist, _, _ = _phase1(
        ds, off, wd, 0, DEFAULT, checkpoint=True, ckpt_every=3, **kw)
    assert again_hist == ref_hist and again_moves == ref_moves
    assert again.to_pandas().sort_values("vid").reset_index(
        drop=True).equals(got_labels.to_pandas().sort_values(
            "vid").reset_index(drop=True))


def test_weighted_communities(tmp_path):
    # path 0-1-2-3 where (0,1) and (2,3) are heavy, (1,2) light:
    # weights decide the split
    pairs = [(0, 1), (1, 2), (2, 3)]
    w = np.array([10.0, 1.0, 10.0])
    ds, _ = louvain(_edges_ds(pairs, weights=w), _offsets(4),
                    str(tmp_path / "w"), weight_col="w")
    df = ds.to_pandas().sort_values("vid")
    assert df.community.tolist() == [0, 0, 2, 2]


def test_edgeless_and_empty(tmp_path):
    empty = rd.from_pandas(pd.DataFrame(
        {"src": pd.Series([], dtype="int64"),
         "dst": pd.Series([], dtype="int64")}))
    ds, info = louvain(empty, _offsets(5), str(tmp_path / "e5"))
    df = ds.to_pandas().sort_values("vid")
    assert df.community.tolist() == [0, 1, 2, 3, 4]
    ds0, _ = louvain(empty, np.array([0], dtype=np.int64),
                     str(tmp_path / "e0"))
    assert ds0.to_pandas().empty


def test_beats_label_propagation_on_fixture(tmp_path):
    """End-to-end quality: Louvain's modularity on the real link-graph
    fixture far exceeds label propagation's (deterministic fixture +
    deterministic algorithms -> pinned with margin)."""
    from halvesting_geometric_ray.fixtures import ensure_pages_parquet
    from halvesting_geometric_ray.graph.build import (build_graph,
                                                      read_layer,
                                                      symmetrize)
    from halvesting_geometric_ray.graph.labelprop import label_propagation
    from halvesting_geometric_ray.graph.metrics import modularity
    from halvesting_geometric_ray.ops.dedup import distinct
    import pyarrow as pa

    g = build_graph(ensure_pages_parquet(300, 11), str(tmp_path / "g"))

    def canon(b):
        s = b.column("src").to_numpy()
        d = b.column("dst").to_numpy()
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"src": pa.array(np.minimum(s, d)),
                         "dst": pa.array(np.maximum(s, d))})

    und = distinct(read_layer(g.edges).map_batches(
        canon, batch_format="pyarrow", zero_copy_batch=True),
        ["src", "dst"]).materialize()
    lv, _ = louvain(read_layer(g.edges), g.offsets, str(tmp_path / "lv"))
    lv_lab = lv.map_batches(
        lambda b: pa.table({"vid": b.column("vid"),
                            "label": b.column("community")}),
        batch_format="pyarrow", zero_copy_batch=True)
    q_lv, _ = modularity(und, lv_lab)
    lp, _ = label_propagation(
        symmetrize(read_layer(g.edges), drop_self_loops=True,
                   dedup=False),
        g.offsets, str(tmp_path / "lp"), rounds=5)
    q_lp, _ = modularity(und, lp.select_columns(["vid", "label"]))
    assert q_lv > 0.35          # measured 0.400
    assert q_lv > q_lp + 0.2    # measured 0.094
