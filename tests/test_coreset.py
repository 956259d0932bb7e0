"""facility_location_select vs a sequential greedy oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.coreset import (
    facility_location_select)


def _emb_ds(mat, ids=None):
    ids = np.arange(len(mat)) if ids is None else np.asarray(ids)
    t = pa.table({"vec_id": pa.array(ids.astype(np.int64)),
                  "embedding": pa.array(
                      [list(map(float, r)) for r in mat],
                      type=pa.list_(pa.float32()))})
    return rd.from_arrow(t)


def _seq_greedy(mat, ids, k):
    c = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                         1e-300)
    sims = np.clip(c @ c.T, 0.0, None)
    best = np.zeros(len(ids))
    chosen = []
    gains = []
    avail = set(range(len(ids)))
    for _ in range(k):
        g = np.maximum(sims - best[:, None], 0.0).sum(axis=0)
        cand = sorted(avail, key=lambda j: (-g[j], ids[j]))
        j = cand[0]
        chosen.append(ids[j])
        gains.append(g[j])
        best = np.maximum(best, sims[:, j])
        avail.discard(j)
    return chosen, gains


def test_matches_sequential_greedy():
    rng = np.random.default_rng(3)
    # float32 then back to float64: both paths see identical values
    mat = rng.normal(0, 1, (80, 6)).astype(np.float32).astype(
        np.float64)
    ids = np.arange(100, 180)
    out, info = facility_location_select(_emb_ds(mat, ids), 8)
    exp_ids, exp_gains = _seq_greedy(mat, ids, 8)
    assert list(out.vec_id) == exp_ids
    assert np.allclose(out.gain, np.round(exp_gains, 9), atol=1e-6)
    assert info["k"] == 8 and info["n"] == 80


def test_cluster_coverage():
    # 3 tight clusters: the first 3 picks land in 3 DIFFERENT clusters
    rng = np.random.default_rng(9)
    centers = np.array([[10, 0, 0], [0, 10, 0], [0, 0, 10]],
                       dtype=float)
    mat = np.vstack([c + rng.normal(0, .1, (30, 3)) for c in centers])
    out, _ = facility_location_select(_emb_ds(mat), 3)
    cluster = (out.vec_id // 30).to_numpy()
    assert len(set(cluster)) == 3


def test_stochastic_greedy_layout_invariant():
    rng = np.random.default_rng(21)
    mat = rng.normal(0, 1, (120, 5)).astype(np.float32).astype(
        np.float64)
    a, _ = facility_location_select(_emb_ds(mat), 5,
                                    candidates_per_round=30, seed=2)
    ds_b = _emb_ds(mat).repartition(7)
    b, _ = facility_location_select(ds_b, 5,
                                    candidates_per_round=30, seed=2)
    pd.testing.assert_frame_equal(a, b)


def test_gain_monotone_nonincreasing_and_validation():
    rng = np.random.default_rng(4)
    mat = rng.normal(0, 1, (50, 4))
    out, _ = facility_location_select(_emb_ds(mat), 6)
    g = out.gain.to_numpy()
    assert (np.diff(g) <= 1e-9).all()  # submodularity
    with pytest.raises(ValueError):
        facility_location_select(_emb_ds(mat), 0)


def test_knn_classifier_matches_bruteforce():
    """q_knn_classifier vs a numpy leave-one-out 5-NN majority oracle
    on the sf0.001 fixture (the fixture labels are NOT clustered —
    accuracy is chance; the contract is exact prediction parity)."""
    import pyarrow.parquet as pq

    from halvesting_geometric_ray.queries_text import QUERIES

    out = (QUERIES["q_knn_classifier"]("/root/testdata/sf0.001")
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    ids = np.asarray(t.column("vec_id").to_pylist())
    lab = np.asarray(t.column("label").to_pylist())
    mat = np.asarray([np.asarray(v, dtype=np.float64)
                      for v in t.column("embedding").to_pylist()])
    c = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                         1e-300)
    sims = c @ c.T
    order = np.argsort(ids)
    assert (ids[order] == out.vec_id.to_numpy()).all()
    for row_i, i in enumerate(order):
        s = sims[i].copy()
        s[i] = -np.inf
        top = np.lexsort((ids, -s))[:5]
        votes = {}
        for j in top:
            votes[lab[j]] = votes.get(lab[j], 0) + 1
        pred = sorted(votes, key=lambda l: (-votes[l], l))[0]
        assert out.predicted.iloc[row_i] == pred, ids[i]
    assert out.vec_id.is_unique


def test_degenerate_draw_never_materializes_pool():
    """Craft ids where every salted draw of round 0 is empty: the
    bounded redraws all miss, and the deterministic min-hash last
    resort picks a single candidate — the full pool is never used as
    the candidate set (the old fallback materialized cache.to_pandas()
    and ran an exact-greedy round; that would pick the max-gain
    point instead)."""
    from halvesting_geometric_ray.functions.hashing import stable_hash64

    seed, m, want = 5, 2, 8
    # find `want` ids that miss h % mod == 0 for all 4 attempt salts
    mod = 4  # round(want / m)
    ids = []
    i = 0
    while len(ids) < want:
        ok = True
        for a in range(4):
            h = stable_hash64(pa.array([i], type=pa.int64()),
                              seed=seed + 7919 * a)
            if int(h[0]) % mod == 0:
                ok = False
                break
        if ok:
            ids.append(i)
        i += 1
    ids = np.asarray(ids)
    rng = np.random.default_rng(0)
    mat = rng.normal(0, 1, (want, 4))
    out, info = facility_location_select(
        _emb_ds(mat, ids), 1, candidates_per_round=m, seed=seed)
    assert info["redraws"] == 4  # all bounded attempts were empty
    # last resort = global min-(hash, vid) point, NOT the max-gain
    # point the full-pool fallback would have chosen
    h0 = stable_hash64(pa.array(ids, type=pa.int64()), seed=seed)
    expect = int(ids[np.lexsort((ids, h0))[0]])
    assert list(out.vec_id) == [expect]


def test_redraw_salt_recovers_nonempty_draw():
    """A draw that misses at attempt 0 but hits at a later salt uses
    the redraw, not the last resort."""
    from halvesting_geometric_ray.functions.hashing import stable_hash64

    seed, m, want = 5, 2, 8
    mod = 4
    # ids that all miss attempt 0 but at least one hits attempt 1
    ids, i = [], 0
    hit1 = False
    while len(ids) < want:
        h0 = int(stable_hash64(pa.array([i], type=pa.int64()),
                               seed=seed)[0]) % mod
        h1 = int(stable_hash64(pa.array([i], type=pa.int64()),
                               seed=seed + 7919)[0]) % mod
        if h0 != 0:
            if h1 == 0:
                hit1 = True
                ids.append(i)
            elif len(ids) < want - 1:
                ids.append(i)
        i += 1
    assert hit1
    ids = np.asarray(sorted(ids))
    rng = np.random.default_rng(1)
    mat = rng.normal(0, 1, (want, 4))
    out, info = facility_location_select(
        _emb_ds(mat, ids), 1, candidates_per_round=m, seed=seed)
    assert 1 <= info["redraws"] <= 3
    assert len(out) == 1
