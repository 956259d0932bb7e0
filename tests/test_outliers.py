"""Isolation forest + MMR vs sequential replay oracles."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.outliers import (
    _c_factor, isolation_forest_scores, isolation_forest_train,
    mmr_diversify)


def _emb_ds(mat, ids=None):
    ids = np.arange(len(mat)) if ids is None else ids
    import pyarrow as pa

    t = pa.table({"vec_id": pa.array(ids.astype(np.int64)),
                  "embedding": pa.array([list(map(float, r)) for r in mat],
                                        type=pa.list_(pa.float32()))})
    return rd.from_arrow(t)


def _seq_score(x, trees, cn):
    """Sequential reference traversal."""
    total = 0.0
    for feat, thr, left, right, adjust in trees:
        nd = 0
        while feat[nd] >= 0:
            nd = left[nd] if x[feat[nd]] < thr[nd] else right[nd]
        total += adjust[nd]
    return 2.0 ** (-(total / len(trees)) / cn)


def test_scores_match_sequential_replay():
    rng = np.random.default_rng(2)
    mat = rng.normal(0, 1, (400, 8))
    ds = _emb_ds(mat)
    ref, info = isolation_forest_train(ds, n_trees=16, sample_size=64,
                                       seed=3)
    out = (isolation_forest_scores(ds, ref, round_to=12).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    import ray

    trees, cn, _d = ray.get(ref)
    for i in range(0, 400, 37):
        exp = _seq_score(mat[i], trees, cn)
        assert out.iso_score[i] == pytest.approx(exp, abs=1e-10)


def test_planted_outlier_scores_highest():
    rng = np.random.default_rng(5)
    mat = rng.normal(0, 0.5, (300, 6))
    mat[17] = 25.0  # far-out point
    ds = _emb_ds(mat)
    ref, _ = isolation_forest_train(ds, n_trees=64, sample_size=128,
                                    seed=11)
    out = isolation_forest_scores(ds, ref).to_pandas()
    top = out.sort_values("iso_score", ascending=False).vec_id.iloc[0]
    assert top == 17
    assert out.iso_score.max() > 0.6  # clearly anomalous regime


def test_layout_invariance():
    rng = np.random.default_rng(9)
    mat = rng.normal(0, 1, (200, 5))
    a_ds = _emb_ds(mat)
    b_ds = _emb_ds(mat).repartition(7)
    ra, _ = isolation_forest_train(a_ds, n_trees=8, sample_size=32,
                                   seed=1)
    rb, _ = isolation_forest_train(b_ds, n_trees=8, sample_size=32,
                                   seed=1)
    a = (isolation_forest_scores(a_ds, ra).to_pandas()
         .sort_values("vec_id").reset_index(drop=True))
    b = (isolation_forest_scores(b_ds, rb).to_pandas()
         .sort_values("vec_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_c_factor_and_validation():
    assert _c_factor(1) == 0.0
    assert _c_factor(2) > 0
    with pytest.raises(ValueError):
        isolation_forest_train(_emb_ds(np.zeros((4, 2))), n_trees=0)


def _seq_mmr(q, ids, mat, k, lam):
    qn = q / (np.linalg.norm(q) or 1.0)
    c = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                         1e-300)
    rel = c @ qn
    sel, active = [], list(range(len(ids)))
    max_sim = np.full(len(ids), -np.inf)
    for step in range(min(k, len(ids))):
        best, best_v = None, -np.inf
        for i in sorted(active, key=lambda j: ids[j]):
            v = lam * rel[i] if step == 0 else \
                lam * rel[i] - (1 - lam) * max_sim[i]
            if v > best_v:
                best, best_v = i, v
        sel.append(best)
        active.remove(best)
        max_sim = np.maximum(max_sim, c @ c[best])
    return ids[sel]


def test_mmr_matches_greedy_reference():
    rng = np.random.default_rng(4)
    mat = rng.normal(0, 1, (30, 6))
    ids = np.arange(100, 130)
    q = rng.normal(0, 1, 6)
    sel, scores = mmr_diversify(q, ids, mat, k=8, lam=0.6)
    exp = _seq_mmr(q, ids, mat, 8, 0.6)
    assert list(sel) == list(exp)
    assert len(scores) == 8 and scores[0] >= scores[1] - 1e-12


def test_mmr_prefers_diversity():
    # two tight clusters; with lam=0.5 the 2nd pick jumps clusters
    a = np.tile([1.0, 0.0], (5, 1)) + 1e-3
    b = np.tile([0.0, 1.0], (5, 1))
    mat = np.vstack([a, b])
    ids = np.arange(10)
    q = np.array([1.0, 0.5])
    sel, _ = mmr_diversify(q, ids, mat, k=2, lam=0.5)
    assert sel[0] < 5 and sel[1] >= 5
    with pytest.raises(ValueError):
        mmr_diversify(q, ids, mat, lam=1.5)
