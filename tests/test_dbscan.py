"""dbscan_cosine vs a brute-force DBSCAN oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.clustering import dbscan_cosine


def _emb_ds(mat, ids=None):
    ids = np.arange(len(mat)) if ids is None else np.asarray(ids)
    t = pa.table({"vec_id": pa.array(ids.astype(np.int64)),
                  "embedding": pa.array(
                      [list(map(float, r)) for r in mat],
                      type=pa.list_(pa.float32()))})
    return rd.from_arrow(t)


def _brute_dbscan(mat, ids, thr, min_pts):
    c = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                         1e-300)
    sims = c @ c.T
    nbr = [set(np.flatnonzero((sims[i] >= thr)) ) - {i}
           for i in range(len(ids))]
    core = {i for i in range(len(ids)) if len(nbr[i]) + 1 >= min_pts}
    parent = {i: i for i in core}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in core:
        for j in nbr[i]:
            if j in core:
                ri, rj = find(i), find(j)
                if ri != rj:
                    a, b = sorted((ri, rj), key=lambda r: ids[r])
                    parent[b] = a
    label = {}
    role = {}
    for i in core:
        comp = [j for j in core if find(j) == find(i)]
        label[i] = min(ids[j] for j in comp)
        role[i] = "core"
    for i in range(len(ids)):
        if i in core:
            continue
        core_nb = [j for j in nbr[i] if j in core]
        if core_nb:
            label[i] = min(label[j] for j in core_nb)
            role[i] = "border"
        else:
            label[i] = -1
            role[i] = "noise"
    return {int(ids[i]): (int(label[i]), role[i])
            for i in range(len(ids))}


def _check(mat, ids, thr, min_pts):
    out = dbscan_cosine(_emb_ds(mat, ids), threshold=thr,
                        min_pts=min_pts).to_pandas()
    exp = _brute_dbscan(mat, np.asarray(ids), thr, min_pts)
    got = {int(r.vec_id): (int(r.cluster), r.role)
           for r in out.itertuples()}
    assert got == exp


def test_two_blobs_and_noise():
    rng = np.random.default_rng(5)
    blob1 = np.tile([5.0, 0.0, 0.0], (20, 1)) + rng.normal(0, .2,
                                                           (20, 3))
    blob2 = np.tile([0.0, 5.0, 0.0], (20, 1)) + rng.normal(0, .2,
                                                           (20, 3))
    noise = np.array([[1.0, 1.0, 5.0]])
    mat = np.vstack([blob1, blob2, noise])
    out = dbscan_cosine(_emb_ds(mat), threshold=0.95,
                        min_pts=4).to_pandas()
    assert (out.loc[out.vec_id == 40, "role"] == "noise").all()
    clusters = out.loc[out.role == "core", "cluster"].unique()
    assert len(clusters) == 2


def test_matches_bruteforce_random():
    rng = np.random.default_rng(11)
    mat = rng.normal(0, 1, (60, 4))
    ids = np.arange(200, 260)
    _check(mat, ids, 0.6, 3)


def test_layout_invariance_and_validation():
    rng = np.random.default_rng(2)
    mat = rng.normal(0, 1, (40, 3))
    a = dbscan_cosine(_emb_ds(mat), threshold=0.7,
                      min_pts=3).to_pandas().sort_values("vec_id")
    b = dbscan_cosine(_emb_ds(mat).repartition(5), threshold=0.7,
                      min_pts=3).to_pandas().sort_values("vec_id")
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
    with pytest.raises(ValueError):
        dbscan_cosine(_emb_ds(mat), min_pts=0)


def test_min_pts_one_isolated_is_core_singleton():
    # regression: an isolated point has NO pair rows but with
    # min_pts=1 its self-inclusive neighborhood qualifies it as core
    mat = np.array([[1.0, 0.0, 0.0], [1.0, 0.01, 0.0],
                    [0.0, 1.0, 0.0]])
    _check(mat, np.arange(3), 0.9, 1)
    out = dbscan_cosine(_emb_ds(mat), threshold=0.9,
                        min_pts=1).to_pandas().set_index("vec_id")
    assert out.loc[2, "role"] == "core" and out.loc[2, "cluster"] == 2


def test_past_cap_distributed_path_bitwise_parity():
    """pair_cap=0 forces the shard-actor CC regime
    (_dbscan_past_cap); labels/roles must be bitwise equal to the
    driver union-find path on a fixture with all three roles."""
    rng = np.random.default_rng(5)
    blob1 = np.tile([5.0, 0.0, 0.0], (20, 1)) + rng.normal(0, .2,
                                                           (20, 3))
    blob2 = np.tile([0.0, 5.0, 0.0], (20, 1)) + rng.normal(0, .2,
                                                           (20, 3))
    noise = np.array([[1.0, 1.0, 5.0]])
    mat = np.vstack([blob1, blob2, noise])
    ids = np.arange(100, 100 + len(mat))  # non-dense id space
    kw = dict(threshold=0.95, min_pts=4)
    a = dbscan_cosine(_emb_ds(mat, ids),
                      **kw).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    b = dbscan_cosine(_emb_ds(mat, ids), pair_cap=0,
                      **kw).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert set(b.role) >= {"core", "noise"}
    # and against the brute oracle directly
    exp = _brute_dbscan(mat, ids, 0.95, 4)
    got = {int(r.vec_id): (int(r.cluster), r.role)
           for r in b.itertuples()}
    assert got == exp


def test_past_cap_border_and_min_pts_one_parity():
    # crafted border: a point similar to exactly one core member
    base = np.array([[1.0, 0.0, 0.0]])
    core_pts = np.tile(base, (4, 1)) + np.random.default_rng(
        7).normal(0, .01, (4, 3))
    border_pt = np.array([[0.93, 0.36, 0.0]])  # near one blob edge
    far = np.array([[0.0, 0.0, 1.0]])
    mat = np.vstack([core_pts, border_pt, far])
    for kw in (dict(threshold=0.97, min_pts=4),
               dict(threshold=0.9, min_pts=1)):
        a = dbscan_cosine(_emb_ds(mat),
                          **kw).to_pandas().sort_values(
            "vec_id").reset_index(drop=True)
        b = dbscan_cosine(_emb_ds(mat), pair_cap=0,
                          **kw).to_pandas().sort_values(
            "vec_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
