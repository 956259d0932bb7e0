"""Distributed k-means vs a numpy Lloyd reference with identical init."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.clustering import (kmeans,
                                                           kmeans_assign)
from halvesting_geometric_ray.functions.hashing import stable_hash64


def _emb_table(n, d, seed, centers=4):
    rng = np.random.default_rng(seed)
    mu = rng.normal(0, 10, (centers, d))
    x = mu[rng.integers(0, centers, n)] + rng.normal(0, 1, (n, d))
    ids = np.arange(n, dtype=np.int64)
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(x.ravel(), type=pa.float64()), d)
    return pa.table({"vec_id": pa.array(ids), "embedding": arr}), x


def ref_kmeans(x, ids, k, iters, seed):
    h = stable_hash64(ids, seed=seed)
    cent = x[np.argsort(h, kind="stable")[:k]].astype(np.float64).copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        new = cent.copy()
        for c in range(k):
            sel = x[assign == c]
            if len(sel):
                new[c] = sel.mean(axis=0)
        shift = np.sqrt(((new - cent) ** 2).sum(axis=1)).max()
        cent = new
        if shift <= 1e-6:
            break
    d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    return cent, d2.argmin(axis=1)


@pytest.mark.parametrize("blocks", [1, 5])
def test_matches_reference(blocks):
    t, x = _emb_table(600, 8, seed=0)
    ds = rd.from_arrow(t).repartition(blocks)
    cent, info = kmeans(ds, 4, max_iters=15, seed=13)
    exp_cent, exp_assign = ref_kmeans(x, np.arange(600), 4, 15, 13)
    assert np.allclose(cent, exp_cent, atol=1e-9)
    got = (kmeans_assign(ds, cent).to_pandas()
           .sort_values("vec_id").cluster.to_numpy())
    assert (got == exp_assign).all()
    assert info["converged"]
    # inertia is monotone non-increasing across Lloyd rounds
    inert = [r["inertia"] for r in info["iters"]]
    assert all(a >= b - 1e-6 for a, b in zip(inert, inert[1:]))


def test_layout_independent_init_and_result():
    t, _ = _emb_table(400, 6, seed=2)
    base, _ = kmeans(rd.from_arrow(t), 5, max_iters=10, seed=7)
    for blocks in (3, 8):
        c, _ = kmeans(rd.from_arrow(t).repartition(blocks), 5,
                      max_iters=10, seed=7)
        assert np.allclose(c, base, atol=1e-9), blocks


def test_validation_and_small_corpus():
    t, _ = _emb_table(3, 4, seed=1)
    with pytest.raises(ValueError, match="only 3 rows"):
        kmeans(rd.from_arrow(t), 10)
    with pytest.raises(ValueError):
        kmeans(rd.from_arrow(t), 0)
    cent, _ = kmeans(rd.from_arrow(t), 3)
    assert cent.shape == (3, 4)


def test_semantic_dedup_planted_groups():
    from halvesting_geometric_ray.functions.clustering import semantic_dedup

    rng = np.random.default_rng(4)
    base = rng.normal(0, 1, (50, 8))
    # plant exact-duplicate groups: ids 100+i duplicate vector i%10
    dup_of = {100 + i: i % 10 for i in range(30)}
    x = np.concatenate([base, base[[i % 10 for i in range(30)]]])
    ids = np.concatenate([np.arange(50), np.arange(100, 130)])
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(x.ravel(), type=pa.float64()), 8)
    ds = rd.from_arrow(pa.table({"vec_id": pa.array(ids.astype(np.int64)),
                                 "embedding": arr}))
    got = (semantic_dedup(ds, k=6, threshold=0.999999)
           .to_pandas().set_index("vec_id").keeper)
    # every planted duplicate resolves to its original (the min id)
    for dup, orig in dup_of.items():
        assert got[dup] == orig, (dup, orig, got[dup])
    # originals keep themselves; distinct originals never merge
    for i in range(50):
        assert got[i] == i
    # survivors = the 50 originals
    assert (got[got.index == got.values].index < 50).all()
    assert (got.index == got.values).sum() == 50


def test_hash_join_fixed_size_list_regression():
    """Sliced fixed_size_list blocks used to crash polars inside
    hash_join's bucket task (retry-forever hang); compact_fsl guards
    it.  num_parts >> rows forces sliced/empty buckets."""
    from halvesting_geometric_ray.ops.join import hash_join

    x = np.random.default_rng(4).normal(0, 1, (25, 8))
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(x.ravel(), type=pa.float64()), 8)
    ds = rd.from_arrow(pa.table(
        {"vec_id": pa.array(np.arange(25, dtype=np.int64)),
         "embedding": arr}))
    right = rd.from_arrow(pa.table(
        {"vec_id": pa.array(np.arange(25, dtype=np.int64)),
         "cluster": pa.array((np.arange(25) % 3).astype(np.int64))}))
    out = hash_join(ds, right, on="vec_id", right_on="vec_id",
                    num_parts=16).to_pandas().sort_values("vec_id")
    assert len(out) == 25
    assert (out.cluster.to_numpy() == np.arange(25) % 3).all()
    got = np.stack([np.asarray(v) for v in out.embedding])
    assert np.allclose(got, x)


def test_kmeans_parallel_init_quality_and_determinism():
    """k-means|| seeding: all centers are corpus rows or their
    k-means++ picks; planted well-separated clusters are each hit by
    at least one seed; seeded Lloyd reaches the planted optimum;
    deterministic across reruns and layouts."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from halvesting_geometric_ray.functions.clustering import (
        kmeans, kmeans_assign, kmeans_parallel_init)

    rng = np.random.default_rng(4)
    k, d, per = 6, 8, 80
    centers = rng.normal(0, 30.0, (k, d))   # far-separated blobs
    x = np.vstack([centers[i] + rng.normal(0, 0.5, (per, d))
                   for i in range(k)])
    ids = np.arange(len(x), dtype=np.int64)

    def ds_of(nparts):
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(x.ravel(), type=pa.float64()), d)
        t = pa.table({"vec_id": pa.array(ids), "embedding": arr})
        return rd.from_arrow(t).repartition(nparts)

    init1 = kmeans_parallel_init(ds_of(1), k, seed=3)
    init4 = kmeans_parallel_init(ds_of(4), k, seed=3)
    assert init1.shape == (k, d)
    assert np.allclose(init1, init4)  # layout-independent draws
    # every planted blob owns exactly one seed (separation >> sigma)
    owner = ((init1[:, None, :] - centers[None, :, :]) ** 2) \
        .sum(axis=2).argmin(axis=1)
    assert sorted(owner) == list(range(k))
    # seeded Lloyd lands on the planted structure
    cent, info = kmeans(ds_of(2), k, init=init1, max_iters=10)
    assign = kmeans_assign(ds_of(2), cent).to_pandas() \
        .sort_values("vec_id")["cluster"].to_numpy()
    for i in range(k):
        blob = assign[i * per:(i + 1) * per]
        assert len(set(blob)) == 1
    assert info["iters"][-1]["inertia"] < per * k * d * 0.5 ** 2 * 3
