"""PCA/ZCA whitening (functions/whiten.py): numpy oracle parity,
identity output covariance, truncation variance, partitioning
invariance, validation."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.whiten import (pca_whiten,
                                                       whitening_stats)


def _aniso_ds(n=400, d=6, seed=3, blocks=1):
    """Strongly anisotropic Gaussian (distinct variances + rotation)."""
    rng = np.random.default_rng(seed)
    scales = np.linspace(3.0, 0.2, d)
    A = rng.normal(size=(d, d))
    q, _ = np.linalg.qr(A)
    X = rng.normal(size=(n, d)) * scales @ q.T + rng.normal(size=d)
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(X.ravel(), type=pa.float64()), d)})
    ds = rd.from_arrow(t)
    if blocks > 1:
        ds = ds.repartition(blocks)
    return ds, X


def test_stats_match_numpy():
    ds, X = _aniso_ds()
    n, mean, cov = whitening_stats(ds)
    assert n == len(X)
    assert np.allclose(mean, X.mean(axis=0), atol=1e-9)
    assert np.allclose(cov, np.cov(X.T, bias=True), atol=1e-9)


def test_whitened_covariance_is_identity():
    ds, X = _aniso_ds(seed=5)
    out, info = pca_whiten(ds)
    df = out.to_pandas().sort_values("vec_id")
    Y = np.vstack(df.embedding.to_numpy())
    cov = np.cov(Y.T, bias=True)
    assert np.allclose(cov, np.eye(Y.shape[1]), atol=1e-6), \
        np.abs(cov - np.eye(Y.shape[1])).max()
    assert info["explained_variance_ratio"] == pytest.approx(1.0)


def test_truncation_keeps_top_variance():
    ds, X = _aniso_ds(seed=7, d=8)
    out, info = pca_whiten(ds, k=3)
    df = out.to_pandas().sort_values("vec_id")
    Y = np.vstack(df.embedding.to_numpy())
    assert Y.shape[1] == 3
    # top-3 axes of this spectrum carry most of the variance
    assert info["explained_variance_ratio"] > 0.75
    # truncated output is whitened too
    assert np.allclose(np.cov(Y.T, bias=True), np.eye(3), atol=1e-6)
    # eigenvalues descending
    assert (np.diff(info["eigenvalues"]) <= 1e-12).all()


def test_zca_stays_in_original_basis():
    """ZCA is the unique whitening closest to the input: for an
    already-white input it must be (near) the identity map."""
    rng = np.random.default_rng(11)
    X = rng.normal(size=(2000, 4))
    X -= X.mean(axis=0)
    t = pa.table({"vec_id": pa.array(np.arange(len(X), dtype=np.int64)),
                  "embedding": pa.FixedSizeListArray.from_arrays(
                      pa.array(X.ravel(), type=pa.float64()), 4)})
    out, _ = pca_whiten(rd.from_arrow(t), zca=True)
    Y = np.vstack(out.to_pandas().sort_values("vec_id")
                  .embedding.to_numpy())
    # same orientation: strong per-column correlation with the input
    for j in range(4):
        c = np.corrcoef(X[:, j], Y[:, j])[0, 1]
        assert c > 0.9, (j, c)


def test_partitioning_invariant():
    got = []
    for blocks in (1, 7):
        ds, _ = _aniso_ds(seed=13, blocks=blocks)
        out, _ = pca_whiten(ds, k=4)
        df = out.to_pandas().sort_values("vec_id").reset_index(drop=True)
        got.append(np.vstack(df.embedding.to_numpy()))
    assert np.allclose(got[0], got[1], atol=1e-9)


def test_validation():
    ds, _ = _aniso_ds(d=4)
    with pytest.raises(ValueError, match="k must be"):
        pca_whiten(ds, k=9)
    with pytest.raises(ValueError, match="zca requires"):
        pca_whiten(ds, k=2, zca=True)
    with pytest.raises(ValueError, match="eps"):
        pca_whiten(ds, eps=0.0)
    empty = rd.from_arrow(pa.table({
        "vec_id": pa.array([], type=pa.int64()),
        "embedding": pa.array([], type=pa.list_(pa.float64(), 4))}))
    with pytest.raises(ValueError, match="empty"):
        whitening_stats(empty)


def test_frequent_directions_certificate():
    """The FD sandwich 0 <= x'(A'A - B'B)x <= total_shrink holds for
    every layout; top-subspace recovery on low-rank + noise; fixed
    layout reruns bitwise; frob accounting exact."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from halvesting_geometric_ray.functions.whiten import \
        frequent_directions

    rng = np.random.default_rng(2)
    n, d, ell = 400, 24, 10
    # rank-3 signal + small noise
    u = rng.normal(0, 1, (n, 3))
    v = rng.normal(0, 1, (3, d)) * 5.0
    a = u @ v + rng.normal(0, 0.1, (n, d))
    ids = np.arange(n, dtype=np.int64)

    def ds_of(nparts):
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(a.ravel(), type=pa.float64()), d)
        return rd.from_arrow(pa.table(
            {"vec_id": pa.array(ids), "embedding": arr})) \
            .repartition(nparts)

    for nparts in (1, 4):
        b, info = frequent_directions(ds_of(nparts), ell)
        assert b.shape[0] < ell and b.shape[1] == d
        diff = a.T @ a - b.T @ b
        w = np.linalg.eigvalsh(diff)
        assert w.min() > -1e-6 * info["frob_sq"]   # PSD side
        assert w.max() <= info["total_shrink"] + 1e-6 * info["frob_sq"]
        assert info["n_rows"] == n
        assert np.isclose(info["frob_sq"], (a * a).sum())
        # the rank-3 signal survives: top-3 singular directions of B
        # align with the planted ones
        _, _, vt_b = np.linalg.svd(b, full_matrices=False)
        _, _, vt_a = np.linalg.svd(a, full_matrices=False)
        sv = np.linalg.svd(vt_a[:3] @ vt_b[:3].T, compute_uv=False)
        assert sv.min() > 0.99
    # fixed layout: bitwise rerun
    b1, i1 = frequent_directions(ds_of(4), ell)
    b2, i2 = frequent_directions(ds_of(4), ell)
    assert np.array_equal(b1, b2)
    assert i1 == i2
    import pytest

    with pytest.raises(ValueError):
        frequent_directions(ds_of(1), 1)


def test_frequent_directions_edge_cases():
    """ell > d (lossless fold regime) and the all-equal-spectrum
    block (zero surviving rows) keep the certificate honest."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from halvesting_geometric_ray.functions.whiten import (
        _fd_shrink, frequent_directions)

    # d < ell: SVD fold is lossless, delta == 0
    m = np.random.default_rng(0).normal(size=(10, 4))
    b, delta = _fd_shrink(m, 8)
    assert delta == 0.0
    assert np.allclose(b.T @ b, m.T @ m, atol=1e-9)
    # all-equal spectrum: shrink kills every row but must report delta
    eye = 3.0 * np.eye(4)
    b2, d2 = _fd_shrink(eye, 4)
    assert d2 == 9.0 and b2.shape[0] == 0
    # end-to-end with such a block: budget still certified
    a = np.vstack([eye, np.random.default_rng(1).normal(
        0, 1, (30, 4))])
    ids = np.arange(len(a), dtype=np.int64)
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(a.ravel(), type=pa.float64()), 4)
    ds = rd.from_arrow(pa.table(
        {"vec_id": pa.array(ids), "embedding": arr}))
    bb, info = frequent_directions(ds, 4)
    assert info["n_rows"] == len(a)
    assert np.isclose(info["frob_sq"], (a * a).sum())
    diff = a.T @ a - bb.T @ bb
    w = np.linalg.eigvalsh(diff)
    assert w.min() > -1e-8
    assert w.max() <= info["total_shrink"] + 1e-8
    # ell > d end-to-end
    b3, i3 = frequent_directions(ds, 12)
    assert b3.shape[1] == 4
    d3 = a.T @ a - b3.T @ b3
    w3 = np.linalg.eigvalsh(d3)
    assert w3.max() <= i3["total_shrink"] + 1e-8
