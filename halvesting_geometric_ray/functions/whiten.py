"""PCA / ZCA whitening for embedding columns.

The standard embedding post-process for retrieval quality (Su et al.
2021, "Whitening Sentence Representations"; Jung et al. 2023 for dense
retrieval): center, rotate to principal axes, rescale each axis to unit
variance — removing the anisotropy that makes raw cosine scores
cluster.  Optional rank truncation (keep the top-k axes) is the PCA
dimensionality reduction used before ANN indexing.

Scale shape: covariance needs one streaming pass emitting a (1 + d +
d*d)-float partial per BLOCK (count, sum, X^T X), reduced on the
driver — vocab-independent, O(blocks x d^2) driver traffic with d
bounded (embedding dims are 16-4096).  The d x d eigendecomposition is
driver-side numpy (microseconds at these d); the transform is a second
stateless streaming pass.  Composes with knn_* / kmeans /
semantic_dedup unchanged (same (id, fixed_size_list) shape out).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import pyarrow as pa

from .clustering import _mat


def whitening_stats(ds, *, id_col: str = "vec_id",
                    col: str = "embedding") -> Tuple[int, np.ndarray,
                                                     np.ndarray]:
    """One pass -> (n, mean (d,), covariance (d, d)).  Partials are
    exact float64 sums; the driver reduce is a tiny sum over one row
    per block."""

    def partial(b: pa.Table) -> pa.Table:
        _, X = _mat(b, id_col, col)
        d = X.shape[1]
        s = X.sum(axis=0)
        g = X.T @ X
        return pa.table({
            "n": pa.array([X.shape[0]], type=pa.int64()),
            "s": pa.array([s.tolist()]),
            "g": pa.array([g.ravel().tolist()]),
        })

    n = 0
    s = None
    g = None
    for b in ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
                                batch_format="pyarrow"):
        for i in range(b.num_rows):
            n += int(b.column("n")[i].as_py())
            sv = np.asarray(b.column("s")[i].as_py(), dtype=np.float64)
            gv = np.asarray(b.column("g")[i].as_py(), dtype=np.float64)
            s = sv if s is None else s + sv
            g = gv if g is None else g + gv
    if n == 0:
        raise ValueError("whitening_stats: empty dataset")
    d = s.size
    mean = s / n
    cov = g.reshape(d, d) / n - np.outer(mean, mean)
    return n, mean, cov


def pca_whiten(ds, *, id_col: str = "vec_id", col: str = "embedding",
               k: Optional[int] = None, eps: float = 1e-9,
               zca: bool = False) -> Tuple["object", Dict]:
    """Whiten an embedding Dataset: x -> W (x - mean), where W rescales
    the top-k principal axes to unit variance (PCA whitening; with
    ``zca=True`` the result is rotated back into the original basis —
    full rank only).  Returns (Dataset(id_col, col) with d=k, info with
    mean/components/explained_variance).

    Deterministic given the input SET: the covariance is an exact sum
    of per-block float64 partials (allclose across partitionings, not
    bitwise — float association), eigenvectors sign-fixed by making
    each vector's largest-|.| entry positive."""
    if eps <= 0:
        raise ValueError("eps must be > 0")
    n, mean, cov = whitening_stats(ds, id_col=id_col, col=col)
    d = mean.size
    kk = d if k is None else int(k)
    if not 1 <= kk <= d:
        raise ValueError(f"k must be in [1, {d}]")
    if zca and kk != d:
        raise ValueError("zca requires full rank (k == d)")
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:kk]
    lam = w[order]
    U = v[:, order]
    # deterministic sign convention
    flip = U[np.abs(U).argmax(axis=0), np.arange(kk)] < 0
    U[:, flip] *= -1.0
    W = (U / np.sqrt(np.maximum(lam, 0.0) + eps)).T  # (k, d)
    if zca:
        W = U @ W
    import ray

    wref = ray.put((mean, np.ascontiguousarray(W)))

    def transform(b: pa.Table) -> pa.Table:
        mu, Wm = ray.get(wref)
        ids, X = _mat(b, id_col, col)
        Y = (X - mu) @ Wm.T
        return pa.table({
            id_col: pa.array(ids),
            col: pa.FixedSizeListArray.from_arrays(
                pa.array(np.ascontiguousarray(Y).ravel(),
                         type=pa.float64()), Y.shape[1]),
        })

    out = ds.map_batches(transform, batch_format="pyarrow",
                         zero_copy_batch=True)
    total_var = float(np.maximum(w, 0.0).sum())
    info = {"n": n, "dim": d, "k": kk, "mean": mean,
            "components": U, "eigenvalues": lam,
            "explained_variance_ratio":
                float(np.maximum(lam, 0.0).sum() / total_var)
                if total_var > 0 else 1.0,
            "zca": zca}
    return out, info
