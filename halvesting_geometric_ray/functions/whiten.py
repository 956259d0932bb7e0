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


# ---------------------------------------------------------------------
# Johnson-Lindenstrauss random projection
# ---------------------------------------------------------------------

def rp_matrix(d_in: int, d_out: int, seed: int = 0,
              kind: str = "sparse") -> np.ndarray:
    """Deterministic (d_out, d_in) JL projection matrix.

    kind="gauss": N(0, 1/d_out) entries (the classical construction).
    kind="sparse": Achlioptas (2003) database-friendly matrix —
    entries sqrt(3/d_out) * {+1 w.p. 1/6, 0 w.p. 2/3, -1 w.p. 1/6};
    2/3 of the multiplies vanish while preserving the JL guarantee.
    Pure function of (d_in, d_out, seed, kind)."""
    if d_out < 1 or d_in < 1:
        raise ValueError("dims must be >= 1")
    rng = np.random.default_rng(np.random.PCG64(seed))
    if kind == "gauss":
        return rng.normal(0.0, 1.0, (d_out, d_in)) / np.sqrt(d_out)
    if kind == "sparse":
        u = rng.random((d_out, d_in))
        R = np.zeros((d_out, d_in), dtype=np.float64)
        R[u < 1.0 / 6.0] = 1.0
        R[u > 5.0 / 6.0] = -1.0
        return R * np.sqrt(3.0 / d_out)
    raise ValueError(f"unknown kind {kind!r}")


def random_projection(ds, d_out: int, *, id_col: str = "vec_id",
                      col: str = "embedding", seed: int = 0,
                      kind: str = "sparse"):
    """Project an embedding column to d_out dims with a broadcast JL
    matrix: x -> R x.  The Johnson-Lindenstrauss scale path for ANN /
    clustering when d is large — one stateless streaming pass, the
    (d_out x d) matrix shipped ONCE via ray.put (never per batch).

    Unlike pca_whiten this needs NO stats pass (data-oblivious), so it
    is the right tool when even one extra pass over 100 TB is too
    expensive and isotropy is not required.  Returns (Dataset(id_col,
    col) with d=d_out, info).  Distance-preservation bounds and
    sequential parity are pinned in tests/test_rp.py."""
    import ray

    # peek one row for d_in (cheap: first block only)
    first = ds.take(1)
    if not first:
        raise ValueError("random_projection: empty dataset")
    d_in = len(first[0][col])
    if d_out > d_in:
        raise ValueError(f"d_out {d_out} > input dim {d_in}")
    R = rp_matrix(d_in, d_out, seed=seed, kind=kind)
    rref = ray.put(np.ascontiguousarray(R))

    def transform(b: pa.Table) -> pa.Table:
        Rm = ray.get(rref)
        ids, X = _mat(b, id_col, col)
        Y = X @ Rm.T
        return pa.table({
            id_col: pa.array(ids),
            col: pa.FixedSizeListArray.from_arrays(
                pa.array(np.ascontiguousarray(Y).ravel(),
                         type=pa.float64()), Y.shape[1]),
        })

    out = ds.map_batches(transform, batch_format="pyarrow",
                         zero_copy_batch=True)
    return out, {"d_in": d_in, "d_out": d_out, "seed": seed,
                 "kind": kind, "nnz_frac":
                     float((R != 0).mean()) if kind == "sparse" else 1.0}


# ---- Frequent Directions: the matrix sketch ----------------------------

def _fd_shrink(m: np.ndarray, ell: int):
    """One FD shrink step: SVD + spectral subtraction down to < ell
    rows.  Returns (B, delta) with delta = the squared singular value
    subtracted (the step's contribution to the error budget)."""
    if m.shape[0] < ell:
        return m, 0.0
    try:
        _, s, vt = np.linalg.svd(m, full_matrices=False)
    except np.linalg.LinAlgError:
        _, s, vt = np.linalg.svd(m + 1e-12, full_matrices=False)
    # rank <= d: when d < ell the ell-th singular value is 0 -> the
    # fold is a LOSSLESS compression to <= d rows (delta 0)
    delta = float(s[ell - 1] ** 2) if s.size >= ell else 0.0
    s2 = np.maximum(s ** 2 - delta, 0.0)
    keep = s2 > 0.0
    b = (np.sqrt(s2[keep])[:, None] * vt[keep])
    if b.shape[0] >= ell:  # all-equal spectrum edge: force < ell rows
        b = b[:ell - 1]
    return b, delta


def frequent_directions(ds, ell: int, *, col: str = "embedding",
                        id_col: str = "vec_id"):
    """Frequent Directions matrix sketch (Liberty 2013; Ghashami et
    al. 2016): a (<= ell-1, d) matrix B with the deterministic
    guarantee

        0  <=  x^T (A^T A - B^T B) x  <=  total_shrink      (all |x|=1)

    — the streaming-PCA scale path when d is too large for the exact
    d^2 covariance pass (functions/whiten.py::whitening_stats): sketch
    state is ell x d regardless of corpus size.

    Distributed shape: one map_batches pass emits a per-block FD
    sketch (each block's rows shrunk to < ell) + its shrink budget;
    the driver folds the <= num_blocks sketches SEQUENTIALLY in
    stable block order (stack + shrink per fold — FD sketches are
    mergeable with additive error budgets; Ghashami Thm. 3.1).  The
    merge ORDER changes B (not the guarantee): fixed layout reruns
    are bitwise, layout is a sketch hyperparameter, and the
    certificate (the quadratic-form sandwich above) holds for every
    layout (pinned in tests/test_whiten.py).

    Returns (B, info) with info = {"total_shrink", "n_rows",
    "frob_sq"} — frob_sq = ||A||_F^2, so the classic bound
    total_shrink <= frob_sq / (ell - rank-ish) is checkable by the
    caller."""
    if ell < 2:
        raise ValueError("ell must be >= 2")

    def partial(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy()
        emb = b.column(col)
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        if len(ids) == 0:
            return pa.table({
                "blk": pa.array([], type=pa.int64()),
                "row": pa.array([], type=pa.list_(pa.float64())),
                "delta": pa.array([], type=pa.float64()),
                "frob": pa.array([], type=pa.float64()),
                "n": pa.array([], type=pa.int64())})
        m = np.asarray(emb.flatten(),
                       dtype=np.float64).reshape(len(ids), -1)
        # deterministic in-block order
        order = np.argsort(ids, kind="stable")
        m = m[order]
        frob = float((m * m).sum())
        bs, delta = _fd_shrink(m, ell)
        d = m.shape[1]
        if len(bs) == 0:
            # an all-equal-spectrum block can shrink to zero rows; a
            # zero row is Gram-neutral and carries the block's stats
            # (dropping them would under-report the error budget)
            bs = np.zeros((1, d), dtype=np.float64)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(bs.ravel(), type=pa.float64()), d)
        return pa.table({
            "blk": pa.array(np.full(len(bs), int(ids.min()),
                                    dtype=np.int64)),
            "row": arr,
            "delta": pa.array(np.full(len(bs), delta)),
            "frob": pa.array(np.full(len(bs), frob)),
            "n": pa.array(np.full(len(bs), len(ids),
                                  dtype=np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if not len(parts):
        return np.zeros((0, 0)), {"total_shrink": 0.0, "n_rows": 0,
                                  "frob_sq": 0.0}
    total_shrink = 0.0
    frob_sq = 0.0
    n_rows = 0
    b = None
    # stable fold order: by block key
    for blk, grp in parts.groupby("blk", sort=True):
        rows = np.vstack([np.asarray(r) for r in grp["row"]])
        total_shrink += float(grp["delta"].iloc[0])
        frob_sq += float(grp["frob"].iloc[0])
        n_rows += int(grp["n"].iloc[0])
        b = rows if b is None else np.vstack([b, rows])
        b, d2 = _fd_shrink(b, ell)
        total_shrink += d2
    return b, {"total_shrink": total_shrink, "n_rows": n_rows,
               "frob_sq": frob_sq}
