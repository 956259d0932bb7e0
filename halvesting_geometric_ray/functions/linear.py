"""Distributed logistic regression over a dense feature column.

The trainer for the engine's own quality/classifier filters
(fasttext-style: functions/features.py::hash_features gives the
vocabulary-free signed n-gram vectors; this fits the linear head) —
the missing step between "compute quality signals" and "apply a
LEARNED quality gate corpus-wide".

Full-batch gradient descent, one streaming pass per iteration: the
weight vector ships in the batch closure, each block emits ONE partial
row (gradient vector, loss sum, row count), the driver folds
<= num_blocks rows and updates — exactly the k-means round shape, so
an iteration's exchange is O(blocks x dim) regardless of corpus size.
Deterministic given (data, iters, lr, l2) up to cross-block float
summation order (~1e-12; tests pin a numpy replay at allclose 1e-9 and
layout invariance).

Intentionally NOT stochastic: full-batch GD is reproducible and
embarrassingly data-parallel; for the few-hundred-dim hashed-feature
heads this trains, tens of iterations converge and each costs one
corpus pass — the same cost model as a BPE merge or a Lloyd round.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import pyarrow as pa


def _xy(b: pa.Table, feat_col: str, label_col: Optional[str]):
    f = b.column(feat_col)
    if isinstance(f, pa.ChunkedArray):
        f = f.combine_chunks()
    x = np.asarray(f.flatten(), dtype=np.float64).reshape(b.num_rows, -1)
    if label_col is None:
        return x, None
    y = b.column(label_col).to_numpy(zero_copy_only=False).astype(
        np.float64)
    return x, y


def logreg_train(ds, *, feat_col: str = "features",
                 label_col: str = "label", iters: int = 50,
                 lr: float = 0.5, l2: float = 1e-4
                 ) -> Tuple[np.ndarray, Dict]:
    """Fit sigmoid(X w + b) to binary labels; returns (w, info) with
    w[:-1] the feature weights and w[-1] the bias.  info["iters"]
    records mean log-loss per round."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    w: Optional[np.ndarray] = None
    info: Dict = {"iters": []}
    n_total = None
    for it in range(iters):
        wk = w

        def partial(b: pa.Table, wk=wk) -> pa.Table:
            x, y = _xy(b, feat_col, label_col)
            d = x.shape[1]
            wcur = np.zeros(d + 1) if wk is None else wk
            z = x @ wcur[:-1] + wcur[-1]
            p = 1.0 / (1.0 + np.exp(-z))
            r = p - y
            g = np.concatenate([x.T @ r, [r.sum()]])
            eps = 1e-12
            loss = -(y * np.log(p + eps) +
                     (1 - y) * np.log(1 - p + eps)).sum()
            arr = pa.FixedSizeListArray.from_arrays(
                pa.array(g, type=pa.float64()), d + 1)
            return pa.table({"g": arr,
                             "loss": pa.array([loss], type=pa.float64()),
                             "n": pa.array([b.num_rows],
                                           type=pa.int64())})

        parts = ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
        if len(parts) == 0 or parts["n"].sum() == 0:
            raise ValueError("logreg_train: empty dataset")
        n_total = int(parts["n"].sum())
        grad = np.stack([np.asarray(v) for v in parts["g"]]).sum(axis=0)
        loss = float(parts["loss"].sum()) / n_total
        if w is None:
            w = np.zeros(len(grad))
        reg = np.concatenate([w[:-1], [0.0]])  # bias unregularized
        w = w - lr * (grad / n_total + l2 * reg)
        info["iters"].append({"iter": it, "loss": loss})
    info["n_rows"] = n_total
    info["dim"] = int(len(w) - 1)
    return w, info


def logreg_predict(ds, w: np.ndarray, *, feat_col: str = "features",
                   id_col: str = "doc_id", out_col: str = "score",
                   threshold: Optional[float] = None):
    """One streaming pass: sigmoid scores (and, with ``threshold``, a
    boolean ``keep`` column) per row."""
    wv = np.asarray(w, dtype=np.float64)

    def score(b: pa.Table) -> pa.Table:
        x, _ = _xy(b, feat_col, None)
        p = 1.0 / (1.0 + np.exp(-(x @ wv[:-1] + wv[-1])))
        cols = {id_col: b.column(id_col),
                out_col: pa.array(p, type=pa.float64())}
        if threshold is not None:
            cols["keep"] = pa.array(p >= threshold)
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)
