"""Distributed logistic regression vs a numpy full-batch GD replay."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.linear import (logreg_predict,
                                                       logreg_train)


def _table(x, y=None):
    d = x.shape[1]
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(x.ravel(), type=pa.float64()), d)
    cols = {"doc_id": pa.array(np.arange(len(x), dtype=np.int64)),
            "features": arr}
    if y is not None:
        cols["label"] = pa.array(y.astype(np.int64))
    return pa.table(cols)


def ref_train(x, y, iters, lr, l2):
    d = x.shape[1]
    w = np.zeros(d + 1)
    for _ in range(iters):
        z = x @ w[:-1] + w[-1]
        p = 1.0 / (1.0 + np.exp(-z))
        r = p - y
        g = np.concatenate([x.T @ r, [r.sum()]])
        reg = np.concatenate([w[:-1], [0.0]])
        w = w - lr * (g / len(x) + l2 * reg)
    return w


def _sep_data(n=500, d=8, seed=0):
    rng = np.random.default_rng(seed)
    w_true = rng.normal(0, 2, d)
    x = rng.normal(0, 1, (n, d))
    y = ((x @ w_true + 0.3 * rng.normal(0, 1, n)) > 0).astype(np.float64)
    return x, y


@pytest.mark.parametrize("blocks", [1, 6])
def test_matches_numpy_replay(blocks):
    x, y = _sep_data()
    ds = rd.from_arrow(_table(x, y)).repartition(blocks)
    w, info = logreg_train(ds, iters=30, lr=0.8, l2=1e-3)
    exp = ref_train(x, y, 30, 0.8, 1e-3)
    assert np.allclose(w, exp, atol=1e-9), blocks
    # loss decreases
    losses = [r["loss"] for r in info["iters"]]
    assert losses[-1] < losses[0]
    # accuracy on the training set is high for separable-ish data
    scored = (logreg_predict(ds, w, threshold=0.5).to_pandas()
              .sort_values("doc_id"))
    acc = ((scored.score >= 0.5).to_numpy() == (y > 0.5)).mean()
    assert acc > 0.9
    assert scored.keep.to_numpy().dtype == bool


def test_end_to_end_quality_gate_on_hashed_features():
    """Train on hash_features of crafted good/bad docs, gate the rest."""
    from halvesting_geometric_ray.functions.features import hash_features

    good = ["the quick brown fox jumps over the lazy dog " * 3] * 30
    bad = ["buy cheap pills now click here spam spam spam " * 3] * 30
    docs = pd.DataFrame({
        "doc_id": np.arange(60, dtype=np.int64),
        "text": good + bad,
        "label": [1] * 30 + [0] * 30})
    feats = hash_features(rd.from_pandas(docs[["doc_id", "text"]]),
                          dim=64).materialize()
    lab = feats.to_pandas().merge(docs[["doc_id", "label"]], on="doc_id")
    ds = rd.from_arrow(_table(
        np.stack([np.asarray(v) for v in
                  lab.sort_values("doc_id").features]),
        lab.sort_values("doc_id").label.to_numpy()))
    w, _ = logreg_train(ds, iters=80, lr=1.0, l2=1e-4)
    scored = logreg_predict(ds, w).to_pandas().sort_values("doc_id")
    assert (scored.score[:30] > 0.5).all()
    assert (scored.score[30:] < 0.5).all()


def test_validation():
    x, y = _sep_data(10)
    ds = rd.from_arrow(_table(x, y))
    with pytest.raises(ValueError):
        logreg_train(ds, iters=0)


# ---- ROC-AUC ------------------------------------------------------------

def _auc_ref(scores, labels):
    """Pairwise reference with tie credit 0.5."""
    import itertools

    pos = [s for s, y in zip(scores, labels) if y == 1]
    neg = [s for s, y in zip(scores, labels) if y == 0]
    tot = 0.0
    for p, n in itertools.product(pos, neg):
        tot += 1.0 if p > n else (0.5 if p == n else 0.0)
    return tot / (len(pos) * len(neg))


def test_roc_auc_exact_and_invariant():
    import pandas as pd
    import ray.data as rd

    from halvesting_geometric_ray.ops.stats import roc_auc

    rng = np.random.default_rng(0)
    n = 400
    labels = rng.integers(0, 2, n)
    # ties on purpose: quantized scores correlated with the label
    scores = np.round(rng.normal(labels * 0.8, 1.0), 1)
    df = pd.DataFrame({"s": scores, "y": labels.astype(np.int64)})
    exp = _auc_ref(scores.tolist(), labels.tolist())
    for parts in (1, 8):
        got = roc_auc(rd.from_pandas(df).repartition(parts), "s", "y")
        assert abs(got - exp) < 1e-12, parts
    # perfect / inverted / coin-flip anchors
    from halvesting_geometric_ray.ops.stats import roc_auc as auc

    d2 = pd.DataFrame({"s": [0.1, 0.2, 0.8, 0.9],
                       "y": np.array([0, 0, 1, 1], dtype=np.int64)})
    assert auc(rd.from_pandas(d2), "s", "y") == 1.0
    d3 = d2.assign(s=-d2.s)
    assert auc(rd.from_pandas(d3), "s", "y") == 0.0


def test_roc_auc_validation():
    import pandas as pd
    import pytest
    import ray.data as rd

    from halvesting_geometric_ray.ops.stats import roc_auc

    one_class = pd.DataFrame({"s": [0.1, 0.2],
                              "y": np.array([1, 1], dtype=np.int64)})
    with pytest.raises(ValueError, match="both classes"):
        roc_auc(rd.from_pandas(one_class), "s", "y")
    bad = pd.DataFrame({"s": [0.1], "y": np.array([2], dtype=np.int64)})
    with pytest.raises(Exception):
        roc_auc(rd.from_pandas(bad), "s", "y")
