"""Feature propagation (graph/propagate.py): NumPy oracle parity for
both aggregation modes, layout independence, scalar widening, missing
features, validation."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.propagate import feature_propagation


def _rand_graph(n=60, p_edge=0.08, seed=3):
    rng = np.random.default_rng(seed)
    m = rng.random((n, n)) < p_edge
    np.fill_diagonal(m, False)
    src, dst = np.nonzero(m)
    edges = rd.from_arrow(pa.table({
        "src": pa.array(src.astype(np.int64)),
        "dst": pa.array(dst.astype(np.int64))}))
    return edges, (src, dst), n


def _feat_ds(n, d, seed=7, drop=()):
    rng = np.random.default_rng(seed)
    X = np.round(rng.normal(size=(n, d)), 3)
    keep = np.setdiff1d(np.arange(n), np.array(drop, dtype=np.int64))
    t = pa.table({
        "vid": pa.array(keep),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(X[keep].ravel(), type=pa.float64()), d)})
    X0 = X.copy()
    X0[list(drop)] = 0.0
    return rd.from_arrow(t), X0


def _oracle(src, dst, n, X0, rounds, alpha, agg):
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    indeg = np.bincount(dst, minlength=n).astype(np.float64)
    H = X0.copy()
    for _ in range(rounds):
        M = np.zeros_like(H)
        if agg == "rw":
            contrib = H[src] / np.maximum(outdeg[src], 1.0)[:, None]
        else:
            contrib = H[src]
        np.add.at(M, dst, contrib)
        if agg == "mean":
            M /= np.maximum(indeg, 1.0)[:, None]
        H = (1.0 - alpha) * M + alpha * X0
    return H


@pytest.mark.parametrize("agg,alpha,rounds", [
    ("mean", 0.0, 1), ("mean", 0.15, 3), ("rw", 0.0, 2), ("rw", 0.5, 3)])
def test_matches_numpy_oracle(tmp_path, agg, alpha, rounds):
    edges, (src, dst), n = _rand_graph()
    feats, X0 = _feat_ds(n, 4)
    offsets = np.array([0, n // 3, n], dtype=np.int64)
    ds, info = feature_propagation(
        edges, offsets, feats, str(tmp_path / f"{agg}{rounds}"),
        rounds=rounds, alpha=alpha, agg=agg)
    df = ds.to_pandas().sort_values("vid").reset_index(drop=True)
    got = np.vstack(df.embedding.to_numpy())
    want = _oracle(src, dst, n, X0, rounds, alpha, agg)
    assert got.shape == (n, 4)
    assert np.allclose(got, want, atol=1e-12), np.abs(got - want).max()
    assert info["dim"] == 4 and info["rounds"] == rounds


def test_layout_independent(tmp_path):
    edges, (src, dst), n = _rand_graph(seed=5)
    feats, X0 = _feat_ds(n, 3, seed=9)
    got = []
    for tag, cuts, na in (("a", [0, n], 1), ("b", [0, 11, 29, n], 3)):
        ds, _ = feature_propagation(
            edges, np.array(cuts, dtype=np.int64), feats,
            str(tmp_path / tag), rounds=2, alpha=0.1, agg="rw",
            num_actors=na)
        df = ds.to_pandas().sort_values("vid").reset_index(drop=True)
        got.append(np.vstack(df.embedding.to_numpy()))
    assert np.allclose(got[0], got[1], atol=1e-12)


def test_scalar_column_widens(tmp_path):
    """A plain numeric feature column is treated as d=1; round-1 mean
    with alpha=0 is exactly the in-neighbor mean."""
    edges, (src, dst), n = _rand_graph(seed=11)
    vals = np.arange(n, dtype=np.int64) * 10
    feats = rd.from_arrow(pa.table({
        "vid": pa.array(np.arange(n, dtype=np.int64)),
        "x": pa.array(vals)}))
    ds, info = feature_propagation(
        edges, np.array([0, n], dtype=np.int64), feats,
        str(tmp_path / "s"), col="x", rounds=1, alpha=0.0, agg="mean")
    assert info["dim"] == 1
    df = ds.to_pandas().sort_values("vid").reset_index(drop=True)
    got = np.vstack(df.x.to_numpy()).ravel()
    sums = np.bincount(dst, weights=vals[src].astype(np.float64),
                       minlength=n)
    indeg = np.bincount(dst, minlength=n)
    want = sums / np.maximum(indeg, 1)
    assert np.allclose(got, want, atol=1e-12)


def test_missing_features_default_zero(tmp_path):
    edges, (src, dst), n = _rand_graph(seed=13)
    feats, X0 = _feat_ds(n, 2, drop=(0, 5, 17))
    ds, _ = feature_propagation(
        edges, np.array([0, n], dtype=np.int64), feats,
        str(tmp_path / "m"), rounds=2, alpha=0.2, agg="mean")
    df = ds.to_pandas().sort_values("vid").reset_index(drop=True)
    got = np.vstack(df.embedding.to_numpy())
    want = _oracle(src, dst, n, X0, 2, 0.2, "mean")
    assert np.allclose(got, want, atol=1e-12)


def test_validation(tmp_path):
    edges, _, n = _rand_graph(seed=17)
    feats, _ = _feat_ds(n, 2)
    off = np.array([0, n], dtype=np.int64)
    with pytest.raises(ValueError, match="rounds"):
        feature_propagation(edges, off, feats, str(tmp_path), rounds=0)
    with pytest.raises(ValueError, match="alpha"):
        feature_propagation(edges, off, feats, str(tmp_path), alpha=1.5)
    with pytest.raises(ValueError, match="agg"):
        feature_propagation(edges, off, feats, str(tmp_path), agg="max")


def test_sgc_composition_denoises_labels(tmp_path):
    """The propagate-then-fit-linear-head recipe (SGC, Wu et al. 2019):
    on a two-block planted graph with a noisy 1-d label-indicator
    feature, 2 rounds of mean aggregation must denoise the feature
    enough that logistic regression separates the blocks better than
    on the raw feature."""
    from halvesting_geometric_ray.functions.linear import (logreg_predict,
                                                           logreg_train)
    from halvesting_geometric_ray.ops.stats import roc_auc

    rng = np.random.default_rng(5)
    n, block = 80, 40
    lab = (np.arange(n) >= block).astype(np.int64)
    # intra-block edges only (dense), so neighbor means converge to the
    # block mean
    src, dst = [], []
    for b in (0, 1):
        lo = b * block
        for u in range(lo, lo + block):
            for v in range(lo, lo + block):
                if u != v and rng.random() < 0.3:
                    src.append(u)
                    dst.append(v)
    edges = rd.from_arrow(pa.table({
        "src": pa.array(np.array(src, dtype=np.int64)),
        "dst": pa.array(np.array(dst, dtype=np.int64))}))
    x = lab.astype(np.float64) + rng.normal(0, 2.0, n)  # very noisy
    feats = rd.from_arrow(pa.table({
        "vid": pa.array(np.arange(n, dtype=np.int64)),
        "x": pa.array(x)}))
    prop, _ = feature_propagation(
        edges, np.array([0, n], dtype=np.int64), feats,
        str(tmp_path / "sgc"), col="x", rounds=2, alpha=0.0, agg="mean")

    def make_ds(vals):
        return rd.from_arrow(pa.table({
            "features": pa.FixedSizeListArray.from_arrays(
                pa.array(vals.astype(np.float64)), 1),
            "label": pa.array(lab)})).materialize()

    def auc_of(vals):
        ds = make_ds(vals)
        w, _ = logreg_train(ds, feat_col="features", label_col="label",
                            iters=60, lr=0.5)
        sc = logreg_predict(ds, w, feat_col="features", id_col="label")
        return roc_auc(sc, "score", "label")

    df = prop.to_pandas().sort_values("vid")
    xs = np.vstack(df.x.to_numpy()).ravel()
    auc_raw = auc_of(x)
    auc_sgc = auc_of(xs)
    assert auc_sgc > auc_raw + 0.1, (auc_raw, auc_sgc)
    assert auc_sgc > 0.9, auc_sgc


def _weighted_oracle(src, dst, w, n, X0, rounds, alpha, agg):
    wout = np.bincount(src, weights=w, minlength=n)
    win = np.bincount(dst, weights=w, minlength=n)
    H = X0.copy()
    for _ in range(rounds):
        M = np.zeros_like(H)
        if agg == "rw":
            contrib = H[src] * (w / np.where(wout[src] > 0,
                                             wout[src], 1.0))[:, None]
        else:
            contrib = H[src] * w[:, None]
        np.add.at(M, dst, contrib)
        if agg == "mean":
            M /= np.where(win > 0, win, 1.0)[:, None]
        H = (1.0 - alpha) * M + alpha * X0
    return H


@pytest.mark.parametrize("agg", ["mean", "rw"])
def test_weighted_matches_numpy_oracle(tmp_path, agg):
    """weight_col mode: rw normalizes by out-weight, mean is the
    weighted in-neighbor mean."""
    rng = np.random.default_rng(21)
    edges, (src, dst), n = _rand_graph(seed=19)
    w = rng.integers(1, 5, src.size).astype(np.float64)
    ew = rd.from_arrow(pa.table({
        "src": pa.array(src.astype(np.int64)),
        "dst": pa.array(dst.astype(np.int64)),
        "w": pa.array(w)}))
    feats, X0 = _feat_ds(n, 3, seed=23)
    ds, info = feature_propagation(
        ew, np.array([0, n // 2, n], dtype=np.int64), feats,
        str(tmp_path / agg), rounds=2, alpha=0.1, agg=agg,
        weight_col="w")
    assert info["weight_col"] == "w"
    df = ds.to_pandas().sort_values("vid").reset_index(drop=True)
    got = np.vstack(df.embedding.to_numpy())
    want = _weighted_oracle(src, dst, w, n, X0, 2, 0.1, agg)
    assert np.allclose(got, want, atol=1e-12), np.abs(got - want).max()
