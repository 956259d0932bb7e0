"""PQ train/encode/search: shape, determinism, reconstruction, recall."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.quantization import (knn_cosine_pq,
                                                             pq_encode,
                                                             pq_train)


def _emb_table(n, d, seed, centers=6):
    rng = np.random.default_rng(seed)
    mu = rng.normal(0, 5, (centers, d))
    x = mu[rng.integers(0, centers, n)] + rng.normal(0, 0.3, (n, d))
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(x.ravel(), type=pa.float64()), d)
    return pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                     "embedding": arr}), x


def test_train_encode_shapes_and_determinism():
    t, _ = _emb_table(500, 16, seed=0)
    ds = rd.from_arrow(t)
    cb = pq_train(ds, m=4, n_codes=8, seed=7)
    assert cb.shape == (4, 8, 4)
    cb2 = pq_train(ds, m=4, n_codes=8, seed=7)
    assert np.array_equal(cb, cb2)
    codes = pq_encode(ds, cb).to_pandas().sort_values("vec_id")
    assert len(codes) == 500
    c = np.stack([np.asarray(v) for v in codes.code])
    assert c.shape == (500, 4) and c.dtype == np.uint8
    assert (c < 8).all()


def test_reconstruction_improves_with_codes():
    t, x = _emb_table(800, 16, seed=1)
    ds = rd.from_arrow(t)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)

    def recon_err(n_codes):
        cb = pq_train(ds, m=4, n_codes=n_codes, seed=3)
        codes = pq_encode(ds, cb).to_pandas().sort_values("vec_id")
        c = np.stack([np.asarray(v) for v in codes.code])
        rec = np.concatenate([cb[j][c[:, j]] for j in range(4)], axis=1)
        return float(((xn - rec) ** 2).sum(axis=1).mean())

    e2, e16 = recon_err(2), recon_err(16)
    assert e16 < e2  # more codes -> lower quantization error


def _spread_table(n, d, seed):
    """Uniform-ish vectors (no tight clusters) — PQ codes stay
    distinguishable, so recall measures approximation, not ties."""
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, (n, d))
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(x.ravel(), type=pa.float64()), d)
    return pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                     "embedding": arr}), x


def test_adc_ranking_parity():
    """The distributed search reproduces a local numpy ADC ranking
    exactly (quantization error aside — same codes, same LUT math)."""
    t, x = _spread_table(400, 16, seed=5)
    ds = rd.from_arrow(t)
    cb = pq_train(ds, m=4, n_codes=16, seed=9)
    qt = t.slice(0, 4)
    got = knn_cosine_pq(ds, qt, k=5, codebooks=cb).to_pandas()
    codes = pq_encode(ds, cb).to_pandas().sort_values("vec_id")
    c = np.stack([np.asarray(v) for v in codes.code])
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    for qid in range(4):
        q = xn[qid].reshape(4, 4)
        lut = np.einsum("jd,jcd->jc", q, cb)
        sim = sum(lut[j][c[:, j]] for j in range(4))
        sel = np.arange(len(sim)) != qid
        nid = np.arange(len(sim))[sel]
        s = sim[sel]
        order = np.lexsort((nid, -s))[:5]
        exp = nid[order].tolist()
        a = got.loc[got.query_id == qid].sort_values("rnk")
        assert a.neighbor_id.tolist() == exp, qid


def test_pq_recall_vs_exact():
    from halvesting_geometric_ray.functions.similarity import knn_cosine

    t, _ = _spread_table(600, 16, seed=2)
    ds = rd.from_arrow(t)
    qt = t.slice(0, 8)
    exact = knn_cosine(ds, qt, k=5).to_pandas()
    approx = knn_cosine_pq(ds, qt, k=10, m=8, n_codes=64).to_pandas()
    assert set(approx.query_id) == set(exact.query_id)
    recalls = []
    for qid in exact.query_id.unique():
        e = set(exact.loc[exact.query_id == qid, "neighbor_id"])
        a = set(approx.loc[approx.query_id == qid, "neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6, recalls
    # every query returns k ranked rows, self excluded
    g = approx.groupby("query_id")
    assert (g.size() == 10).all()
    assert (g.rnk.max() == 10).all()
    assert not (approx.query_id == approx.neighbor_id).any()


def test_dim_validation():
    t, _ = _emb_table(100, 10, seed=4)
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(rd.from_arrow(t), m=4, n_codes=8)
    with pytest.raises(ValueError, match="uint8"):
        pq_train(rd.from_arrow(t), m=2, n_codes=300)


# -------------------------------------------------- scalar (SQ8)

def test_sq_reconstruction_bound_and_determinism():
    from halvesting_geometric_ray.functions.quantization import (
        sq_decode, sq_encode, sq_train)
    from halvesting_geometric_ray.functions.similarity import _mat, _norm

    t, _ = _emb_table(400, 24, seed=7)
    ds = rd.from_arrow(t)
    lo, hi = sq_train(ds)
    lo2, hi2 = sq_train(ds)
    assert (lo == lo2).all() and (hi == hi2).all()
    codes = sq_encode(ds, lo, hi).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    _, mat = _mat(t, "embedding")
    x = _norm(mat)
    c = np.stack([np.asarray(v, dtype=np.uint8) for v in codes.code])
    rec = sq_decode(c, lo, hi)
    step = (hi - lo) / 255.0
    # encode rounds to the nearest grid point -> error <= step/2
    assert (np.abs(rec - x) <= step / 2 + 1e-12).all()


def test_sq_recall_vs_exact_and_layout_invariance():
    from halvesting_geometric_ray.functions.quantization import knn_cosine_sq
    from halvesting_geometric_ray.functions.similarity import knn_cosine

    t, _ = _spread_table(600, 16, seed=5)
    ds = rd.from_arrow(t)
    qt = t.slice(0, 8)
    exact = knn_cosine(ds, qt, k=5).to_pandas()
    approx = knn_cosine_sq(ds, qt, k=5).to_pandas()
    recalls = []
    for qid in exact.query_id.unique():
        e = set(exact.loc[exact.query_id == qid, "neighbor_id"])
        a = set(approx.loc[approx.query_id == qid, "neighbor_id"])
        recalls.append(len(e & a) / len(e))
    # 8-bit uniform grid on 16-dim: near-exact
    assert np.mean(recalls) >= 0.9, recalls
    assert not (approx.query_id == approx.neighbor_id).any()
    # layout invariance: same result from a repartitioned corpus
    approx2 = knn_cosine_sq(ds.repartition(7), qt, k=5).to_pandas()
    a1 = approx.sort_values(["query_id", "rnk"]).reset_index(drop=True)
    a2 = approx2.sort_values(["query_id", "rnk"]).reset_index(drop=True)
    assert a1.equals(a2)
