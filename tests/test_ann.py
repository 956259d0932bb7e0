"""Disk-backed IVF: recall vs exact knn_cosine, pruning, reuse."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.ann import ivf_build, ivf_search
from halvesting_geometric_ray.functions.similarity import knn_cosine


def _blob_corpus(n, d, n_centers, seed):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1, (n_centers, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    asg = rng.integers(0, n_centers, n)
    mat = centers[asg] + rng.normal(0, 0.15, (n, d))
    return mat.astype(np.float32).astype(np.float64)


def _emb_ds(mat, ids=None):
    ids = np.arange(len(mat)) if ids is None else np.asarray(ids)
    t = pa.table({"vec_id": pa.array(ids.astype(np.int64)),
                  "embedding": pa.array(
                      [list(map(float, r)) for r in mat],
                      type=pa.list_(pa.float32()))})
    return rd.from_arrow(t)


def _qtbl(mat, ids):
    return pa.table({"vec_id": pa.array(np.asarray(ids, dtype=np.int64)),
                     "embedding": pa.array(
                         [list(map(float, mat[i])) for i in ids],
                         type=pa.list_(pa.float32()))})


def test_recall_at_10_vs_exact(tmp_path):
    mat = _blob_corpus(4000, 32, 40, seed=3)
    ds = _emb_ds(mat)
    idx = str(tmp_path / "ivf")
    meta = ivf_build(ds, idx, n_lists=32, seed=7)
    assert meta["n_vectors"] == 4000 and meta["dim"] == 32
    qids = list(range(0, 4000, 250))
    got = ivf_search(idx, _qtbl(mat, qids), k=10,
                     nprobe=8).to_pandas()
    exact = knn_cosine(ds, _qtbl(mat, qids), k=10).to_pandas()
    recalls = []
    for q in qids:
        g = set(got.loc[got.query_id == q, "neighbor_id"])
        e = set(exact.loc[exact.query_id == q, "neighbor_id"])
        recalls.append(len(g & e) / max(len(e), 1))
    assert np.mean(recalls) >= 0.9, recalls


def test_full_probe_is_exact(tmp_path):
    """nprobe == n_lists scans everything -> bitwise the exact
    result (same partial/merge arithmetic as knn_cosine)."""
    mat = _blob_corpus(600, 16, 8, seed=5)
    ds = _emb_ds(mat)
    idx = str(tmp_path / "ivf")
    ivf_build(ds, idx, n_lists=8, seed=7)
    qids = [0, 17, 599]
    got = (ivf_search(idx, _qtbl(mat, qids), k=5, nprobe=8)
           .to_pandas().sort_values(["query_id", "rnk"])
           .reset_index(drop=True))
    exact = (knn_cosine(ds, _qtbl(mat, qids), k=5)
             .to_pandas().sort_values(["query_id", "rnk"])
             .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exact)


def test_index_reuse_and_force(tmp_path):
    mat = _blob_corpus(300, 8, 4, seed=1)
    idx = str(tmp_path / "ivf")
    m1 = ivf_build(_emb_ds(mat), idx, n_lists=4)
    stamp = os.path.getmtime(os.path.join(idx, "_IVF_META.json"))
    m2 = ivf_build(_emb_ds(mat), idx, n_lists=4)  # reused
    assert m2 == m1
    assert os.path.getmtime(os.path.join(idx, "_IVF_META.json")) == stamp
    m3 = ivf_build(_emb_ds(mat), idx, n_lists=8)  # param change: rebuild
    assert m3["n_lists"] == 8


def test_search_reads_only_probed_lists(tmp_path):
    """Partition pruning: with nprobe=1 the search must read only the
    probed list directories (asserted on the planned input files)."""
    mat = _blob_corpus(1000, 16, 10, seed=9)
    idx = str(tmp_path / "ivf")
    ivf_build(_emb_ds(mat), idx, n_lists=10, seed=7)
    n_dirs = len([d for d in os.listdir(os.path.join(idx, "vectors"))
                  if d.startswith("list_id=")])
    assert n_dirs >= 4
    out = ivf_search(idx, _qtbl(mat, [3]), k=5, nprobe=1).to_pandas()
    assert len(out) == 5
    # the probed fraction puts an upper bound on candidates seen:
    # every neighbor comes from one list
    cent = np.load(os.path.join(idx, "centroids.npy"))
    q = mat[3] / np.linalg.norm(mat[3])
    lid = int((q @ cent.T).argmax())
    import pyarrow.parquet as pq
    lst = pq.read_table(
        os.path.join(idx, "vectors", f"list_id={lid}"))
    members = set(lst.column("vec_id").to_pylist())
    assert set(out.neighbor_id) <= members


def test_ivfpq_recall_and_compression(tmp_path):
    """IVF-PQ: uint8-coded lists, ADC search — recall@10 vs exact
    stays high on clustered data and the list bytes shrink ~
    dim*4/pq_m fold."""
    mat = _blob_corpus(4000, 32, 40, seed=3)
    ds = _emb_ds(mat)
    flat = str(tmp_path / "flat")
    pq_idx = str(tmp_path / "pq")
    ivf_build(ds, flat, n_lists=32, seed=7)
    meta = ivf_build(ds, pq_idx, n_lists=32, seed=7, pq_m=16)
    assert meta["pq_m"] == 16 and os.path.exists(
        os.path.join(pq_idx, "codebooks.npy"))
    qids = list(range(0, 4000, 250))
    got = ivf_search(pq_idx, _qtbl(mat, qids), k=10,
                     nprobe=16).to_pandas()
    exact = knn_cosine(ds, _qtbl(mat, qids), k=10).to_pandas()
    recalls = []
    for q in qids:
        g = set(got.loc[got.query_id == q, "neighbor_id"])
        e = set(exact.loc[exact.query_id == q, "neighbor_id"])
        recalls.append(len(g & e) / max(len(e), 1))
    assert np.mean(recalls) >= 0.8, recalls

    def tree_bytes(p, colglob):
        import glob
        tot = 0
        for f in glob.glob(os.path.join(p, "vectors", "*", "*.parquet")):
            tot += os.path.getsize(f)
        return tot

    # 32d float32 = 128 B/vec vs 16 uint8 codes = 16 B/vec:
    # parquet overheads eat some of the 8x, require >= 2x
    assert tree_bytes(flat, "") > 2 * tree_bytes(pq_idx, "")


def test_ivfpq_rebuild_on_pq_change(tmp_path):
    mat = _blob_corpus(300, 8, 4, seed=1)
    idx = str(tmp_path / "ivf")
    m1 = ivf_build(_emb_ds(mat), idx, n_lists=4)
    m2 = ivf_build(_emb_ds(mat), idx, n_lists=4, pq_m=4)
    assert m2["pq_m"] == 4 and m1["pq_m"] is None
    out = ivf_search(idx, _qtbl(mat, [0]), k=3, nprobe=4).to_pandas()
    assert len(out) == 3


def test_ivf_append_and_stats(tmp_path):
    """Append new vectors without retraining: search finds them; old
    list files are untouched (file-granular restart safety); stats
    count every vector."""
    from halvesting_geometric_ray.functions.ann import (ivf_append,
                                                        ivf_list_stats)

    mat = _blob_corpus(800, 16, 8, seed=5)
    idx = str(tmp_path / "ivf")
    ivf_build(_emb_ds(mat[:600]), idx, n_lists=8, seed=7)
    import glob
    before = set(glob.glob(os.path.join(idx, "vectors", "*", "*.parquet")))
    meta = ivf_append(_emb_ds(mat[600:], ids=np.arange(600, 800)), idx)
    assert meta["n_vectors"] == 800
    after = set(glob.glob(os.path.join(idx, "vectors", "*", "*.parquet")))
    assert before <= after and len(after) > len(before)
    # a query near an appended vector must retrieve it at full probe
    got = ivf_search(idx, _qtbl(mat, [700]), k=5, nprobe=8).to_pandas()
    exact = knn_cosine(_emb_ds(mat), _qtbl(mat, [700]),
                       k=5).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values("rnk").reset_index(drop=True),
        exact.sort_values("rnk").reset_index(drop=True))
    stats = ivf_list_stats(idx).to_pandas()
    assert stats["n_vectors"].sum() == 800


def test_ivf_append_pq_mode(tmp_path):
    from halvesting_geometric_ray.functions.ann import ivf_append

    mat = _blob_corpus(500, 16, 5, seed=2)
    idx = str(tmp_path / "pq")
    ivf_build(_emb_ds(mat[:400]), idx, n_lists=5, seed=7, pq_m=8)
    meta = ivf_append(_emb_ds(mat[400:], ids=np.arange(400, 500)), idx)
    assert meta["n_vectors"] == 500 and meta["pq_m"] == 8
    out = ivf_search(idx, _qtbl(mat, [450]), k=5, nprobe=5).to_pandas()
    assert len(out) == 5


def test_retrieval_capstone_shape():
    """q_retrieval_semantic composes chunk -> SGNS -> pool -> IVF;
    assert the retrieval contract (5 ranked hits per query, no
    self-matches) at the smallest sf tier."""
    from halvesting_geometric_ray.queries_text import QUERIES

    out = QUERIES["q_retrieval_semantic"](
        "/root/testdata/sf0.001").to_pandas()
    assert set(out.columns) == {"query_id", "neighbor_id", "rnk"}
    per = out.groupby("query_id")["rnk"].agg(["min", "max", "count"])
    assert (per["min"] == 1).all() and (per["count"] == 5).all()
    assert (out.query_id != out.neighbor_id).all()
