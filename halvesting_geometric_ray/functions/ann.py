"""Disk-backed IVF index — the persisted, partition-pruned ANN layer.

The existing ANN family (functions/similarity.py LSH/IVF,
functions/quantization.py PQ/SQ) re-buckets the corpus on every query
call; at 10^9+ vectors the production shape is BUILD ONCE / QUERY MANY
with the index on disk and each query touching only its probed
fraction:

  build:  coarse centroids (sample k-means, the FAISS convention) ->
          one assignment map_batches (argmax over the broadcast
          centroid matrix) -> hive-partitioned parquet, one directory
          per inverted list (sources/readers.py::
          write_partitioned_parquet — the repo's resumable sink);
  search: load the tiny centroid model, pick each query's ``nprobe``
          nearest lists, read ONLY the union of probed list
          directories (partition pruning at the read — unprobed bytes
          never leave storage), one partial-top-k map_batches with a
          per-row probed-list mask, and a per-query groupby merge.

Scale shape: the index build is one streaming pass + partitioned
write; a search reads nprobe/n_lists of the corpus and exchanges
(queries x k) candidate rows.  Driver state: the (n_lists x dim)
centroid matrix and the final (queries x k) result.

Reference anchor: the reference has no ANN surface; this is the brief
requirement (similarity search: IVF as the scale path) upgraded to a
persisted index.  Recall vs exact pinned in tests/test_ann.py;
1M-vector ladder in BASELINE.md.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import pyarrow as pa

import ray

from .similarity import _mat, _norm, ivf_centroids

_META = "_IVF_META.json"


def ivf_build(embeddings, index_dir: str, *, n_lists: int = 64,
              col: str = "embedding", seed: int = 13,
              train_sample: int = 65536, kmeans_iters: int = 10,
              force: bool = False) -> dict:
    """Build (or reuse) a disk-backed IVF index under ``index_dir``.

    Layout: ``{index_dir}/centroids.npy`` (n_lists x dim float64,
    L2-normalized), ``{index_dir}/vectors/list_id=N/*.parquet`` rows
    (lid, vec_id, embedding) — ``lid`` duplicates the partition value
    as a data column so pruned reads of explicit subdirectories keep
    it without hive reconstruction.  Returns the meta dict.  A
    finished index (meta present, same n_lists/col) is reused unless
    ``force`` — the resumable-build convention of graph/csr.py.
    """
    meta_path = os.path.join(index_dir, _META)
    if not force and os.path.exists(meta_path):
        meta = json.load(open(meta_path))
        if meta["n_lists"] == n_lists and meta["col"] == col:
            return meta
    import shutil

    shutil.rmtree(index_dir, ignore_errors=True)
    os.makedirs(index_dir, exist_ok=True)

    emb = embeddings.select_columns(["vec_id", col])
    cent = ivf_centroids(emb, n_centroids=n_lists, col=col, seed=seed,
                         iters=kmeans_iters, sample_size=train_sample)
    cref = ray.put(cent)

    def assign(b: pa.Table) -> pa.Table:
        c = ray.get(cref)
        ids, m = _mat(b, col)
        lid = (_norm(m) @ c.T).argmax(axis=1).astype(np.int64)
        return pa.table({
            "list_id": pa.array(lid),
            "lid": pa.array(lid),
            "vec_id": b.column("vec_id"),
            col: b.column(col)})

    from ..sources.readers import write_partitioned_parquet

    write_partitioned_parquet(
        emb.map_batches(assign, batch_format="pyarrow",
                        zero_copy_batch=True),
        os.path.join(index_dir, "vectors"), partition_cols=["list_id"])
    np.save(os.path.join(index_dir, "centroids.npy"), cent)
    n = int(emb.count())
    meta = {"n_lists": int(len(cent)), "dim": int(cent.shape[1]),
            "col": col, "n_vectors": n, "seed": int(seed)}
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return meta


def ivf_search(index_dir: str, query_table: pa.Table, k: int = 10,
               *, nprobe: int = 8, col: Optional[str] = None):
    """Top-k cosine neighbors of each query row (vec_id, embedding)
    against a built index.  Returns a Dataset (query_id, neighbor_id,
    rnk) — same contract as similarity.knn_cosine (rnk 1..k by
    sim desc, neighbor_id asc; self-matches excluded).  Only the union
    of the queries' probed list directories is read."""
    import ray.data as rd

    meta = json.load(open(os.path.join(index_dir, _META)))
    col = col or meta["col"]
    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    n_lists = len(cent)
    nprobe = min(nprobe, n_lists)

    q_ids, q_mat = _mat(query_table, col)
    qn = _norm(q_mat)
    # each query's nprobe nearest lists; probed[q, l] mask
    order = np.argsort(-(qn @ cent.T), axis=1, kind="stable")
    probe = order[:, :nprobe]
    probed = np.zeros((len(q_ids), n_lists), dtype=bool)
    probed[np.arange(len(q_ids))[:, None], probe] = True
    union = np.flatnonzero(probed.any(axis=0))
    import glob as _glob

    # explicit file lists: Ray's read_parquet expands a single base
    # dir but not a LIST of directories
    dirs = [f for l in union for f in sorted(_glob.glob(os.path.join(
        index_dir, "vectors", f"list_id={int(l)}", "*.parquet")))]
    if not dirs:
        return rd.from_arrow(pa.table(
            {"query_id": pa.array([], type=pa.int64()),
             "neighbor_id": pa.array([], type=pa.int64()),
             "rnk": pa.array([], type=pa.int64())}))
    qref = ray.put((q_ids, qn, probed))

    def partial_fn(b: pa.Table) -> pa.Table:
        ids_q, q, pr = ray.get(qref)
        ids, m = _mat(b, col)
        lids = b.column("lid").to_numpy()
        sims = _norm(m) @ q.T  # (rows, nq)
        mask = pr[:, lids].T  # (rows, nq): row in query's probed set
        sims = np.where(mask, sims, -np.inf)
        kk = min(k + 1, len(ids))
        out_q, out_n, out_s = [], [], []
        for j, qid in enumerate(ids_q):
            s = sims[:, j]
            top = (np.argpartition(-s, kk - 1)[:kk]
                   if len(ids) > kk else np.arange(len(ids)))
            keep = s[top] > -np.inf
            top = top[keep]
            out_q.append(np.full(len(top), qid, dtype=np.int64))
            out_n.append(ids[top])
            out_s.append(s[top])
        if not out_q:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "neighbor_id": pa.array([], type=pa.int64()),
                             "sim": pa.array([], type=pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "neighbor_id": pa.array(np.concatenate(out_n)),
            "sim": pa.array(np.concatenate(out_s),
                            type=pa.float64())})

    partial = rd.read_parquet(
        dirs, columns=["lid", "vec_id", col]).map_batches(
        partial_fn, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=4096)

    def final(g: pa.Table) -> pa.Table:
        qid = g.column("query_id").to_numpy()
        nid = g.column("neighbor_id").to_numpy()
        sim = g.column("sim").to_numpy()
        m = nid != qid[0]
        nid, sim = nid[m], sim[m]
        order = np.lexsort((nid, -sim))[:k]
        return pa.table({
            "query_id": pa.array(np.full(len(order), qid[0],
                                         dtype=np.int64)),
            "neighbor_id": pa.array(nid[order]),
            "rnk": pa.array(np.arange(1, len(order) + 1,
                                      dtype=np.int64))})

    return partial.groupby("query_id").map_groups(
        final, batch_format="pyarrow", retry_exceptions=True)
