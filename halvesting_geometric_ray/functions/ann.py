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
              pq_m: Optional[int] = None, pq_codes: int = 256,
              force: bool = False) -> dict:
    """Build (or reuse) a disk-backed IVF index under ``index_dir``.

    Layout: ``{index_dir}/centroids.npy`` (n_lists x dim float64,
    L2-normalized), ``{index_dir}/vectors/list_id=N/*.parquet`` rows
    (lid, vec_id, embedding) — ``lid`` duplicates the partition value
    as a data column so pruned reads of explicit subdirectories keep
    it without hive reconstruction.  Returns the meta dict.  A
    finished index (meta present, same n_lists/col/pq) is reused
    unless ``force`` — the resumable-build convention of graph/csr.py.

    ``pq_m``: store each list as ``pq_m`` uint8 PQ codes per vector
    instead of the float embedding (the FAISS-IVFPQ shape, ~dim*4/pq_m
    x smaller lists; codebooks from functions/quantization.py::
    pq_train on the L2-normalized vectors — the raw-vector PQ variant,
    no residual encoding, documented simplification).  Search then
    scans by ADC lookup tables; recall vs exact pinned in
    tests/test_ann.py.  Trade-off (measured, BASELINE.md 1M ladder):
    PQ is the COMPRESSION path — on tie-heavy corpora ADC reorders
    near-equal neighbors (recall@10 drops while the returned
    neighbors stay within ~0.03 cosine of the exact set); use the
    flat index when exact-set recall matters.  A FAISS-style refine
    stage would need a random-access raw-vector store, which parquet
    lists don't give — deliberately not implemented.
    """
    meta_path = os.path.join(index_dir, _META)
    if not force and os.path.exists(meta_path):
        meta = json.load(open(meta_path))
        if (meta["n_lists"] == n_lists and meta["col"] == col
                and meta.get("pq_m") == pq_m):
            return meta
    import shutil

    shutil.rmtree(index_dir, ignore_errors=True)
    os.makedirs(index_dir, exist_ok=True)

    emb = embeddings.select_columns(["vec_id", col])
    cent = ivf_centroids(emb, n_centroids=n_lists, col=col, seed=seed,
                         iters=kmeans_iters, sample_size=train_sample)
    cref = ray.put(cent)
    books = None
    if pq_m is not None:
        from .quantization import pq_train

        books = pq_train(emb, pq_m, pq_codes, col=col, seed=seed,
                         sample_size=min(train_sample, 16384))
        bref = ray.put(np.ascontiguousarray(books, dtype=np.float64))

    def assign(b: pa.Table) -> pa.Table:
        c = ray.get(cref)
        ids, m = _mat(b, col)
        mn = _norm(m)
        lid = (mn @ c.T).argmax(axis=1).astype(np.int64)
        cols = {"list_id": pa.array(lid), "lid": pa.array(lid),
                "vec_id": b.column("vec_id")}
        if pq_m is None:
            cols[col] = b.column(col)
        else:
            from .quantization import _split

            bk = ray.get(bref)
            sub = _split(mn, bk.shape[0])
            codes = np.empty((len(mn), bk.shape[0]), dtype=np.uint8)
            for j in range(bk.shape[0]):
                x = sub[:, j, :]
                cj = bk[j]
                d2 = (cj * cj).sum(axis=1)[None, :] - 2.0 * (x @ cj.T)
                codes[:, j] = d2.argmin(axis=1).astype(np.uint8)
            cols["code"] = pa.FixedSizeListArray.from_arrays(
                pa.array(codes.ravel(), type=pa.uint8()), bk.shape[0])
        return pa.table(cols)

    from ..sources.readers import write_partitioned_parquet

    write_partitioned_parquet(
        emb.map_batches(assign, batch_format="pyarrow",
                        zero_copy_batch=True),
        os.path.join(index_dir, "vectors"), partition_cols=["list_id"])
    np.save(os.path.join(index_dir, "centroids.npy"), cent)
    if books is not None:
        np.save(os.path.join(index_dir, "codebooks.npy"), books)
    n = int(emb.count())
    meta = {"n_lists": int(len(cent)), "dim": int(cent.shape[1]),
            "col": col, "n_vectors": n, "seed": int(seed),
            "pq_m": pq_m, "pq_codes": (pq_codes if pq_m else None)}
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return meta


def ivf_append(embeddings, index_dir: str) -> dict:
    """Append new vectors to a BUILT index without retraining — the
    daily-recrawl shape: assign against the saved centroids (and PQ
    codebooks when present), write NEW parquet files into the existing
    list directories (existing files untouched — the append is
    restart-safe at file granularity), bump meta n_vectors.

    The coarse quantizer is frozen, so list balance drifts as the
    corpus drifts — rebuild (force=True) when the skew report says
    so.  Caller contract: vec_ids must not collide with existing ones
    (ids are not checked — an id-space audit is one grouped count).
    Returns the updated meta."""
    meta_path = os.path.join(index_dir, _META)
    meta = json.load(open(meta_path))
    col = meta["col"]
    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    cref = ray.put(cent)
    pq_m = meta.get("pq_m")
    if pq_m is not None:
        books = np.load(os.path.join(index_dir, "codebooks.npy"))
        bref = ray.put(np.ascontiguousarray(books, dtype=np.float64))

    emb = embeddings.select_columns(["vec_id", col])

    def assign(b: pa.Table) -> pa.Table:
        c = ray.get(cref)
        ids, m = _mat(b, col)
        mn = _norm(m)
        lid = (mn @ c.T).argmax(axis=1).astype(np.int64)
        cols = {"list_id": pa.array(lid), "lid": pa.array(lid),
                "vec_id": b.column("vec_id")}
        if pq_m is None:
            cols[col] = b.column(col)
        else:
            from .quantization import _split

            bk = ray.get(bref)
            sub = _split(mn, bk.shape[0])
            codes = np.empty((len(mn), bk.shape[0]), dtype=np.uint8)
            for j in range(bk.shape[0]):
                x = sub[:, j, :]
                cj = bk[j]
                d2 = (cj * cj).sum(axis=1)[None, :] - 2.0 * (x @ cj.T)
                codes[:, j] = d2.argmin(axis=1).astype(np.uint8)
            cols["code"] = pa.FixedSizeListArray.from_arrays(
                pa.array(codes.ravel(), type=pa.uint8()), bk.shape[0])
        return pa.table(cols)

    from ..sources.readers import write_partitioned_parquet

    write_partitioned_parquet(
        emb.map_batches(assign, batch_format="pyarrow",
                        zero_copy_batch=True),
        os.path.join(index_dir, "vectors"), partition_cols=["list_id"])
    meta["n_vectors"] = int(meta["n_vectors"]) + int(emb.count())
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return meta


def ivf_list_stats(index_dir: str):
    """List-balance diagnostics of a built index: one row per
    inverted list (lid, n_vectors) as a Dataset — feed to
    ops/sketch.py::key_skew_report or eyeball max/avg; heavy skew
    means the frozen quantizer has drifted and the index wants a
    rebuild."""
    import glob as _glob

    import ray.data as rd

    files = sorted(_glob.glob(os.path.join(index_dir, "vectors",
                                           "list_id=*", "*.parquet")))
    ds = rd.read_parquet(files, columns=["lid"])
    from ..ops.agg import grouped_aggregate

    return grouped_aggregate(ds, ["lid"],
                             {"n_vectors": ("count", None)})


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
    pq_m = meta.get("pq_m")
    lut = None
    if pq_m is not None:
        books = np.load(os.path.join(index_dir, "codebooks.npy"))

    q_ids, q_mat = _mat(query_table, col)
    qn = _norm(q_mat)
    if pq_m is not None:
        from .quantization import _split

        qs = _split(qn, books.shape[0])  # (nq, m, dsub)
        # ADC lookup tables: lut[q, j, c] = q_sub_j . codebook[j, c]
        lut = np.einsum("qjd,jcd->qjc", qs, books)
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
    qref = ray.put((q_ids, qn, probed, lut))

    def partial_fn(b: pa.Table) -> pa.Table:
        ids_q, q, pr, tables = ray.get(qref)
        lids = b.column("lid").to_numpy()
        if tables is None:
            ids, m = _mat(b, col)
            sims = _norm(m) @ q.T  # (rows, nq)
        else:  # ADC over the stored uint8 codes
            ids = b.column("vec_id").to_numpy()
            cc = b.column("code")
            if isinstance(cc, pa.ChunkedArray):
                cc = cc.combine_chunks()
            codes = np.asarray(cc.flatten(), dtype=np.uint8).reshape(
                len(ids), -1)
            sims = np.zeros((len(ids), len(ids_q)), dtype=np.float64)
            for j in range(codes.shape[1]):
                # tables[:, j, :] is (nq, n_codes); fancy-index by the
                # rows' j-th code then accumulate
                sims += tables[:, j, :][:, codes[:, j]].T
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

    read_cols = ["lid", "vec_id"] + (["code"] if pq_m is not None
                                     else [col])
    partial = rd.read_parquet(dirs, columns=read_cols).map_batches(
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
