"""Product quantization (PQ) for compressed embedding search.

Jégou, Douze & Schmid 2011 ("Product quantization for nearest neighbor
search"): split the d-dim embedding into m subspaces, k-means each
subspace to n_codes centroids, and store each vector as m uint8 codes —
d x 8 bytes shrink to m bytes, and search runs over the CODES with a
per-query lookup table (ADC), never touching the raw vectors.  This is
the memory-scale path of the similarity suite: brute-force (exact) ->
LSH / IVF (prune candidates) -> PQ (compress the corpus itself).

Shapes:
- pq_train: codebooks learned DRIVER-SIDE on a seeded sample (the
  ivf_centroids / BPE train-on-sample precedent — tokenizer-sized
  models train on samples, apply corpus-wide); deterministic given
  (seed, data).
- pq_encode: one streaming pass, per-batch argmin over each subspace
  (vectorized matmul); output (vec_id, code fixed_size_list<uint8, m>).
- knn_cosine_pq: per-query LUT = q-subvector . codebook^T (m x n_codes
  floats, broadcast via ray.put); each code batch approximates inner
  products with m vectorized gathers + a sum, keeps a partial top-k;
  one grouped final merge per query (the knn_cosine_ivf plan).

Vectors are L2-normalized before training/encoding, so the
reconstructed inner product approximates cosine similarity — same
semantics as the rest of the knn family.  Recall vs the exact baseline
is pinned in tests/test_quantization.py.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray

from .similarity import _mat, _norm


def _split(m_mat: np.ndarray, m: int):
    d = m_mat.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    return m_mat.reshape(len(m_mat), m, d // m)


def pq_train(embeddings, m: int = 4, n_codes: int = 16, *,
             col: str = "embedding", seed: int = 13,
             sample_size: int = 4096, iters: int = 10) -> np.ndarray:
    """Learn PQ codebooks (m, n_codes, d/m) on a seeded sample."""
    if n_codes < 1 or n_codes > 256:
        raise ValueError("n_codes must be in [1, 256] (uint8 codes)")
    tbl = pa.concat_tables(list(
        embeddings.limit(sample_size).iter_batches(
            batch_format="pyarrow", batch_size=sample_size)))
    _, mat = _mat(tbl, col)
    sub = _split(_norm(mat), m)
    rng = np.random.default_rng(seed)
    books = []
    for j in range(m):
        x = sub[:, j, :]
        cent = x[rng.choice(len(x), size=min(n_codes, len(x)),
                            replace=False)].copy()
        for _ in range(iters):
            d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(len(cent)):
                sel = x[assign == c]
                if len(sel):
                    cent[c] = sel.mean(axis=0)
        books.append(cent)
    return np.stack(books)


def pq_encode(embeddings, codebooks: np.ndarray, *,
              col: str = "embedding", id_col: str = "vec_id",
              out_col: str = "code"):
    """One streaming pass: each vector -> m uint8 codes."""
    cb = np.ascontiguousarray(codebooks, dtype=np.float64)
    m = cb.shape[0]
    ref = ray.put(cb)

    def enc(b: pa.Table) -> pa.Table:
        books = ray.get(ref)
        _, mat = _mat(b, col)
        sub = _split(_norm(mat), m)
        codes = np.empty((len(mat), m), dtype=np.uint8)
        for j in range(m):
            x = sub[:, j, :]
            c = books[j]
            d2 = (c * c).sum(axis=1)[None, :] - 2.0 * (x @ c.T)
            codes[:, j] = d2.argmin(axis=1).astype(np.uint8)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(codes.ravel(), type=pa.uint8()), m)
        return pa.table({id_col: b.column(id_col), out_col: arr})

    return embeddings.map_batches(enc, batch_format="pyarrow",
                                  zero_copy_batch=True)


def knn_cosine_pq(embeddings, query_table: pa.Table, k: int = 5, *,
                  col: str = "embedding", m: int = 4, n_codes: int = 16,
                  seed: int = 13,
                  codebooks: Optional[np.ndarray] = None):
    """Approximate top-k cosine neighbors via ADC over PQ codes.
    Returns (query_id, neighbor_id, rnk); self-matches excluded.
    Recall vs knn_cosine pinned in tests."""
    cb = codebooks if codebooks is not None else \
        pq_train(embeddings, m, n_codes, col=col, seed=seed)
    m = cb.shape[0]
    codes = pq_encode(embeddings, cb, col=col)
    q_ids, q_mat = _mat(query_table, col)
    qn = _split(_norm(q_mat), m)                    # (nq, m, dsub)
    # per-query lookup tables: lut[q, j, c] = q_sub . codebook[j, c]
    lut = np.einsum("qjd,jcd->qjc", qn, cb)
    ref = ray.put((q_ids, lut))

    def partial_fn(b: pa.Table) -> pa.Table:
        qi, tables = ray.get(ref)
        ids = b.column("vec_id").to_numpy()
        code_col = b.column("code")
        if isinstance(code_col, pa.ChunkedArray):
            code_col = code_col.combine_chunks()
        codes_np = np.asarray(code_col.flatten(), dtype=np.uint8) \
            .reshape(len(ids), -1)
        out_q, out_n, out_s = [], [], []
        for qj, qid in enumerate(qi):
            sim = np.zeros(len(ids), dtype=np.float64)
            t = tables[qj]
            for j in range(codes_np.shape[1]):
                sim += t[j][codes_np[:, j]]
            kk = min(k + 1, len(ids))
            top = np.argpartition(-sim, kk - 1)[:kk] if len(ids) > kk \
                else np.arange(len(ids))
            out_q.append(np.full(len(top), qid, dtype=np.int64))
            out_n.append(ids[top])
            out_s.append(sim[top])
        if not out_q:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "neighbor_id": pa.array([], type=pa.int64()),
                             "sim": pa.array([], type=pa.float64())})
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "neighbor_id": pa.array(np.concatenate(out_n)),
                         "sim": pa.array(np.concatenate(out_s))})

    partial = codes.map_batches(partial_fn, batch_format="pyarrow",
                                zero_copy_batch=True, batch_size=4096)

    def final(g: pa.Table) -> pa.Table:
        qid = g.column("query_id").to_numpy()
        nid = g.column("neighbor_id").to_numpy()
        sim = g.column("sim").to_numpy()
        sel = nid != qid[0]
        nid, sim = nid[sel], sim[sel]
        order = np.lexsort((nid, -sim))[:k]
        return pa.table({
            "query_id": pa.array(np.full(len(order), qid[0],
                                         dtype=np.int64)),
            "neighbor_id": pa.array(nid[order]),
            "rnk": pa.array(np.arange(1, len(order) + 1,
                                      dtype=np.int64)),
        })

    return partial.groupby("query_id").map_groups(
        final, batch_format="pyarrow", retry_exceptions=True)


# ---------------------------------------------------------------------------
# Scalar quantization (SQ8) — the uniform per-dimension baseline
# ---------------------------------------------------------------------------

def sq_train(embeddings, *, col: str = "embedding") -> Tuple[np.ndarray,
                                                             np.ndarray]:
    """Per-dimension (lo, hi) ranges of the L2-NORMALIZED vectors from
    one exact streaming min/max pass (per-batch partials folded on the
    driver — O(d) state, no sample needed, deterministic)."""

    def partial(b: pa.Table) -> pa.Table:
        _, mat = _mat(b, col)
        x = _norm(mat)
        return pa.table({
            "lo": pa.array([x.min(axis=0).tobytes()]),
            "hi": pa.array([x.max(axis=0).tobytes()]),
            "d": pa.array([x.shape[1]], type=pa.int64())})

    parts = embeddings.map_batches(partial, batch_format="pyarrow",
                                   zero_copy_batch=True).to_pandas()
    d = int(parts["d"].iloc[0])
    los = np.stack([np.frombuffer(v, dtype=np.float64)
                    for v in parts["lo"]])
    his = np.stack([np.frombuffer(v, dtype=np.float64)
                    for v in parts["hi"]])
    assert los.shape[1] == d
    return los.min(axis=0), his.max(axis=0)


def sq_encode(embeddings, lo: np.ndarray, hi: np.ndarray, *,
              col: str = "embedding", id_col: str = "vec_id",
              out_col: str = "code"):
    """One streaming pass: normalized vector -> d uint8 codes, uniform
    per-dim grid code = round((x - lo) / (hi - lo) * 255); constant
    dims (hi == lo) encode 0.  8x smaller than float64 storage with a
    reconstruction error <= step/2 per dim (pinned in tests)."""
    lo = np.asarray(lo, dtype=np.float64)
    span = np.asarray(hi, dtype=np.float64) - lo
    inv = np.where(span > 0, 255.0 / np.where(span > 0, span, 1.0), 0.0)
    ref = ray.put((lo, inv))
    d = len(lo)

    def enc(b: pa.Table) -> pa.Table:
        lo_, inv_ = ray.get(ref)
        _, mat = _mat(b, col)
        x = _norm(mat)
        codes = np.clip(np.rint((x - lo_) * inv_), 0, 255).astype(np.uint8)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(codes.ravel(), type=pa.uint8()), d)
        return pa.table({id_col: b.column(id_col), out_col: arr})

    return embeddings.map_batches(enc, batch_format="pyarrow",
                                  zero_copy_batch=True)


def sq_decode(codes: np.ndarray, lo: np.ndarray,
              hi: np.ndarray) -> np.ndarray:
    """uint8 codes -> reconstructed float64 vectors (grid midpoints of
    the encode rule's rounding — i.e. the code's grid point)."""
    lo = np.asarray(lo, dtype=np.float64)
    span = np.asarray(hi, dtype=np.float64) - lo
    return lo + codes.astype(np.float64) * (span / 255.0)


def knn_cosine_sq(embeddings, query_table: pa.Table, k: int = 5, *,
                  col: str = "embedding",
                  ranges: Optional[Tuple[np.ndarray, np.ndarray]] = None):
    """Approximate top-k cosine neighbors over SQ8 codes: corpus codes
    are decoded per batch (vectorized) and scored with one matmul
    against the broadcast normalized query matrix — the asymmetric-
    distance plan (queries stay exact).  Same output contract as
    knn_cosine_pq: (query_id, neighbor_id, rnk), self-matches
    excluded; recall vs the exact baseline pinned in
    tests/test_quantization.py."""
    lo, hi = ranges if ranges is not None else sq_train(embeddings,
                                                        col=col)
    codes = sq_encode(embeddings, lo, hi, col=col)
    q_ids, q_mat = _mat(query_table, col)
    qn = _norm(q_mat)
    ref = ray.put((q_ids, qn, lo, hi))

    def partial_fn(b: pa.Table) -> pa.Table:
        qi, qm, lo_, hi_ = ray.get(ref)
        ids = b.column("vec_id").to_numpy()
        code_col = b.column("code")
        if isinstance(code_col, pa.ChunkedArray):
            code_col = code_col.combine_chunks()
        codes_np = np.asarray(code_col.flatten(), dtype=np.uint8) \
            .reshape(len(ids), -1)
        rec = sq_decode(codes_np, lo_, hi_)
        sim_all = qm @ rec.T                         # (nq, batch)
        out_q, out_n, out_s = [], [], []
        kk = min(k + 1, len(ids))
        for qj, qid in enumerate(qi):
            sim = sim_all[qj]
            top = np.argpartition(-sim, kk - 1)[:kk] if len(ids) > kk \
                else np.arange(len(ids))
            out_q.append(np.full(len(top), qid, dtype=np.int64))
            out_n.append(ids[top])
            out_s.append(sim[top])
        if not out_q:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "neighbor_id": pa.array([], type=pa.int64()),
                             "sim": pa.array([], type=pa.float64())})
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "neighbor_id": pa.array(np.concatenate(out_n)),
                         "sim": pa.array(np.concatenate(out_s))})

    partial = codes.map_batches(partial_fn, batch_format="pyarrow",
                                zero_copy_batch=True, batch_size=4096)

    def final(g: pa.Table) -> pa.Table:
        qid = g.column("query_id").to_numpy()
        nid = g.column("neighbor_id").to_numpy()
        sim = g.column("sim").to_numpy()
        sel = nid != qid[0]
        nid, sim = nid[sel], sim[sel]
        order = np.lexsort((nid, -sim))[:k]
        return pa.table({
            "query_id": pa.array(np.full(len(order), qid[0],
                                         dtype=np.int64)),
            "neighbor_id": pa.array(nid[order]),
            "rnk": pa.array(np.arange(1, len(order) + 1,
                                      dtype=np.int64)),
        })

    return partial.groupby("query_id").map_groups(
        final, batch_format="pyarrow", retry_exceptions=True)
