"""Feature hashing (the "hashing trick"): text -> fixed-dim vectors.

Weinberger et al. 2009 — each token/bigram hashes to a dimension index
and a ±1 sign; counts accumulate and the vector L2-normalizes.  The
cheap, vocabulary-free featurizer for quality classifiers and as a
text-derived input to the ANN suite (functions/similarity.py consumes
the same list<float> layout as the embeddings table).

Scale shape: stateless per-batch kernel, zero exchanges — tokenize with
the polars Rust splitter, hash the flat token array once
(stable_hash64), derive bigram hashes by pair-mixing consecutive token
hashes (masking doc boundaries), scatter-add into a (docs_in_batch x
dim) block and normalize.  Memory per task = batch_rows x dim floats —
size ``dim``/batch accordingly (dense output by design: downstream ANN
kernels want dense matrices).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import stable_hash64

_MIX = np.uint64(0x9E3779B97F4A7C15)


def hash_features_batch(b: pa.Table, dim: int, id_col: str = "doc_id",
                        text_col: str = "text", bigrams: bool = True,
                        signed: bool = True) -> pa.Table:
    import polars as pl

    if b.num_rows == 0:
        return pa.table({id_col: pa.array([], type=pa.int64()),
                         "features": pa.array([], type=pa.list_(
                             pa.float64()))})
    df = pl.from_arrow(b.select([id_col, text_col]))
    toks = (df.with_columns(pl.col(text_col).str.split(" ").alias("t"))
            .select(pl.col("t").list.len().alias("n"), pl.col("t")))
    lens = toks["n"].to_numpy().astype(np.int64)
    ex = toks.select(pl.col("t").explode().alias("tok"),
                     pl.col("t").explode().str.len_bytes().alias("l"))
    flat = ex["tok"]
    vlen = ex["l"].fill_null(0).to_numpy().astype(np.int64)
    valid = vlen > 0
    h = np.asarray(stable_hash64(flat.to_arrow())).astype(np.uint64) \
        if len(flat) else np.zeros(0, dtype=np.uint64)
    doc_of = np.repeat(np.arange(len(lens)), lens)

    idxs, signs, docs = [], [], []

    def emit(hs, mask, dsel):
        with np.errstate(over="ignore"):
            mixed = (hs * _MIX) ^ (hs >> np.uint64(29))
        idxs.append((mixed % np.uint64(dim)).astype(np.int64)[mask])
        s = np.where((mixed >> np.uint64(63)) & np.uint64(1), -1.0, 1.0) \
            if signed else np.ones(len(mixed))
        signs.append(s[mask])
        docs.append(dsel[mask])

    emit(h, valid, doc_of)
    if bigrams and len(h) > 1:
        with np.errstate(over="ignore"):
            bh = h[:-1] * np.uint64(1000003) + h[1:]
        same_doc = doc_of[:-1] == doc_of[1:]
        bmask = same_doc & valid[:-1] & valid[1:]
        emit(bh, bmask, doc_of[:-1])

    mat = np.zeros((len(lens), dim))
    if idxs:
        ii = np.concatenate(idxs)
        ss = np.concatenate(signs)
        dd = np.concatenate(docs)
        np.add.at(mat, (dd, ii), ss)
    norms = np.linalg.norm(mat, axis=1)
    mat = mat / np.where(norms == 0, 1.0, norms)[:, None]

    offs = pa.array(np.arange(len(lens) + 1, dtype=np.int32) * dim)
    return pa.table({
        id_col: b.column(id_col).cast(pa.int64()),
        "features": pa.ListArray.from_arrays(
            offs, pa.array(mat.ravel(), type=pa.float64())),
    })


def hash_features(docs, dim: int = 256, id_col: str = "doc_id",
                  text_col: str = "text", bigrams: bool = True,
                  signed: bool = True):
    """Dataset wrapper: appends nothing — returns (id, features) with
    features a length-``dim`` L2-normalized list<float64>."""
    if dim < 2:
        raise ValueError("dim must be >= 2")
    return docs.map_batches(
        lambda b: hash_features_batch(b, dim, id_col, text_col,
                                      bigrams, signed),
        batch_format="pyarrow", zero_copy_batch=True)
