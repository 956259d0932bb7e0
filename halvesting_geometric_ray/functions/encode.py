"""Vocabulary build + corpus encoding: text -> int32 token-id lists.

The "tokenize the corpus for training" step that sits between the
curation chain (pipelines/curation.py) and the packing manifest
(functions/pack.py): a deterministic frequency vocabulary (id 0 = most
frequent; ties token-asc; id V = UNK) built from one vocab-bounded
count exchange, then a stateless encode pass.

Scale shape mirrors functions/lm.py's unigram build: per-batch token
count partials -> grouped sum (combiner-first; exchange ~vocab x
blocks) -> per-block top-V pruning -> driver picks the global top-V
(vocab-sized, small) -> broadcast (sorted token-hash, id) arrays ->
encode is a zero-exchange vectorized map (hash + searchsorted per
batch).  Token identity is the stable 64-bit hash — same
accepted-collision model as ops/ids.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..ops.agg import grouped_aggregate
from .hashing import stable_hash64


def build_vocab(docs, text_col: str = "text", vocab_size: int = 65536,
                num_parts: int = 16, hash_seed: int = 42):
    """Returns (vocab_table, ref): vocab_table is a pa.Table
    (token, token_id, n) with ids dense 0..V-1 in (count desc, token
    asc) order; ref is a ray.put of (sorted token-hash array, id array,
    unk_id = V) for the encode pass."""
    import polars as pl

    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")

    def tok_partial(b: pa.Table) -> pa.Table:
        df = (pl.from_arrow(b.select([text_col]))
              .with_columns(pl.col(text_col).str.extract_all(r"\S+")
                            .alias("__t"))
              .select(pl.col("__t").explode().alias("tok"))
              .drop_nulls()
              .group_by("tok").len(name="n"))
        return df.to_arrow().cast(pa.schema([
            pa.field("tok", pa.string()), pa.field("n", pa.int64())]))

    counts = grouped_aggregate(
        docs.map_batches(tok_partial, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["tok"], {"n": ("sum", "n")}, num_parts=num_parts)

    def top_partial(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).sort(["n", "tok"], descending=[True, False])
        return df.head(vocab_size).to_arrow().cast(b.schema)

    top = (counts.map_batches(top_partial, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas())
    if len(top):
        top = (top.sort_values(["n", "tok"], ascending=[False, True])
               .head(vocab_size).reset_index(drop=True))
        toks = top["tok"].to_numpy()
        ns = top["n"].to_numpy().astype(np.int64)
    else:
        toks = np.empty(0, dtype=object)
        ns = np.empty(0, dtype=np.int64)
    V = len(toks)
    ids = np.arange(V, dtype=np.int32)
    vocab_table = pa.table({
        "token": pa.array(toks, type=pa.string()),
        "token_id": pa.array(ids, type=pa.int32()),
        "n": pa.array(ns)})
    h = np.asarray(stable_hash64(vocab_table.column("token"),
                                 seed=hash_seed)) if V else \
        np.empty(0, dtype=np.int64)
    order = np.argsort(h, kind="stable")
    ref = ray.put((h[order], ids[order], np.int32(V)))
    return vocab_table, ref


def encode_docs(docs, ref, id_col: str = "doc_id",
                text_col: str = "text", hash_seed: int = 42):
    """Encode each doc's whitespace tokens to int32 ids against a
    built vocabulary ``ref`` (OOV -> unk_id).  Zero exchanges; output
    (doc_id, ids list<int32>, n_tokens)."""
    import polars as pl

    def encode(b: pa.Table) -> pa.Table:
        hs, vid, unk = ray.get(ref)
        df = (pl.from_arrow(b.select([id_col, text_col]))
              .with_columns(pl.col(text_col).str.extract_all(r"\S+")
                            .alias("__t")))
        lens = df["__t"].list.len().fill_null(0).to_numpy().astype(np.int64)
        flat = df.select(pl.col("__t").explode().alias("tok"))["tok"]
        flat = flat.drop_nulls()
        if len(flat):
            th = np.asarray(stable_hash64(flat.to_arrow(),
                                          seed=hash_seed))
            pos = np.searchsorted(hs, th)
            pos_ok = pos < len(hs)
            out = np.full(len(th), unk, dtype=np.int32)
            ok = np.zeros(len(th), dtype=bool)
            ok[pos_ok] = hs[pos[pos_ok]] == th[pos_ok]
            out[ok] = vid[pos[ok]]
        else:
            out = np.empty(0, dtype=np.int32)
        offs = pa.array(np.r_[0, np.cumsum(lens)].astype(np.int32))
        return pa.table({
            "doc_id": b.column(id_col).cast(pa.int64()),
            "ids": pa.ListArray.from_arrays(
                offs, pa.array(out, type=pa.int32())),
            "n_tokens": pa.array(lens),
        })

    return docs.map_batches(encode, batch_format="pyarrow",
                            zero_copy_batch=True)


def decode_docs(enc, vocab_table: pa.Table, unk_token: str = "<unk>",
                out_col: str = "text"):
    """Inverse of encode_docs for inspection: id lists -> token strings
    joined by spaces (unk_id -> ``unk_token``).  The vocab table is
    small by construction — broadcast once."""
    import ray as _ray

    toks = vocab_table.column("token").to_pylist()
    ref = _ray.put(np.array(toks + [unk_token], dtype=object))

    def fn(b: pa.Table) -> pa.Table:
        vocab = _ray.get(ref)
        ids_col = b.column("ids").combine_chunks()
        flat = np.asarray(ids_col.values)
        words = vocab[np.minimum(flat, len(vocab) - 1)]
        offs = np.asarray(ids_col.offsets)
        texts = [" ".join(words[offs[i]:offs[i + 1]])
                 for i in range(len(offs) - 1)]
        return pa.table({"doc_id": b.column("doc_id"),
                         out_col: pa.array(texts, type=pa.string())})

    return enc.map_batches(fn, batch_format="pyarrow",
                           zero_copy_batch=True)
