"""Document chunking — split long documents into fixed-token-budget
chunks with optional overlap: the preprocessing step between curation
and sequence packing (functions/pack.py) for pretraining, and the
retrieval-unit splitter for RAG indexing (functions/tfidf.py /
search.py consume the chunks).

Tokenization is the repo whitespace convention (text.split(' ') ==
DuckDB string_split — same contract as PMI/Kneser-Ney/line dedup).
Chunk i of a document covers tokens [i*stride, i*stride + chunk_tokens)
with stride = chunk_tokens - overlap; the last chunk keeps its
partial tail (never dropped); empty documents emit no chunks.  A
document's chunks carry (doc_id, chunk_idx, text, n_tokens) — doc_id +
chunk_idx is the stable chunk identity for downstream dedup/packing.

Scale shape: stateless per-batch map, zero exchange; output rows ~
total_tokens / stride.  The per-document chunk loop is Python over the
(vectorized) per-document token lists — bounded by chunks per doc, not
characters; the split itself is one vectorized polars pass.

Reference anchor: the reference truncates/pads its text fields
implicitly at model input time (link_prediction_datamodule.py batch
assembly); chunking makes the window policy an explicit, testable
data-side operator instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def chunk_documents(docs, *, chunk_tokens: int, overlap: int = 0,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Returns a Dataset (doc_id, chunk_idx, text, n_tokens)."""
    import polars as pl

    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    if not (0 <= overlap < chunk_tokens):
        raise ValueError("overlap must be in [0, chunk_tokens)")
    stride = chunk_tokens - overlap

    def split(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([id_col, text_col]))
        toks = df.with_columns(
            pl.col(text_col).str.split(" ").alias("__t"))
        ids_out, idx_out, txt_out, n_out = [], [], [], []
        for did, tl in zip(toks[id_col], toks["__t"]):
            # null text emits no chunks (matches the oracle's
            # WHERE text <> '', which drops NULLs too)
            if tl is None:
                continue
            tl = tl.to_list()
            # the empty string splits to [''] — treat as no tokens
            if not tl or tl == [""]:
                continue
            n = len(tl)
            i = 0
            start = 0
            while start < n:
                piece = tl[start:start + chunk_tokens]
                ids_out.append(did)
                idx_out.append(i)
                txt_out.append(" ".join(piece))
                n_out.append(len(piece))
                if start + chunk_tokens >= n:
                    break
                start += stride
                i += 1
        return pa.table({
            id_col: pa.array(ids_out, type=b.schema.field(id_col).type),
            "chunk_idx": pa.array(idx_out, type=pa.int64()),
            "text": pa.array(txt_out, type=pa.string()),
            "n_tokens": pa.array(n_out, type=pa.int64())})

    return docs.map_batches(split, batch_format="pyarrow",
                            zero_copy_batch=True)
