"""Sequence packing — the concat-and-chunk batching step of LLM
training-data pipelines (GPT-2/LLaMA style): documents are concatenated
in a deterministic order and split into fixed-length training sequences;
the operator emits the PACKING MANIFEST mapping each document to the
sequences (and in-sequence offsets) its tokens land in.

Data-engine framing: the actual token tensors are produced downstream by
the trainer's loader; what the distributed engine must provide is the
deterministic assignment — which is pure integer arithmetic over token
counts and therefore exactly testable (DuckDB window-function oracle in
tests/test_pack.py).

Scale shape: one grouped exchange.  Documents are hash-assigned to
``num_bins`` independent packing streams (``bin = hash(doc_id) %
num_bins`` — bins are the unit of trainer-shard parallelism), each bin
packs its own documents ordered by doc_id with a running token cumsum,
and tokens at global bin position p land in sequence ``p // seq_len``.
A document may span several sequences (chunking is intentional — no
padding, no document loss); the LAST partial sequence of each bin is
emitted with ``n_tok < seq_len`` and flagged ``partial=True`` so
callers can drop or pad it.

Determinism: given (num_bins, seq_len, hash_seed) the manifest is a
pure function of the (doc_id, n_tokens) multiset — independent of
partitioning, actor layout, and execution order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import stable_hash64
from ..ops._util import pre_shuffle

_PART = "__part"


def pack_sequences(docs, seq_len: int, *, num_bins: int = 16,
                   id_col: str = "doc_id", text_col: str = "text",
                   hash_seed: int = 42):
    """Pack whitespace token counts of ``docs`` into fixed ``seq_len``
    sequences per hash bin.  Returns one row per (document, sequence)
    intersection: (bin, seq_id, doc_id, doc_tok_start, seq_tok_start,
    n_tok, partial) — seq_id is bin-local, doc_tok_start is the offset
    of the chunk inside the document, seq_tok_start inside the sequence.
    Zero-token documents are absent from the manifest (nothing to pack).
    """
    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    if num_bins < 1:
        raise ValueError("num_bins must be >= 1")

    def count_tokens(b: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(b.select([id_col, text_col]))
        n = (df[text_col].str.extract_all(r"\S+").list.len()
             .fill_null(0).cast(pl.Int64))
        t = pa.table({id_col: b.column(id_col).cast(pa.int64()),
                      "n_tokens": pa.Array.from_pandas(n.to_pandas())})
        h = stable_hash64(t.column(id_col), seed=hash_seed)
        return t.append_column(_PART, pa.array(h % num_bins,
                                               type=pa.int32()))

    def pack_bin(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "bin": pa.array([], type=pa.int32()),
            "seq_id": pa.array([], type=pa.int64()),
            id_col: pa.array([], type=pa.int64()),
            "doc_tok_start": pa.array([], type=pa.int64()),
            "seq_tok_start": pa.array([], type=pa.int64()),
            "n_tok": pa.array([], type=pa.int64()),
            "partial": pa.array([], type=pa.bool_()),
        })
        if g.num_rows == 0:
            return empty
        bin_id = int(g.column(_PART)[0].as_py())
        ids = g.column(id_col).to_numpy()
        n = g.column("n_tokens").to_numpy()
        order = np.argsort(ids, kind="stable")
        ids, n = ids[order], n[order]
        keep = n > 0
        ids, n = ids[keep], n[keep]
        if ids.size == 0:
            return empty
        end = np.cumsum(n)
        start = end - n
        total = int(end[-1])
        # chunk row per (doc, crossed sequence boundary): doc d spans
        # sequences floor(start/L) .. floor((end-1)/L)
        s0 = start // seq_len
        s1 = (end - 1) // seq_len
        reps = (s1 - s0 + 1).astype(np.int64)
        doc_idx = np.repeat(np.arange(ids.size), reps)
        # sequence index of each chunk
        offs = np.concatenate([[0], np.cumsum(reps)])[:-1]
        seq = s0[doc_idx] + (np.arange(doc_idx.size) - offs[doc_idx])
        cs = np.maximum(start[doc_idx], seq * seq_len)          # chunk start
        ce = np.minimum(end[doc_idx], (seq + 1) * seq_len)      # chunk end
        return pa.table({
            "bin": pa.array(np.full(doc_idx.size, bin_id, dtype=np.int32)),
            "seq_id": pa.array(seq.astype(np.int64)),
            id_col: pa.array(ids[doc_idx].astype(np.int64)),
            "doc_tok_start": pa.array((cs - start[doc_idx]).astype(np.int64)),
            "seq_tok_start": pa.array((cs - seq * seq_len).astype(np.int64)),
            "n_tok": pa.array((ce - cs).astype(np.int64)),
            "partial": pa.array((seq == (total - 1) // seq_len) &
                                (total % seq_len != 0)),
        })

    counted = docs.map_batches(count_tokens, batch_format="pyarrow",
                               zero_copy_batch=True)
    return (pre_shuffle(counted).groupby(_PART)
            .map_groups(pack_bin, batch_format="pyarrow",
                        retry_exceptions=True))


def materialize_sequences(manifest, enc, num_parts: int = 16,
                          pad_id: int | None = None,
                          seq_len: int | None = None):
    """Assemble the actual training sequences: join the packing
    manifest (pack_sequences) with the encoded corpus (functions/
    encode.py::encode_docs) and emit one row per sequence —
    (bin, seq_id, ids list<int32>, n_tok, partial).

    Scale shape: ONE bucketed join on doc_id ships each document's ids
    to its manifest chunks, then ONE (bin, seq_id)-keyed exchange
    co-locates a sequence's chunks; assembly is a vectorized gather
    (repeat/cumsum index arithmetic over the flattened id values — no
    per-token Python).  Full sequences have exactly seq_len ids; the
    final partial of each bin keeps its true length with
    partial=True — or pads to ``seq_len`` with ``pad_id`` when given
    (n_tok still reports the REAL token count).
    """
    if (pad_id is None) != (seq_len is None):
        raise ValueError("pad_id and seq_len go together")
    import pyarrow.compute as pc

    from ..ops.join import hash_join
    from ..functions.hashing import stable_hash_pair64

    i64 = pa.int64()
    j = hash_join(
        manifest, enc.select_columns(["doc_id", "ids"]), on="doc_id",
        num_parts=num_parts,
        left_schema=pa.schema([("doc_id", i64), ("bin", pa.int32()),
                               ("seq_id", i64), ("doc_tok_start", i64),
                               ("seq_tok_start", i64), ("n_tok", i64),
                               ("partial", pa.bool_())]),
        right_schema=pa.schema([("doc_id", i64),
                                ("ids", pa.list_(pa.int32()))]))

    def tag(b: pa.Table) -> pa.Table:
        h = stable_hash_pair64(b.column("bin").cast(i64),
                               b.column("seq_id"))
        return b.append_column(
            _PART, pa.array(np.asarray(h) % num_parts, type=pa.int32()))

    out_schema = pa.schema([
        ("bin", pa.int32()), ("seq_id", i64),
        ("ids", pa.list_(pa.int32())), ("n_tok", i64),
        ("partial", pa.bool_())])

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        g = g.sort_by([("bin", "ascending"), ("seq_id", "ascending"),
                       ("seq_tok_start", "ascending")])
        ids_col = g.column("ids").combine_chunks()
        flat = np.asarray(ids_col.values)
        doc_off = np.asarray(ids_col.offsets)[:-1].astype(np.int64)
        dts = g.column("doc_tok_start").to_numpy()
        ntk = g.column("n_tok").to_numpy()
        # gather indices: for chunk c, doc_off[c]+dts[c] .. +ntk[c]
        starts = doc_off + dts
        total = int(ntk.sum())
        base = np.repeat(starts - np.r_[0, np.cumsum(ntk)[:-1]], ntk)
        idx = base + np.arange(total)
        toks = flat[idx]
        # split by sequence: chunk -> (bin, seq) run boundaries
        bins = g.column("bin").to_numpy()
        seqs = g.column("seq_id").to_numpy()
        new_seq = np.r_[True, (bins[1:] != bins[:-1])
                        | (seqs[1:] != seqs[:-1])]
        first = np.flatnonzero(new_seq)
        seq_len_tok = np.add.reduceat(ntk, first)
        offs = pa.array(np.r_[0, np.cumsum(seq_len_tok)]
                        .astype(np.int32))
        partial = np.maximum.reduceat(
            g.column("partial").to_numpy().astype(np.int8), first) > 0
        if pad_id is not None:
            need = seq_len - seq_len_tok
            if (need < 0).any():
                raise AssertionError("sequence longer than seq_len")
            if need.any():
                # rebuild the flat token array with pad runs appended
                pieces = []
                pos = np.r_[0, np.cumsum(seq_len_tok)]
                for i in range(len(first)):
                    pieces.append(toks[pos[i]:pos[i + 1]])
                    if need[i]:
                        pieces.append(np.full(need[i], pad_id,
                                              dtype=np.int32))
                toks = np.concatenate(pieces)
                offs = pa.array(
                    np.r_[0, np.cumsum(np.full(len(first), seq_len))]
                    .astype(np.int32))
        return pa.table({
            "bin": pa.array(bins[first], type=pa.int32()),
            "seq_id": pa.array(seqs[first]),
            "ids": pa.ListArray.from_arrays(
                offs, pa.array(toks, type=pa.int32())),
            "n_tok": pa.array(seq_len_tok.astype(np.int64)),
            "partial": pa.array(partial),
        }).cast(out_schema)

    tagged = j.map_batches(tag, batch_format="pyarrow",
                           zero_copy_batch=True)
    return (pre_shuffle(tagged).groupby(_PART)
            .map_groups(per_part, batch_format="pyarrow",
                        retry_exceptions=True))


def skipgram_pairs(ds, seq_col: str, order_col: str, token_col: str, *,
                   window: int = 2, tie_break=None, num_parts: int = 16,
                   keep_order: bool = False):
    """(center, context) skip-gram pairs within a window over ordered
    sequences — the training-pair generator between a walk corpus
    (graph/walks.py / graph/node2vec.py: seq_col=walk_id,
    order_col=step, token_col=vid) and an embedding trainer; equally
    the session-co-occurrence miner over event logs.

    One key-partitioned exchange (the lead_lag machinery): for each
    offset k in 1..window the row emits (token, token_at(+k)) — both
    directions come from emitting only forward pairs and letting the
    consumer symmetrize, matching the word2vec convention of each
    unordered co-occurrence appearing once per direction ONLY if
    symmetrized downstream.  Output: (seq_col, center, context, offset)
    with offset in 1..window; pairs never cross sequence boundaries.
    keep_order=True also emits order_col (the center's position) so a
    pair row carries full occurrence identity — feed (seq_col,
    order_col, offset) to skipgram_negatives' pair_id_cols for
    word2vec-faithful per-occurrence negative draws."""
    import pyarrow as pa

    from ..ops.window import lead_lag

    if window < 1:
        raise ValueError("window must be >= 1")
    shifts = {f"__c{k}": (token_col, -k) for k in range(1, window + 1)}
    led = lead_lag(ds, seq_col, order_col, shifts,
                   tie_break=tie_break, num_parts=num_parts)

    def melt(b: pa.Table) -> pa.Table:
        import numpy as np

        parts = []
        for k in range(1, window + 1):
            ctx = b.column(f"__c{k}")
            keep = ctx.is_valid()
            t = b.filter(keep)
            cols = {seq_col: t.column(seq_col)}
            if keep_order:
                cols[order_col] = t.column(order_col)
            cols["center"] = t.column(token_col)
            cols["context"] = t.column(f"__c{k}")
            cols["offset"] = pa.array(np.full(t.num_rows, k,
                                              dtype=np.int64))
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return led.map_batches(melt, batch_format="pyarrow",
                           zero_copy_batch=True)


def skipgram_negatives(pairs, vocab_counts, *, k: int = 5,
                       power: float = 0.75, seed: int = 29,
                       pair_id_cols=("center", "context")):
    """k negative samples per skip-gram pair from the word2vec noise
    distribution P(w) ~ count(w)^power (Mikolov 2013's 3/4 smoothing)
    — completes the walks -> pairs -> (pair, negatives) embedding
    data path.

    vocab_counts: pa.Table / pandas with (token:int64, n:int64) —
    vocabulary-bounded, broadcast ONCE as a cumulative-probability
    array; each batch draws by inverse-CDF searchsorted on stateless
    hash uniforms of (pair_id_cols..., slot, seed), so the sample is
    deterministic and partitioning-invariant.  pair_id_cols may name
    ANY number of identity columns — include a row-identity column
    (e.g. walk_id + offset) so duplicate occurrences of the same
    (center, context) pair draw DIFFERENT negatives, matching
    word2vec's per-occurrence sampling.  Faithful to word2vec:
    accidental positives are NOT excluded.  Output: input columns +
    ``neg`` (one row per negative; k rows per input pair)."""
    import pandas as pd
    import pyarrow as pa

    import ray

    from ..functions.hashing import stable_hash_cols64

    if k < 1:
        raise ValueError("k must be >= 1")
    if power <= 0:
        raise ValueError("power must be > 0")
    vc = vocab_counts.to_pandas() if hasattr(vocab_counts, "to_pandas") \
        else pd.DataFrame(vocab_counts)
    if not len(vc):
        raise ValueError("vocab_counts is empty")
    toks = vc["token"].to_numpy().astype(np.int64)
    w = vc["n"].to_numpy().astype(np.float64) ** power
    order = np.argsort(toks, kind="stable")
    toks, w = toks[order], w[order]
    cdf = np.cumsum(w)
    cdf /= cdf[-1]
    ref = ray.put((toks, cdf))
    id_cols = list(pair_id_cols)
    if len(id_cols) < 1:
        raise ValueError("pair_id_cols must name at least one column")

    def draw(b: pa.Table) -> pa.Table:
        tt, cc = ray.get(ref)
        n = b.num_rows
        base = np.asarray(stable_hash_cols64(
            [b.column(c) for c in id_cols], seed=seed))
        cols = {name: [] for name in b.column_names}
        negs = []
        for slot in range(k):
            with np.errstate(over="ignore"):
                h = (base.astype(np.uint64)
                     * np.uint64(0x9E3779B97F4A7C15)
                     + np.uint64(slot * 2 + 1))
                h ^= h >> np.uint64(31)
                h *= np.uint64(0xBF58476D1CE4E5B9)
                h ^= h >> np.uint64(27)
            u = (h >> np.uint64(11)).astype(np.float64) * 2.0 ** -53
            j = np.minimum(np.searchsorted(cc, u, side="right"),
                           tt.size - 1)
            negs.append(tt[j])
        idx = np.repeat(np.arange(n), k)
        out = {name: b.column(name).take(pa.array(idx))
               for name in b.column_names}
        out["neg"] = pa.array(np.stack(negs, axis=1).reshape(-1))
        return pa.table(out)

    return pairs.map_batches(draw, batch_format="pyarrow",
                             zero_copy_batch=True)
