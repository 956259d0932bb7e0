"""Byte-pair-encoding tokenizer training and application.

The missing half of the training-data path (functions/encode.py builds
a WORD-level vocab; this learns SUBWORD units): iteratively merge the
most frequent adjacent symbol pair (Sennrich et al. 2016, "Neural
machine translation of rare words with subword units"), byte-level
alphabet so no text is ever out-of-vocabulary.

Distributed shape — one merge round is
  re-encode (apply the previous round's merge, vectorized) +
  pair-count (per-batch np.unique combiner over packed int64 pair keys)
  -> grouped sum at distinct-pair cardinality
  -> per-batch partial top-1 -> driver argmax over <= num_blocks rows,
so the driver holds one (pair, count) row per block, never a
vocabulary-sized table, and the corpus state (list<int32> symbol rows)
is re-materialized once per round to keep lineage flat.  Determinism:
ties break to the SMALLEST packed pair key — counts are exact integers,
so the merge table is partitioning/block-layout independent
(tests/test_bpe.py pins a single-process reference).

Cost model: training touches the corpus once per merge.  At 100 TB you
train on a seeded sample (ops/sample.py::seeded_sample feeds ``docs``
here — sampling is standard practice for tokenizer training) and APPLY
the learned table corpus-wide with apply_bpe (one streaming pass,
n_merges vectorized kernels per batch).

Greedy semantics: within a round, matches of the pair are taken
leftmost-first (overlapping runs like "aaa" under merge (a,a) take
positions 0-1), identical to the single-process reference.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

from ..ops.agg import grouped_aggregate

_BASE = 256  # byte alphabet; merge r mints symbol _BASE + r


def _flatten(b: pa.Table, col: str) -> Tuple[np.ndarray, np.ndarray]:
    """list<int32> column -> (values, offsets int64), normalized so
    offsets[0] == 0 even for a sliced block (a slice's raw offsets are
    absolute into the unsliced child buffer)."""
    c = b.column(col).combine_chunks()
    offs = np.asarray(c.offsets, dtype=np.int64)
    vals = np.asarray(c.values, dtype=np.int32)
    if len(offs) and offs[0] != 0:
        vals = vals[offs[0]:offs[-1]]
        offs = offs - offs[0]
    else:
        vals = vals[:offs[-1]] if len(offs) else vals
    return vals, offs


def _text_to_syms(b: pa.Table, text_col: str) -> Tuple[np.ndarray,
                                                       np.ndarray]:
    import pyarrow.compute as pc

    txt = pc.cast(b.column(text_col), pa.binary())
    vals = np.frombuffer(b"".join(txt.to_pylist() or [b""]),
                         dtype=np.uint8).astype(np.int32)
    lens = pc.binary_length(txt).to_numpy(zero_copy_only=False)
    offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    return vals, offs


def _kept_per_row(keep: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Per-row True counts, safe for empty rows (no reduceat quirks)."""
    kc = np.zeros(len(keep) + 1, dtype=np.int64)
    np.cumsum(keep, out=kc[1:])
    return kc[offs[1:]] - kc[offs[:-1]]


def _merge_batch(vals: np.ndarray, offs: np.ndarray, a: int, b: int,
                 new_sym: int) -> Tuple[np.ndarray, np.ndarray]:
    """Apply one merge (a, b) -> new_sym greedily-leftmost inside each
    row.  Returns (new_vals, keep_mask); keep_mask drops the second
    element of every taken match."""
    n = len(vals)
    keep = np.ones(n, dtype=bool)
    if n < 2:
        return vals, keep
    m = np.zeros(n, dtype=bool)
    m[:-1] = (vals[:-1] == a) & (vals[1:] == b)
    # matches must not straddle row boundaries: the pair starting at a
    # row's last element belongs to two rows.  (Guard the empty-first-
    # row case: offs value 0 would index -1 = the LAST slot.)
    bounds = offs[1:-1] - 1
    m[bounds[bounds >= 0]] = False
    pos = np.flatnonzero(m)
    if pos.size == 0:
        return vals, keep
    # leftmost-greedy overlap resolution: in a run of consecutive match
    # positions (possible only for chained a == b), take every other
    run_start = np.ones(pos.size, dtype=bool)
    run_start[1:] = pos[1:] != pos[:-1] + 1
    run_id = np.cumsum(run_start) - 1
    first_of_run = pos[np.flatnonzero(run_start)]
    take = ((pos - first_of_run[run_id]) % 2) == 0
    tpos = pos[take]
    out = vals.copy()
    out[tpos] = new_sym
    keep[tpos + 1] = False
    return out, keep


def _apply_rule(vals: np.ndarray, offs: np.ndarray, rule) -> Tuple[
        np.ndarray, np.ndarray]:
    """Merge + offset rebuild; returns (new_vals, new_offs int64)."""
    vals2, keep = _merge_batch(vals, offs, *rule)
    new_offs = np.zeros(len(offs), dtype=np.int64)
    np.cumsum(_kept_per_row(keep, offs), out=new_offs[1:])
    return vals2[keep], new_offs


def _syms_table(vals: np.ndarray, offs: np.ndarray,
                extra: Optional[Dict] = None) -> pa.Table:
    arr = pa.ListArray.from_arrays(
        pa.array(offs.astype(np.int32), type=pa.int32()),
        pa.array(vals, type=pa.int32()))
    cols = dict(extra or {})
    cols["syms"] = arr
    return pa.table(cols)


def _pair_counts(vals: np.ndarray, offs: np.ndarray) -> pa.Table:
    if len(vals) >= 2:
        m = np.ones(len(vals) - 1, dtype=bool)
        # trailing empty rows put offsets == len(vals): clip both ends
        bounds = offs[1:-1] - 1
        m[bounds[(bounds >= 0) & (bounds < len(m))]] = False
        key = ((vals[:-1].astype(np.int64) << 32) |
               vals[1:].astype(np.int64))[m]
        uk, uc = np.unique(key, return_counts=True)
    else:
        uk = np.empty(0, dtype=np.int64)
        uc = np.empty(0, dtype=np.int64)
    return pa.table({"pair": pa.array(uk),
                     "n": pa.array(uc.astype(np.int64))})


def train_bpe(docs, n_merges: int, *, text_col: str = "text",
              num_parts: int = 16) -> Tuple[List[Tuple[int, int, int]],
                                            Dict]:
    """Learn ``n_merges`` BPE merges over the corpus' UTF-8 bytes.
    Returns (merges, info): merges[r] = (sym_a, sym_b, 256 + r) in
    application order; info records each round's winning pair count.
    Stops early when no pair repeats.  Apply with apply_bpe."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")

    def to_syms(b: pa.Table) -> pa.Table:
        return _syms_table(*_text_to_syms(b, text_col))

    corpus = docs.map_batches(to_syms, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    merges: List[Tuple[int, int, int]] = []
    info: Dict = {"rounds": []}

    for r in range(n_merges):
        rule = merges[-1] if merges else None
        if rule is not None:
            def reenc(b: pa.Table, rule=rule) -> pa.Table:
                return _syms_table(*_apply_rule(*_flatten(b, "syms"), rule))

            corpus = corpus.map_batches(
                reenc, batch_format="pyarrow",
                zero_copy_batch=True).materialize()

        counts = grouped_aggregate(
            corpus.map_batches(
                lambda b: _pair_counts(*_flatten(b, "syms")),
                batch_format="pyarrow", zero_copy_batch=True),
            ["pair"], {"n": ("sum", "n")}, num_parts=num_parts)

        def top1(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"pair": pa.array([], type=pa.int64()),
                                 "n": pa.array([], type=pa.int64())})
            k = b.column("pair").to_numpy()
            n = b.column("n").to_numpy()
            peak = n.max()
            sel = n == peak
            return pa.table({"pair": pa.array([int(k[sel].min())]),
                             "n": pa.array([int(peak)])})

        cand = counts.map_batches(top1, batch_format="pyarrow",
                                  zero_copy_batch=True).to_pandas()
        if len(cand) == 0:
            break
        peak = int(cand.n.max())
        if peak < 2:  # nothing repeats — further merges are noise
            break
        key = int(cand.loc[cand.n == peak, "pair"].min())
        a, b_ = key >> 32, key & 0xFFFFFFFF
        merges.append((int(a), int(b_), _BASE + r))
        info["rounds"].append({"round": r, "pair": [int(a), int(b_)],
                               "count": peak})
    info["n_merges"] = len(merges)
    return merges, info


def apply_bpe(docs, merges: List[Tuple[int, int, int]], *,
              text_col: str = "text", id_col: str = "doc_id",
              out_col: str = "syms"):
    """Encode the corpus with a trained merge table: one streaming pass,
    n_merges vectorized merge kernels per batch (merge order is the
    training order — BPE application is order-sensitive).  Returns
    ds(id_col, out_col list<int32>)."""

    def enc(b: pa.Table) -> pa.Table:
        vals, offs = _text_to_syms(b, text_col)
        for rule in merges:
            vals, offs = _apply_rule(vals, offs, rule)
        arr = pa.ListArray.from_arrays(
            pa.array(offs.astype(np.int32), type=pa.int32()),
            pa.array(vals, type=pa.int32()))
        return pa.table({id_col: b.column(id_col), out_col: arr})

    return docs.map_batches(enc, batch_format="pyarrow",
                            zero_copy_batch=True)
