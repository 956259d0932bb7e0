"""WordPiece tokenizer: training + greedy longest-match encoding.

Completes the engine's subword-tokenizer family (BPE
functions/bpe.py, Unigram functions/unigram.py): WordPiece (Schuster
& Nakajima 2012; the BERT tokenizer) merges, per round, the adjacent
unit pair maximizing the unigram-likelihood GAIN

    score(a, b) = count(ab) / (count(a) * count(b))

instead of BPE's raw count — and encodes with greedy
longest-match-first per word, continuation units prefixed "##".

Distributed shape — training runs on the WORD-COUNT TABLE, not the
corpus (the standard trainer layout: one pass folds the corpus to
(word, n) rows — distinct-word cardinality, itself a distributed
Dataset — and every merge round then touches only that table):

  round = re-encode rows with last merge (vectorized int32 kernel,
          functions/bpe.py machinery) ->
          n-weighted pair counts (packed int64 keys, per-batch
          np.unique combiner -> grouped sum) ->
          unit counts (same combiner; VOCAB-bounded, <= alphabet +
          merges rows, safely broadcast) ->
          per-batch partial top-1 by score -> driver argmax over
          <= num_blocks candidate rows.

Determinism: counts are exact integers; the per-batch partial keeps
every row within 1e-9 relative of its float-score max and the driver
resolves those finalists by EXACT integer cross-multiplication
(python ints, no overflow), ties -> smallest packed key.  The learned
vocab is therefore partitioning/layout independent
(tests/test_wordpiece.py pins a sequential pure-Python reference and
1-vs-4-parts equality).

Symbol space: word-initial characters keep their codepoint;
continuation characters get codepoint + _CONT; merges mint ids from
_BASE up.  Unit strings rebuild on the driver from the merge table
(vocab-bounded state only).

Encoding is per UNIQUE word (np.unique per batch + a memo dict per
actor) — the zipf distribution makes the hot path a cache lookup;
the trie walk runs only on first sight of a word.

Scale note: at 100 TB the word-count fold is one grouped exchange;
rounds then cost O(distinct words), independent of corpus size —
the same reason production tokenizer trainers keep word tables.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

from ..ops.agg import grouped_aggregate
from .bpe import _apply_rule, _flatten

_CONT = 1 << 20      # continuation-character offset
_BASE = 1 << 21      # first merged-symbol id


def _word_counts(docs, text_col: str, num_parts: int):
    """corpus -> (word, n) Dataset: per-batch Counter combiner +
    grouped sum (repo single-space tokenization)."""
    import polars as pl

    def partial(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([text_col]))
        out = (df.select(pl.col(text_col).str.split(" ").alias("w"))
               .explode("w").group_by("w").len(name="n"))
        return out.to_arrow().cast(pa.schema([
            pa.field("w", pa.string()), pa.field("n", pa.int64())]))

    return grouped_aggregate(
        docs.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["w"], {"n": ("sum", "n")}, num_parts=num_parts)


def _word_to_syms(b: pa.Table) -> pa.Table:
    """(w, n) -> (syms list<int32>, n): initial char keeps its
    codepoint, continuations shift by _CONT."""
    words = b.column("w").to_pylist()
    offs = np.zeros(len(words) + 1, dtype=np.int64)
    vals_all: List[np.ndarray] = []
    for i, w in enumerate(words):
        cps = np.frombuffer((w or "").encode("utf-32-le"),
                            dtype=np.uint32).astype(np.int64)
        if cps.size:
            cps = cps.copy()
            cps[1:] += _CONT
        vals_all.append(cps.astype(np.int32))
        offs[i + 1] = offs[i] + cps.size
    vals = np.concatenate(vals_all) if vals_all else \
        np.empty(0, dtype=np.int32)
    arr = pa.ListArray.from_arrays(
        pa.array(offs.astype(np.int32), type=pa.int32()),
        pa.array(vals, type=pa.int32()))
    return pa.table({"syms": arr, "n": b.column("n")})


def _pair_unit_counts(vals: np.ndarray, offs: np.ndarray,
                      n: np.ndarray) -> Tuple[pa.Table, pa.Table]:
    """n-weighted (pair, count) and (unit, count) combiners."""
    reps = np.diff(offs)
    row_w = np.repeat(n, reps)
    if len(vals):
        uu, inv = np.unique(vals, return_inverse=True)
        uc = np.bincount(inv, weights=row_w.astype(np.float64))
        units = pa.table({"unit": pa.array(uu.astype(np.int64)),
                          "n": pa.array(uc.astype(np.int64))})
    else:
        units = pa.table({"unit": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64())})
    if len(vals) >= 2:
        m = np.ones(len(vals) - 1, dtype=bool)
        bounds = offs[1:-1] - 1
        m[bounds[(bounds >= 0) & (bounds < len(m))]] = False
        key = ((vals[:-1].astype(np.int64) << 32)
               | vals[1:].astype(np.int64))[m]
        # pair i sits inside the row of its LEFT element: each row of
        # length L contributes L-1 in-row pairs
        w = np.repeat(n, np.maximum(reps - 1, 0))
        uk, inv = np.unique(key, return_inverse=True)
        cc = np.bincount(inv, weights=w.astype(np.float64))
        pairs = pa.table({"pair": pa.array(uk),
                          "n": pa.array(cc.astype(np.int64))})
    else:
        pairs = pa.table({"pair": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64())})
    return pairs, units


def train_wordpiece(docs, n_merges: int, *, text_col: str = "text",
                    num_parts: int = 16
                    ) -> Tuple[List[str], Dict]:
    """Learn a WordPiece vocab over the corpus.  Returns
    (vocab, info): vocab = ["[UNK]"] + alphabet units (sorted) +
    one unit per merge in learn order ("##"-prefixed continuations);
    info records each round's pair and exact (count, na, nb).
    Encode with apply_wordpiece."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    words = _word_counts(docs, text_col, num_parts)
    table = words.map_batches(_word_to_syms, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    merges: List[Tuple[int, int, int]] = []
    info: Dict = {"rounds": []}
    strings: Dict[int, str] = {}

    def unit_str(sym: int) -> str:
        if sym in strings:
            return strings[sym]
        if sym < _CONT:
            s = chr(sym)
        elif sym < _BASE:
            s = "##" + chr(sym - _CONT)
        else:
            raise KeyError(sym)
        strings[sym] = s
        return s

    for r in range(n_merges):
        rule = merges[-1] if merges else None
        if rule is not None:
            def reenc(b: pa.Table, rule=rule) -> pa.Table:
                vals, offs = _flatten(b, "syms")
                vals, offs = _apply_rule(vals, offs, rule)
                arr = pa.ListArray.from_arrays(
                    pa.array(offs.astype(np.int32), type=pa.int32()),
                    pa.array(vals, type=pa.int32()))
                return pa.table({"syms": arr, "n": b.column("n")})

            table = table.map_batches(
                reenc, batch_format="pyarrow",
                zero_copy_batch=True).materialize()

        def combs(b: pa.Table) -> pa.Table:
            vals, offs = _flatten(b, "syms")
            n = b.column("n").to_numpy()
            pairs, units = _pair_unit_counts(vals, offs, n)
            pairs = pairs.append_column(
                "is_pair", pa.array(np.ones(pairs.num_rows, bool)))
            units = pa.table({
                "pair": units.column("unit"),
                "n": units.column("n"),
                "is_pair": pa.array(np.zeros(units.num_rows, bool))})
            return pa.concat_tables([pairs, units])

        counts = grouped_aggregate(
            table.map_batches(combs, batch_format="pyarrow",
                              zero_copy_batch=True),
            ["pair", "is_pair"], {"n": ("sum", "n")},
            num_parts=num_parts).materialize()
        # unit table: vocab-bounded (alphabet + merges) -> driver map
        def units_only(b: pa.Table) -> pa.Table:
            mask = b.column("is_pair").to_numpy(zero_copy_only=False)
            return pa.table({"pair": b.column("pair").to_numpy()[~mask],
                             "n": b.column("n").to_numpy()[~mask]})

        ud = counts.map_batches(units_only, batch_format="pyarrow",
                                zero_copy_batch=True).to_pandas()
        ucount = dict(zip(ud["pair"].astype(int), ud["n"].astype(int)))
        if r == 0:
            # the pre-merge unit set IS the corpus alphabet
            alphabet = sorted(k for k in ucount if k < _BASE)
        import ray as _ray

        uref = _ray.put(ucount)

        def top_cands(b: pa.Table, uref=uref) -> pa.Table:
            import ray as _r

            uc = _r.get(uref)
            mask = b.column("is_pair").to_numpy(zero_copy_only=False)
            k = b.column("pair").to_numpy()[mask]
            nn = b.column("n").to_numpy()[mask]
            if not len(k):
                return pa.table({"pair": pa.array([], type=pa.int64()),
                                 "n": pa.array([], type=pa.int64())})
            na = np.array([uc[int(x) >> 32] for x in k],
                          dtype=np.float64)
            nb = np.array([uc[int(x) & 0xFFFFFFFF] for x in k],
                          dtype=np.float64)
            score = nn / (na * nb)
            peak = score.max()
            sel = score >= peak * (1.0 - 1e-9)
            return pa.table({"pair": pa.array(k[sel]),
                             "n": pa.array(nn[sel])})

        cand = counts.map_batches(top_cands, batch_format="pyarrow",
                                  zero_copy_batch=True).to_pandas()
        if len(cand) == 0:
            break
        # exact rational argmax over the <= blocks * ties finalists
        best = None
        for row in cand.itertuples():
            key = int(row.pair)
            nab = int(row.n)
            na = ucount[key >> 32]
            nb = ucount[key & 0xFFFFFFFF]
            # score = nab / (na * nb); compare by cross-multiplication
            if best is None:
                best = (nab, na * nb, key)
            else:
                b_nab, b_den, b_key = best
                lhs = nab * b_den
                rhs = b_nab * (na * nb)
                if lhs > rhs or (lhs == rhs and key < b_key):
                    best = (nab, na * nb, key)
        nab, den, key = best
        if nab < 2:
            break
        a, b_ = key >> 32, key & 0xFFFFFFFF
        new = _BASE + r
        sa, sb = unit_str(int(a)), unit_str(int(b_))
        strings[new] = sa + (sb[2:] if sb.startswith("##") else sb)
        merges.append((int(a), int(b_), new))
        info["rounds"].append({
            "round": r, "pair": [int(a), int(b_)], "count": nab,
            "na": ucount[int(a)], "nb": ucount[int(b_)],
            "unit": strings[new]})

    vocab = ["[UNK]"]
    vocab += [unit_str(s) for s in alphabet]
    vocab += [strings[m[2]] for m in merges]
    info["n_merges"] = len(merges)
    info["vocab_size"] = len(vocab)
    return vocab, info


def wordpiece_encode_word(word: str, units: set) -> Optional[List[str]]:
    """Greedy longest-match-first; None if not encodable (-> [UNK])."""
    out: List[str] = []
    i = 0
    first = True
    while i < len(word):
        j = len(word)
        hit = None
        while j > i:
            piece = word[i:j] if first else "##" + word[i:j]
            if piece in units:
                hit = piece
                break
            j -= 1
        if hit is None:
            return None
        out.append(hit)
        i = j
        first = False
    return out


def apply_wordpiece(docs, vocab: List[str], *, text_col: str = "text",
                    id_col: str = "doc_id", out_col: str = "pieces"):
    """Encode the corpus: ds(id_col, out_col list<int32>) with ids =
    positions in ``vocab`` (vocab[0] must be "[UNK]"); whole words
    that cannot be covered emit one [UNK] id.  Greedy trie walk runs
    once per UNIQUE word per batch (memo per actor call)."""
    if not vocab or vocab[0] != "[UNK]":
        raise ValueError("vocab[0] must be '[UNK]'")
    vid = {u: i for i, u in enumerate(vocab)}
    units = set(vocab)

    def enc(b: pa.Table) -> pa.Table:
        texts = b.column(text_col).to_pylist()
        memo: Dict[str, List[int]] = {}
        offs = np.zeros(len(texts) + 1, dtype=np.int64)
        vals: List[int] = []
        for i, t in enumerate(texts):
            row: List[int] = []
            for w in (t or "").split(" "):
                got = memo.get(w)
                if got is None:
                    pieces = wordpiece_encode_word(w, units)
                    got = [0] if pieces is None else \
                        [vid[p] for p in pieces]
                    memo[w] = got
                row.extend(got)
            vals.extend(row)
            offs[i + 1] = len(vals)
        arr = pa.ListArray.from_arrays(
            pa.array(offs.astype(np.int32), type=pa.int32()),
            pa.array(np.asarray(vals, dtype=np.int32),
                     type=pa.int32()))
        return pa.table({id_col: b.column(id_col), out_col: arr})

    return docs.map_batches(enc, batch_format="pyarrow",
                            zero_copy_batch=True)
