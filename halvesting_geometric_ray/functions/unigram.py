"""Unigram-LM tokenizer (Kudo 2018, "Subword regularization" — the
SentencePiece unigram algorithm): the OTHER standard LLM tokenizer
trainer next to BPE (functions/bpe.py).

Training is EM over a word-frequency table:

- E-step: for each distinct word w (weight = corpus count), a
  forward-backward pass over the segmentation lattice of vocabulary
  pieces yields expected piece counts and the word's marginal
  likelihood;
- M-step: piece probabilities re-normalize to the expected counts;
- pruning: between rounds the lowest-expected-count multi-character
  pieces are dropped (single characters are never pruned — full
  coverage), shrinking the seed vocabulary toward ``vocab_size``.
  (Kudo prunes by exact likelihood loss; expected-count pruning is the
  standard simplification and is documented as such.)

Scale shape: the corpus is touched ONCE (word counting — a combiner +
one grouped exchange, then a cap to the ``max_words`` most frequent
words, the same bounded-state discipline as build_vocab); every EM
round runs over the CAPPED word table only, with the model broadcast
via ray.put and ONE partial expected-count vector emitted per hash
partition.  The driver folds partials in sorted part order and words
are processed in sorted order inside each part, so for a FIXED
``num_parts`` (a hyperparameter, like the SGNS shard count) training
is bitwise independent of input block layout.

Determinism caveats (documented, pinned in tests/test_unigram.py):
words are truncated to ``max_word_len`` chars (forward scores underflow
on pathological tokens); pruning ties break on the piece string.

Reference anchor: the reference tokenizes HAL abstracts with
pretrained subword tokenizers (halvesting_geometric/utils/data/
link_prediction_metadata.py:210-238); this trains the matching
tokenizer family from the corpus itself.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..ops._util import pre_shuffle
from ..ops.agg import grouped_aggregate
from ..ops.dedup import _PART_COL, _add_key_part

_PROB_FLOOR = 1e-9


def _word_counts(docs, text_col: str, num_parts: int, max_words: int):
    """(word, c) for the max_words most frequent whitespace tokens —
    combiner exchange + distributed sort/limit cap."""
    import polars as pl

    def local(b: pa.Table) -> pa.Table:
        s = pl.from_arrow(b.select([text_col]))[text_col]
        out = (s.str.split(" ").explode().alias("word").to_frame()
               .filter(pl.col("word").str.len_chars() > 0)
               .group_by("word").agg(pl.len().cast(pl.Int64).alias("c")))
        return out.to_arrow()

    counts = grouped_aggregate(
        docs.map_batches(local, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["word"], {"c": ("sum", "c")}, num_parts=num_parts)
    return counts.sort(["c", "word"], descending=[True, False]) \
                 .limit(max_words)


def _seed_pieces(words, max_piece_len: int, seed_size: int,
                 num_parts: int) -> pd.DataFrame:
    """Candidate pieces: every substring up to max_piece_len, scored
    count * len (Kudo's frequent-substring seeding); ALL single chars
    kept regardless of score."""

    def subs(b: pa.Table) -> pa.Table:
        w = b.column("word").to_pylist()
        c = b.column("c").to_numpy(zero_copy_only=False)
        acc: Dict[str, int] = {}
        for word, cnt in zip(w, c):
            n = len(word)
            for j in range(n):
                top = min(max_piece_len, n - j)
                for L in range(1, top + 1):
                    p = word[j:j + L]
                    acc[p] = acc.get(p, 0) + int(cnt)
        return pa.table({"piece": pa.array(list(acc.keys())),
                         "n": pa.array(list(acc.values()),
                                       type=pa.int64())})

    cand = grouped_aggregate(
        words.map_batches(subs, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["piece"], {"n": ("sum", "n")}, num_parts=num_parts)

    def score(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ln = pc.utf8_length(b.column("piece")).cast(pa.int64())
        n = b.column("n")
        return pa.table({"piece": b.column("piece"), "n": n,
                         "len": ln,
                         "score": pc.multiply(n.cast(pa.int64()), ln)})

    scored = cand.map_batches(score, batch_format="pyarrow",
                              zero_copy_batch=True)
    chars = scored.filter(expr="len == 1").select_columns(
        ["piece", "n"]).to_pandas()
    multi = (scored.filter(expr="len > 1")
             .sort(["score", "piece"], descending=[True, False])
             .limit(max(0, seed_size - len(chars)))
             .select_columns(["piece", "n"]).to_pandas())
    out = pd.concat([chars, multi], ignore_index=True)
    return out.sort_values("piece", kind="stable").reset_index(drop=True)


def _estep_word(word: str, cnt: int, vocab: Dict[str, int],
                p: np.ndarray, max_piece_len: int,
                exp_counts: np.ndarray) -> float:
    """Forward-backward over the piece lattice of one word; adds
    cnt-weighted expected counts in place, returns cnt * log Z."""
    n = len(word)
    edges: List[List[Tuple[int, int]]] = [[] for _ in range(n + 1)]
    for j in range(n):
        top = min(max_piece_len, n - j)
        for L in range(1, top + 1):
            idx = vocab.get(word[j:j + L])
            if idx is not None:
                edges[j + L].append((j, idx))
    a = np.zeros(n + 1)
    a[0] = 1.0
    for i in range(1, n + 1):
        s = 0.0
        for j, idx in edges[i]:
            s += a[j] * p[idx]
        a[i] = s
    Z = a[n]
    if Z <= 0.0:
        return 0.0  # uncoverable word (chars outside vocab) — skipped
    b = np.zeros(n + 1)
    b[n] = 1.0
    for i in range(n, 0, -1):
        bi = b[i]
        if bi == 0.0:
            continue
        for j, idx in edges[i]:
            w = a[j] * p[idx] * bi
            b[j] += p[idx] * bi
            exp_counts[idx] += cnt * (w / Z)
    return cnt * math.log(Z)


def train_unigram(docs, *, text_col: str = "text",
                  vocab_size: int = 2000, seed_size: int = 8000,
                  max_piece_len: int = 8, em_rounds: int = 4,
                  prune_frac: float = 0.25, max_words: int = 200_000,
                  max_word_len: int = 32,
                  num_parts: int = 16) -> Tuple[pd.DataFrame, Dict]:
    """Train a unigram-LM piece vocabulary.  Returns
    ``(pieces(piece, logp) sorted by piece, info)`` with per-round
    log-likelihoods and vocab sizes in ``info["rounds"]``."""
    if vocab_size < 2:
        raise ValueError("vocab_size must be >= 2")
    words = _word_counts(docs, text_col, num_parts, max_words)

    def trunc(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "word": pc.utf8_slice_codeunits(b.column("word"), 0,
                                            max_word_len),
            "c": b.column("c")})

    words = words.map_batches(trunc, batch_format="pyarrow",
                              zero_copy_batch=True)
    # a truncation can collide two words: re-aggregate, then pin the
    # hash partition each word folds into
    words = grouped_aggregate(words, ["word"], {"c": ("sum", "c")},
                              num_parts=num_parts)
    words = words.map_batches(
        lambda b: _add_key_part(b, ["word"], num_parts),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    seeds = _seed_pieces(words, max_piece_len, seed_size, num_parts)
    pieces: List[str] = seeds["piece"].tolist()
    counts0 = seeds["n"].to_numpy(dtype=np.float64)
    p = counts0 / counts0.sum()
    p = np.maximum(p, _PROB_FLOOR)
    p /= p.sum()

    info: Dict = {"seed_size": len(pieces), "rounds": []}
    rnd = 0
    while True:
        model_ref = ray.put((pieces, p, max_piece_len))

        def estep(g: pa.Table) -> pa.Table:
            pcs, probs, mpl = ray.get(model_ref)
            vocab = {s: i for i, s in enumerate(pcs)}
            exp = np.zeros(len(pcs))
            ll = 0.0
            df = (g.select(["word", "c"]).to_pandas()
                  .sort_values("word", kind="stable"))
            for word, cnt in zip(df["word"], df["c"]):
                ll += _estep_word(word, int(cnt), vocab, probs, mpl, exp)
            part = int(g.column(_PART_COL)[0].as_py())
            return pa.table({
                "part": pa.array([part], type=pa.int32()),
                "ll": pa.array([ll]),
                "exp": pa.array([exp.tolist()],
                                type=pa.list_(pa.float64()))})

        parts = (pre_shuffle(words).groupby(_PART_COL)
                 .map_groups(estep, batch_format="pyarrow",
                             retry_exceptions=True)).to_pandas()
        parts = parts.sort_values("part", kind="stable")
        exp = np.zeros(len(pieces))
        ll = 0.0
        for _, row in parts.iterrows():
            exp += np.asarray(row["exp"])
            ll += row["ll"]
        info["rounds"].append({"round": rnd, "loglik": float(ll),
                               "vocab": len(pieces)})
        # M-step
        p = np.maximum(exp / max(exp.sum(), 1e-300), _PROB_FLOOR)
        p /= p.sum()
        rnd += 1
        if rnd >= em_rounds and len(pieces) <= vocab_size:
            break
        # prune toward vocab_size: lowest expected count first, single
        # chars immune; ties break on the piece string (deterministic)
        if len(pieces) > vocab_size:
            target = max(vocab_size,
                         int(len(pieces) * (1.0 - prune_frac)))
            order = sorted(range(len(pieces)),
                           key=lambda i: (len(pieces[i]) > 1,
                                          -exp[i], pieces[i]))
            multi = [i for i in order if len(pieces[i]) > 1]
            n_chars = len(pieces) - len(multi)
            keep_multi = max(0, target - n_chars)
            kept = sorted(
                [i for i in order if len(pieces[i]) == 1] +
                multi[:keep_multi])
            pieces = [pieces[i] for i in kept]
            p = p[kept]
            p /= p.sum()
        if rnd >= em_rounds + 8:       # safety against no-progress loops
            break
    out = pd.DataFrame({"piece": pieces,
                        "logp": np.log(p)}).sort_values(
        "piece", kind="stable").reset_index(drop=True)
    info["vocab_size"] = len(out)
    return out, info


def apply_unigram(docs, pieces: pd.DataFrame, *, text_col: str = "text",
                  id_col: str = "doc_id", out_col: str = "ids",
                  max_word_len: int = 32):
    """Viterbi-encode the corpus with a trained piece table: per word,
    the max-log-prob segmentation; characters outside the vocabulary
    emit UNK = len(pieces).  One streaming pass with the (vocab-bounded)
    model broadcast once.  Returns ds(id_col, out_col list<int32>,
    n_tokens)."""
    plist = pieces["piece"].tolist()
    lp = pieces["logp"].to_numpy(dtype=np.float64)
    max_len = max((len(s) for s in plist), default=1)
    model_ref = ray.put((plist, lp, max_len))
    unk = len(plist)

    def enc(b: pa.Table) -> pa.Table:
        pcs, logp, mpl = ray.get(model_ref)
        vocab = {s: i for i, s in enumerate(pcs)}
        ids_all: List[np.ndarray] = []
        offs = [0]
        total = 0
        for text in b.column(text_col).to_pylist():
            ids: List[int] = []
            for word in (text or "").split(" "):
                word = word[:max_word_len]
                n = len(word)
                if n == 0:
                    continue
                best = np.full(n + 1, -np.inf)
                back = np.full(n + 1, -1, dtype=np.int64)
                piece_at = np.full(n + 1, -1, dtype=np.int64)
                best[0] = 0.0
                for i in range(1, n + 1):
                    for L in range(1, min(mpl, i) + 1):
                        j = i - L
                        if best[j] == -np.inf:
                            continue
                        idx = vocab.get(word[j:i])
                        if idx is None:
                            if L == 1:   # UNK char fallback
                                cand = best[j] - 100.0
                                if cand > best[i]:
                                    best[i] = cand
                                    back[i] = j
                                    piece_at[i] = unk
                            continue
                        cand = best[j] + logp[idx]
                        if cand > best[i]:
                            best[i] = cand
                            back[i] = j
                            piece_at[i] = idx
                seg: List[int] = []
                i = n
                while i > 0:
                    seg.append(int(piece_at[i]))
                    i = int(back[i])
                ids.extend(reversed(seg))
            arr = np.asarray(ids, dtype=np.int32)
            ids_all.append(arr)
            total += arr.size
            offs.append(total)
        flat = (np.concatenate(ids_all) if ids_all
                else np.array([], dtype=np.int32))
        lists = pa.ListArray.from_arrays(
            pa.array(np.asarray(offs, dtype=np.int32), type=pa.int32()),
            pa.array(flat, type=pa.int32()))
        n_tok = np.diff(np.asarray(offs, dtype=np.int64))
        return pa.table({id_col: b.column(id_col), out_col: lists,
                         "n_tokens": pa.array(n_tok)})

    return docs.map_batches(enc, batch_format="pyarrow",
                            zero_copy_batch=True)
