"""Aho-Corasick multi-pattern scanning — the blocklist / keyword-list
gate of a web-corpus curation pipeline (URL blocklists, unsafe-phrase
lists, licence markers), run as a stateful actor-pool stage.

The automaton (Aho & Corasick 1975) is built ONCE per actor from the
broadcast pattern list (``ACScanStage.__init__``), resolved to a dense
DFA: ``delta[state, byte] -> state`` with failure links folded in, a
per-state match count (patterns ending at the state, suffix links
included) and a per-state pattern bitmask (<= 64 patterns).  Scanning
is vectorized ACROSS the documents of a batch: pad the batch to its max
byte length and step the position loop once per column — every step is
a numpy gather over the whole batch, so per-byte Python overhead is
amortized over ``batch_size`` docs.

Patterns must be non-empty ASCII byte strings (the oracle counts
character positions; for pure-ASCII patterns over UTF-8 text, byte
occurrences == character occurrences — UTF-8 continuation bytes have
the high bit set and can never alias an ASCII pattern).

Counting semantics: ALL occurrences, overlapping included — one match
per (position, pattern) with the pattern ending at that position; this
is exactly what the automaton's suffix-resolved output sets yield, and
what the SQL oracle reproduces with a substr position scan.

Scale shape at 100 TB: the DFA is O(total pattern bytes * 256) ints
broadcast once per actor; the scan is embarrassingly parallel
map_batches with NO exchange; output is one row per document.

Reference anchor: the reference's clean-set membership filter
(link_prediction_metadata.py:100-109,365) is the same shape — a
broadcast small side filtering a big table — with the membership test
upgraded from exact id equality to multi-pattern text search.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import pyarrow as pa


def build_automaton(patterns: Sequence[str]) -> Tuple[np.ndarray,
                                                      np.ndarray,
                                                      np.ndarray]:
    """Build the suffix-resolved Aho-Corasick DFA.

    Returns (delta, n_out, mask):
      delta : int32 [n_states, 256] full transition table (failure
              links folded in; state 0 = root)
      n_out : int64 [n_states] number of patterns ending at the state
              (suffix outputs included)
      mask  : uint64 [n_states] bitmask of pattern indices matched on
              entering the state (suffix outputs included)
    """
    pats = [p.encode("ascii") for p in patterns]
    if not pats:
        raise ValueError("patterns must be non-empty")
    if len(pats) > 64:
        raise ValueError("at most 64 patterns (uint64 bitmask)")
    if any(len(p) == 0 for p in pats):
        raise ValueError("empty pattern")

    # trie
    goto: List[dict] = [{}]
    out_mask = [0]
    for i, p in enumerate(pats):
        s = 0
        for ch in p:
            if ch not in goto[s]:
                goto.append({})
                out_mask.append(0)
                goto[s][ch] = len(goto) - 1
            s = goto[s][ch]
        out_mask[s] |= 1 << i

    n = len(goto)
    fail = np.zeros(n, dtype=np.int64)
    delta = np.zeros((n, 256), dtype=np.int32)
    # BFS: resolve failure links and fold them into a dense DFA
    from collections import deque

    q = deque()
    for ch in range(256):
        s = goto[0].get(ch, 0)
        delta[0, ch] = s
        if s:
            fail[s] = 0
            q.append(s)
    while q:
        r = q.popleft()
        out_mask[r] |= out_mask[fail[r]]
        for ch, s in goto[r].items():
            fail[s] = delta[fail[r], ch]
            q.append(s)
        for ch in range(256):
            if ch in goto[r]:
                delta[r, ch] = goto[r][ch]
            else:
                delta[r, ch] = delta[fail[r], ch]

    mask = np.array(out_mask, dtype=np.uint64)
    n_out = np.array([bin(m).count("1") for m in out_mask],
                     dtype=np.int64)
    return delta, n_out, mask


def _scan_batch(texts, delta: np.ndarray, n_out: np.ndarray,
                mask: np.ndarray):
    """Vectorized-across-docs scan.  Returns (n_matches, pat_mask)."""
    enc = [t.encode("utf-8") if isinstance(t, str) else bytes(t or b"")
           for t in texts]
    nd = len(enc)
    if nd == 0:
        return (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.uint64))
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=nd)
    maxlen = int(lens.max()) if nd else 0
    n_matches = np.zeros(nd, dtype=np.int64)
    pmask = np.zeros(nd, dtype=np.uint64)
    if maxlen == 0:
        return n_matches, pmask
    # pad with byte 0 (root self-loop unless a pattern uses NUL — the
    # ascii contract excludes NUL in practice; padded tails also reset
    # state, which is harmless because counts are gated on i < len)
    buf = np.zeros((nd, maxlen), dtype=np.uint8)
    for r, b in enumerate(enc):
        if b:
            buf[r, :len(b)] = np.frombuffer(b, dtype=np.uint8)
    state = np.zeros(nd, dtype=np.int32)
    for i in range(maxlen):
        state = delta[state, buf[:, i]]
        live = i < lens
        n_matches[live] += n_out[state[live]]
        pmask[live] |= mask[state[live]]
    return n_matches, pmask


class ACScanStage:
    """Actor-pool stage: pass to ``map_batches(ACScanStage,
    fn_constructor_args=(patterns, id_col, text_col),
    concurrency=N, batch_size=B)``.  Emits
    (id_col, n_matches, n_patterns, blocked) per document."""

    def __init__(self, patterns: Sequence[str], id_col: str = "doc_id",
                 text_col: str = "text"):
        self.delta, self.n_out, self.mask = build_automaton(patterns)
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, b: pa.Table) -> pa.Table:
        texts = b.column(self.text_col).to_pylist()
        n, pm = _scan_batch(texts, self.delta, self.n_out, self.mask)
        k = np.array([bin(int(m)).count("1") for m in pm],
                     dtype=np.int64)
        return pa.table({self.id_col: b.column(self.id_col),
                         "n_matches": pa.array(n, type=pa.int64()),
                         "n_patterns": pa.array(k, type=pa.int64()),
                         "blocked": pa.array(n > 0, type=pa.bool_())})


def blocklist_scan(docs, patterns: Sequence[str], *,
                   id_col: str = "doc_id", text_col: str = "text",
                   concurrency=(1, 8), batch_size: int = 256):
    """Scan every document against the pattern list; returns
    (id_col, n_matches, n_patterns, blocked).

    ``concurrency`` MUST stay an autoscaling (min, max) tuple, never a
    fixed int: a fixed pool of size == session CPUs reserves every
    core and starves the upstream read task — a scheduling deadlock
    observed at the 4-CPU test session (the actor-pool analogue of
    the native-join gotcha; min=1 lets the scheduler keep the read
    running)."""
    if isinstance(concurrency, int):
        concurrency = (1, concurrency)
    return docs.select_columns([id_col, text_col]).map_batches(
        ACScanStage, fn_constructor_args=(list(patterns), id_col,
                                          text_col),
        concurrency=concurrency, batch_size=batch_size,
        batch_format="pyarrow")
