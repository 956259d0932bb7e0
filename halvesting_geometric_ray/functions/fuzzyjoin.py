"""SymSpell-style fuzzy matching: all token pairs within Levenshtein
distance ``max_dist``, found via the deletion-neighborhood index
(Garbe's SymSpell; the spell-candidate / fuzzy-join blocking scheme) —
the record-linkage primitive of a web-corpus pipeline (query/anchor
normalization, near-miss vocabulary folding before tokenizer
training).

Completeness guarantee: if lev(a, b) <= d then deleting at most d
characters from each reaches a COMMON string, so generating every
<= d-deletion variant of every token and grouping on the variant
yields a candidate superset — no pair is missed.  Candidates are then
verified with the early-abandoned banded Levenshtein shared with the
edit-near-dup suite (functions/dedup.py::edit_distance_bound; byte
level == character level for ASCII tokens, the documented contract).

Scale shape: a token of length L emits O(L^d) variants (d=1 default —
L+1 variants); the exchange is the grouped variant join; per-variant
groups are bounded by ``group_cap`` (hot variants — e.g. the empty
string from 1-char tokens — generate pairs quadratically; the cap is
an explicit, logged decision exactly like the wedge hub guards).
Verification touches candidates only.

Reference anchor: the reference resolves citations by EXACT (title,
year) equality (link_prediction_metadata.py:321-326) and documents the
resulting misses; this operator is the principled fuzzy upgrade of
that resolution join.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from .dedup import edit_distance_bound


def _variants(tok: str, d: int):
    """All strings reachable with <= d deletions (tok included)."""
    out = {tok}
    frontier = {tok}
    for _ in range(d):
        nxt = set()
        for t in frontier:
            for i in range(len(t)):
                nxt.add(t[:i] + t[i + 1:])
        nxt -= out
        out |= nxt
        frontier = nxt
    return out


def _apply_group_cap(ts, group_cap, variant):
    """Truncate a hot variant group to ``group_cap`` tokens, logging
    the drop count — an explicit, logged cap decision (runs inside
    the map_groups worker; the log lands in the worker's stderr)."""
    if group_cap is not None and len(ts) > group_cap:
        import logging
        logging.getLogger(
            "halvesting_geometric_ray.fuzzyjoin").warning(
            "symspell_pairs: variant %r has %d tokens > group_cap=%d;"
            " dropping %d tokens from this group (pairs between "
            "dropped tokens may be missed)",
            variant, len(ts), group_cap, len(ts) - group_cap)
        return ts[:group_cap]
    return ts


def symspell_pairs(tokens, col: str = "token", *, max_dist: int = 1,
                   num_parts: int = 16,
                   group_cap: Optional[int] = 10000):
    """All unordered pairs of DISTINCT input tokens with
    lev(a, b) <= max_dist.  Returns (a, b, dist) with a < b.
    ``tokens`` must be one row per distinct token (dedup upstream).

    Completeness caveat: a variant group larger than ``group_cap``
    tokens (e.g. the empty-string variant shared by every 1-char token
    at max_dist=1) is truncated to its first ``group_cap`` tokens in
    sort order, and the truncation is logged with the drop count —
    pairs between two dropped tokens of that group can be missed.
    Pass ``group_cap=None`` for the exact (possibly quadratic) run."""
    from ..ops.dedup import distinct

    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")

    d = max_dist

    def gen(b: pa.Table) -> pa.Table:
        toks = b.column(col).to_pylist()
        vs, ts = [], []
        for t in toks:
            if t is None:
                continue
            for v in _variants(t, d):
                vs.append(v)
                ts.append(t)
        return pa.table({"v": pa.array(vs, type=pa.string()),
                         "t": pa.array(ts, type=pa.string())})

    var = tokens.map_batches(gen, batch_format="pyarrow",
                             zero_copy_batch=True)

    def pairs(g: pa.Table) -> pa.Table:
        ts = sorted(set(g.column("t").to_pylist()))
        ts = _apply_group_cap(
            ts, group_cap,
            g.column("v")[0].as_py() if g.num_rows else "")
        a_, b_ = [], []
        for i in range(len(ts)):
            for j in range(i + 1, len(ts)):
                a_.append(ts[i])
                b_.append(ts[j])
        return pa.table({"a": pa.array(a_, type=pa.string()),
                         "b": pa.array(b_, type=pa.string())})

    from ..ops._util import pre_shuffle

    cand = (pre_shuffle(var)
            .groupby("v")
            .map_groups(pairs, batch_format="pyarrow",
                        retry_exceptions=True))
    cand = distinct(cand, ["a", "b"], num_parts=num_parts)

    def verify(b: pa.Table) -> pa.Table:
        av = b.column("a").to_pylist()
        bv = b.column("b").to_pylist()
        keep, dist = [], []
        for x, y in zip(av, bv):
            dd = edit_distance_bound(x.encode(), y.encode(), d)
            keep.append(dd <= d)
            dist.append(dd)
        t = b.filter(pa.array(keep))
        dist = [dd for dd, k in zip(dist, keep) if k]
        return pa.table({"a": t.column("a"), "b": t.column("b"),
                         "dist": pa.array(dist, type=pa.int64())})

    return cand.map_batches(verify, batch_format="pyarrow",
                            zero_copy_batch=True)
