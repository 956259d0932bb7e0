"""Exact substring dedup (Lee et al. 2022 ExactSubstr formulation):
crafted-overlap corpora vs an independent per-position pure-Python
oracle, partitioning invariance, and edge cases.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.ops.dedup import substring_dedup


def oracle(docs, L, min_count=2):
    """Independent per-position implementation of the same definition:
    every corpus-duplicated L-char-gram keeps only its globally-first
    (doc, pos) occurrence; all other occurrences cover [pos, pos+L);
    covered characters are removed."""
    first = {}
    counts = {}
    for doc_id, text in docs:
        for p in range(len(text) - L + 1):
            g = text[p:p + L]
            counts[g] = counts.get(g, 0) + 1
            if g not in first:
                first[g] = (doc_id, p)
    out = {}
    for doc_id, text in docs:
        cov = [False] * len(text)
        for p in range(len(text) - L + 1):
            g = text[p:p + L]
            if counts[g] >= min_count and first[g] != (doc_id, p):
                for q in range(p, p + L):
                    cov[q] = True
        out[doc_id] = "".join(c for c, m in zip(text, cov) if not m)
    return out


def _ds(docs, parts=1):
    t = pa.table({
        "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
        "text": pa.array([t for _, t in docs], type=pa.string())})
    ds = rd.from_arrow(t)
    return ds.repartition(parts) if parts > 1 else ds


def _run(docs, L, parts=1):
    res = substring_dedup(_ds(docs, parts), min_len=L).to_pandas()
    return dict(zip(res.doc_id, res.text_dedup)), res


def test_cross_doc_overlap_exact():
    shared = "the quick brown fox jumps over the lazy dog again"
    docs = [(0, "AAA " + shared + " tail-zero"),
            (1, "intro one " + shared + " BBB"),
            (2, "no overlap here at all, totally unique content x")]
    L = 20
    got, res = _run(docs, L)
    exp = oracle(docs, L)
    assert got == exp
    # the first occurrence (doc 0) survives intact; doc 1 loses the span
    assert shared in got[0]
    assert shared not in got[1]
    assert got[2] == docs[2][1]
    r = res.set_index("doc_id")
    assert (r.kept_chars + r.removed_chars).tolist() == \
        [len(t) for _, t in docs]


def test_within_doc_repeat():
    span = "x" * 5 + "abcdefghijklmnopqrstuv" + "y" * 5
    docs = [(7, span + " middle " + span)]
    L = 12
    got, _ = _run(docs, L)
    assert got == oracle(docs, L)
    # second occurrence is removed entirely (every window duplicated)
    assert got[7].count("abcdefghijklmnopqrstuv") == 1


def test_unique_corpus_unchanged():
    rng = np.random.default_rng(0)
    docs = [(i, "".join(chr(97 + c) for c in
                        rng.integers(0, 26, 120))) for i in range(6)]
    got, res = _run(docs, 15)
    assert got == {d: t for d, t in docs}
    assert (res.removed_chars == 0).all()


def test_partitioning_invariance():
    shared = "zzzz shared duplicated substring payload qqqq"
    rng = np.random.default_rng(3)
    docs = []
    for i in range(24):
        junk = "".join(chr(97 + c) for c in rng.integers(0, 26, 60))
        docs.append((i, junk + (shared if i % 3 == 0 else "") + junk[::-1]))
    a, _ = _run(docs, 18, parts=1)
    b, _ = _run(docs, 18, parts=7)
    assert a == b == oracle(docs, 18)


def test_short_docs_and_unicode():
    docs = [(0, "tiny"), (1, ""), (2, "héllo wörld ünïcode " * 4)]
    L = 10
    got, _ = _run(docs, L)
    assert got == oracle(docs, L)
    assert got[0] == "tiny" and got[1] == ""


def test_validation():
    with pytest.raises(ValueError):
        substring_dedup(_ds([(0, "abc")]), min_len=1)
