"""Duplicate n-gram span dedup (ops/dedup.py::span_dedup) vs an exact
pure-Python oracle, plus partitioning invariance and shape checks."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.ops.dedup import span_dedup


def span_dedup_oracle(docs, n, min_count):
    """Exact reference semantics: hot = n-grams (token tuples) with
    corpus count >= min_count; keeper = (min doc_id, min pos); covered
    = union of hot non-keeper windows; kept tokens re-joined with ' '."""
    toks = {d: t.split() for d, t in docs}
    counts, keeper = {}, {}
    for d in sorted(toks):
        t = toks[d]
        for i in range(len(t) - n + 1):
            g = tuple(t[i:i + n])
            counts[g] = counts.get(g, 0) + 1
            if g not in keeper:
                keeper[g] = (d, i)
    hot = {g for g, c in counts.items() if c >= min_count}
    out = {}
    for d, t in toks.items():
        cov = np.zeros(len(t), dtype=bool)
        for i in range(len(t) - n + 1):
            g = tuple(t[i:i + n])
            if g in hot and keeper[g] != (d, i):
                cov[i:i + n] = True
        kept = [w for w, c in zip(t, cov) if not c]
        out[d] = (" ".join(kept), len(kept), len(t) - len(kept))
    return out


def _run(docs, n, min_count, **kw):
    ds = rd.from_pandas(pd.DataFrame(docs, columns=["doc_id", "text"]))
    got = (span_dedup(ds, n=n, min_count=min_count, **kw)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    exp = span_dedup_oracle(docs, n, min_count)
    assert len(got) == len(docs)
    for _, r in got.iterrows():
        e_text, e_kept, e_rm = exp[r.doc_id]
        assert r.text_dedup == e_text, (r.doc_id, r.text_dedup, e_text)
        assert r.kept_tokens == e_kept
        assert r.removed_tokens == e_rm
    return got


def test_span_dedup_crafted():
    boiler = "all rights reserved contact us here"
    docs = [
        (0, f"unique zero content {boiler} tail zero"),
        (1, f"{boiler} and one more body sentence"),
        (2, f"two body {boiler} "),
        (3, "completely unique document three"),
        (4, ""),
        (5, f"{boiler} {boiler}"),  # intra-doc repeat too
    ]
    got = _run(docs, n=3, min_count=2)
    # doc 0 holds keepers (min doc id): its boilerplate survives
    assert boiler in got.loc[0, "text_dedup"]
    for d in (1, 2, 5):
        assert boiler not in got.loc[d, "text_dedup"]
    assert got.loc[3, "text_dedup"] == "completely unique document three"
    assert got.loc[4, "text_dedup"] == ""


def test_span_dedup_intra_document_repeats():
    # a single document repeating its own n-gram trips min_count
    docs = [(7, "x y z q x y z q x y z q")]
    _run(docs, n=4, min_count=3)


def test_span_dedup_no_hot_grams_is_identity():
    docs = [(i, " ".join(f"w{i}_{j}" for j in range(8))) for i in range(6)]
    got = _run(docs, n=3, min_count=2)
    # whitespace-canonical identity
    for i in range(6):
        assert got.loc[i, "removed_tokens"] == 0


def test_span_dedup_overlapping_hot_windows():
    # keeper's span partially covered by a different hot gram's
    # non-keeper occurrence — oracle defines the exact outcome
    docs = [
        (0, "a b c d e"),
        (1, "a b c d x"),
        (2, "z b c d e"),
    ]
    _run(docs, n=4, min_count=2)


def test_span_dedup_partitioning_invariant():
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(30)]
    boiler = "the quick brown fox jumps over"
    docs = []
    for d in range(60):
        words = list(rng.choice(vocab, size=rng.integers(5, 30)))
        if d % 3 == 0:
            words = words[:4] + boiler.split() + words[4:]
        docs.append((d, " ".join(words)))
    ds1 = rd.from_pandas(pd.DataFrame(docs, columns=["doc_id", "text"]))
    a = (span_dedup(ds1, n=4, min_count=2)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    ds2 = rd.from_pandas(
        pd.DataFrame(docs, columns=["doc_id", "text"])).repartition(7)
    b = (span_dedup(ds2, n=4, min_count=2, num_parts=3)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    # and matches the oracle
    _run(docs, n=4, min_count=2)


def test_span_dedup_short_docs_and_edge_n():
    docs = [(0, "one two"), (1, "one two"), (2, "one")]
    # n longer than every doc: nothing counted, identity
    got = _run(docs, n=5, min_count=2)
    assert (got.removed_tokens == 0).all()
    # n=2: the shared bigram dedups to one copy
    got = _run(docs, n=2, min_count=2)
    assert got.loc[0, "text_dedup"] == "one two"
    assert got.loc[1, "text_dedup"] == ""
