"""TextRank keyword extraction vs a sequential pure-Python oracle.

The oracle rebuilds the co-occurrence graph with the same
single-space-split / least-greatest-pair / window conventions as
functions/collocations.py and runs the weighted-PageRank NumPy replay
(tests/oracle.py) — scores must agree allclose 1e-6 per token, and the
result must be invariant to the input block layout.
"""

import collections

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.textrank import (
    cooccurrence_pairs, textrank_keywords)
from tests.oracle import pagerank_weighted_oracle

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick red fox runs past the sleeping dog",
    "a slow green turtle walks under the busy bridge",
    "ray data pipelines stream arrow batches with backpressure",
    "arrow batches flow through ray data pipelines quickly",
    "",
    "single",
]


def _oracle_pairs(texts, window):
    c = collections.Counter()
    for t in texts:
        toks = t.split(" ")
        for i, a in enumerate(toks):
            for k in range(1, window + 1):
                if i + k >= len(toks):
                    break
                b = toks[i + k]
                if a != b:
                    c[(min(a, b), max(a, b))] += 1
    return c


def _oracle_textrank(texts, window, d=0.85, tol=1e-6):
    pairs = _oracle_pairs(texts, window)
    toks = sorted({t for ab in pairs for t in ab})
    ix = {t: i for i, t in enumerate(toks)}
    src, dst, w = [], [], []
    for (a, b), n in pairs.items():
        src += [ix[a], ix[b]]
        dst += [ix[b], ix[a]]
        w += [float(n), float(n)]
    r, _ = pagerank_weighted_oracle(len(toks), np.array(src), np.array(dst),
                                    np.array(w), d=d, tol=tol)
    return {t: r[ix[t]] for t in toks}


def _docs_ds(texts, blocks=1):
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    return rd.from_pandas(df).repartition(blocks)


def test_cooccurrence_counts_exact():
    got = cooccurrence_pairs(_docs_ds(DOCS), window=2).to_pandas()
    exp = _oracle_pairs(DOCS, 2)
    assert len(got) == len(exp)
    for row in got.itertuples():
        assert exp[(row.a, row.b)] == row.n


def test_textrank_matches_sequential_oracle(tmp_path):
    out, info = textrank_keywords(_docs_ds(DOCS), str(tmp_path / "wd"),
                                  window=2, round_to=None)
    got = out.to_pandas().set_index("token")["rank"]
    exp = _oracle_textrank(DOCS, 2)
    assert set(got.index) == set(exp)
    for t, v in exp.items():
        assert got[t] == pytest.approx(v, abs=2e-6)
    # isolated tokens ("single", "") carry no edges and no rank
    assert "single" not in got.index
    assert info["n_tokens"] == len(exp)


def test_textrank_layout_invariance(tmp_path):
    a, _ = textrank_keywords(_docs_ds(DOCS, blocks=1),
                             str(tmp_path / "w1"), window=2)
    b, _ = textrank_keywords(_docs_ds(DOCS, blocks=5),
                             str(tmp_path / "w5"), window=2)
    pa_ = a.to_pandas().sort_values("token").reset_index(drop=True)
    pb_ = b.to_pandas().sort_values("token").reset_index(drop=True)
    pd.testing.assert_frame_equal(pa_, pb_)
