"""BPE training/application vs a single-process Sennrich reference."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.bpe import apply_bpe, train_bpe


def ref_apply(row, a, b, c):
    out, i = [], 0
    while i < len(row):
        if i + 1 < len(row) and row[i] == a and row[i + 1] == b:
            out.append(c)
            i += 2
        else:
            out.append(row[i])
            i += 1
    return out


def ref_bpe(texts, n_merges):
    rows = [list(t.encode("utf-8")) for t in texts]
    merges = []
    for r in range(n_merges):
        counts = {}
        for row in rows:
            for x, y in zip(row, row[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + 1
        if not counts:
            break
        peak = max(counts.values())
        if peak < 2:
            break
        a, b = min(p for p, n in counts.items() if n == peak)
        merges.append((a, b, 256 + r))
        rows = [ref_apply(row, a, b, 256 + r) for row in rows]
    return merges, rows


TEXTS = ["the cat sat on the mat", "the thematic theme", "aaaa baaab",
         "", "naïve café — résumé", "zzz",
         "the the the", "mississippi"]


@pytest.mark.parametrize("n_merges", [1, 5, 20])
def test_train_matches_reference(n_merges):
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(len(TEXTS), dtype=np.int64),
         "text": TEXTS}))
    merges, info = train_bpe(docs, n_merges, num_parts=3)
    exp_merges, exp_rows = ref_bpe(TEXTS, n_merges)
    assert merges == exp_merges
    assert info["n_merges"] == len(exp_merges)
    # application parity, including multi-byte + empty docs
    enc = (apply_bpe(docs, merges).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    got_rows = [list(r) for r in enc.syms]
    assert got_rows == exp_rows


def test_partitioning_independent():
    texts = [t * 3 for t in TEXTS] * 5
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    base, _ = train_bpe(rd.from_pandas(df), 8, num_parts=2)
    for blocks, parts in [(1, 7), (6, 3)]:
        m, _ = train_bpe(rd.from_pandas(df).repartition(blocks), 8,
                         num_parts=parts)
        assert m == base, (blocks, parts)


def test_early_stop_when_nothing_repeats():
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": [0], "text": ["abcdefg"]}))
    merges, info = train_bpe(docs, 10)
    assert merges == [] and info["n_merges"] == 0


def test_overlap_run_semantics():
    # "aaaa" under (a,a): greedy leftmost -> two merged symbols
    docs = rd.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["aaaa"]}))
    merges, _ = train_bpe(docs, 1)
    a = ord("a")
    assert merges == [(a, a, 256)]
    enc = apply_bpe(docs, merges).to_pandas()
    assert list(enc.syms[0]) == [256, 256]


def test_validation():
    docs = rd.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["xy"]}))
    with pytest.raises(ValueError):
        train_bpe(docs, 0)
