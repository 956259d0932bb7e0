"""Aho-Corasick blocklist scan vs a brute-force position oracle."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.acscan import (blocklist_scan,
                                                       build_automaton,
                                                       _scan_batch)


def _brute(text, patterns):
    n = 0
    hit = set()
    for p in patterns:
        for i in range(len(text) - len(p) + 1):
            if text[i:i + len(p)] == p:
                n += 1
                hit.add(p)
    return n, len(hit)


PATS = ["table", "tab", "an", "scan", "aa"]


def test_overlapping_and_nested_matches():
    cases = ["scan the table tab", "aaaa", "tantab", "", "xyz",
             "antable scant"]
    delta, n_out, mask = build_automaton(PATS)
    n, pm = _scan_batch(cases, delta, n_out, mask)
    for i, t in enumerate(cases):
        bn, bk = _brute(t, PATS)
        assert n[i] == bn, t
        assert bin(int(pm[i])).count("1") == bk, t


def test_aaaa_overlap_count():
    # "aa" occurs 3 times in "aaaa" (overlapping semantics)
    delta, n_out, mask = build_automaton(["aa"])
    n, _ = _scan_batch(["aaaa"], delta, n_out, mask)
    assert n[0] == 3


def test_random_texts_match_bruteforce():
    rng = np.random.default_rng(7)
    texts = ["".join(rng.choice(list("atbلn s"), size=rng.integers(0, 60)))
             for _ in range(80)]
    delta, n_out, mask = build_automaton(PATS)
    n, pm = _scan_batch(texts, delta, n_out, mask)
    for i, t in enumerate(texts):
        bn, bk = _brute(t, PATS)
        assert n[i] == bn
        assert bin(int(pm[i])).count("1") == bk


def test_dataset_stage_and_blocked_flag():
    pdf = pd.DataFrame({"doc_id": [1, 2, 3],
                        "text": ["a table", "nothing here", ""]})
    out = (blocklist_scan(rd.from_pandas(pdf), ["table", "tab"],
                          concurrency=2, batch_size=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out.n_matches) == [2, 0, 0]
    assert list(out.n_patterns) == [2, 0, 0]
    assert list(out.blocked) == [True, False, False]


def test_validation():
    with pytest.raises(ValueError):
        build_automaton([])
    with pytest.raises(ValueError):
        build_automaton(["ok", ""])
    with pytest.raises(ValueError):
        build_automaton(["p"] * 65)
