"""Edit-distance near-dup verification vs a full-DP reference."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.dedup import (
    edit_distance_bound, edit_similarity_pairs)


def levenshtein_ref(a: bytes, b: bytes) -> int:
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev = dp[0]
        dp[0] = i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                        prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


def test_classics():
    assert edit_distance_bound(b"kitten", b"sitting", 10) == 3
    assert edit_distance_bound(b"", b"", 0) == 0
    assert edit_distance_bound(b"abc", b"", 3) == 3
    assert edit_distance_bound(b"abc", b"", 2) == 3  # k+1
    assert edit_distance_bound(b"flaw", b"lawn", 10) == 2


@pytest.mark.parametrize("seed", range(4))
def test_random_matches_reference(seed):
    rng = np.random.default_rng(seed)
    for _ in range(25):
        m, n = rng.integers(0, 40, 2)
        a = bytes(rng.integers(97, 101, m).astype(np.uint8))
        b = bytes(rng.integers(97, 101, n).astype(np.uint8))
        exact = levenshtein_ref(a, b)
        assert edit_distance_bound(a, b, 80) == exact
        # early-abandon bound semantics
        for k in (0, exact - 1, exact, exact + 3):
            if k < 0:
                continue
            got = edit_distance_bound(a, b, k)
            assert got == (exact if exact <= k else k + 1), (a, b, k)


def test_symmetry():
    rng = np.random.default_rng(9)
    for _ in range(10):
        a = bytes(rng.integers(97, 105, 30).astype(np.uint8))
        b = bytes(rng.integers(97, 105, 25).astype(np.uint8))
        assert edit_distance_bound(a, b, 60) == edit_distance_bound(b, a, 60)


def _mutate(rng, s, n_edits):
    s = list(s)
    for _ in range(n_edits):
        op = rng.integers(0, 3)
        pos = rng.integers(0, len(s))
        if op == 0:
            s[pos] = chr(rng.integers(97, 123))
        elif op == 1:
            s.insert(pos, chr(rng.integers(97, 123)))
        elif len(s) > 1:
            del s[pos]
    return "".join(s)


@pytest.mark.parametrize("parts", [4, 16])
def test_pair_verification(parts):
    rng = np.random.default_rng(3)
    base = "".join(chr(rng.integers(97, 123)) for _ in range(400))
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [base,                      # 0
                 _mutate(rng, base, 20),    # 1: near-dup of 0
                 _mutate(rng, base, 300),   # 2: heavily mutated
                 "completely different short text"]})  # 3
    cand = pd.DataFrame({"a": np.array([0, 0, 0], dtype=np.int64),
                         "b": np.array([1, 2, 3], dtype=np.int64)})
    out = edit_similarity_pairs(
        rd.from_pandas(cand), rd.from_pandas(docs),
        min_sim=0.8, num_parts=parts).to_pandas()
    assert set(zip(out.doc_a, out.doc_b)) == {(0, 1)}
    sim = out.edit_sim.iloc[0]
    ref = levenshtein_ref(base.encode(), docs.text[1].encode())
    mx = max(len(base.encode()), len(docs.text[1].encode()))
    assert np.isclose(sim, 1 - ref / mx)
    assert sim >= 0.8


def test_validation():
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.array([0], dtype=np.int64), "text": ["x"]}))
    cand = rd.from_pandas(pd.DataFrame(
        {"a": np.array([0], dtype=np.int64),
         "b": np.array([0], dtype=np.int64)}))
    with pytest.raises(ValueError, match="min_sim"):
        edit_similarity_pairs(cand, docs, min_sim=0.0)
    with pytest.raises(ValueError, match="k must"):
        edit_distance_bound(b"a", b"b", -1)
