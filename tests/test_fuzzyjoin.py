"""symspell_pairs vs brute-force Levenshtein over the vocabulary."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.fuzzyjoin import (_variants,
                                                          symspell_pairs)


def _lev(a, b):
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                     prev + (a[i - 1] != b[j - 1]))
    return dp[n]


def _brute_pairs(vocab, d):
    out = set()
    vs = sorted(vocab)
    for i in range(len(vs)):
        for j in range(i + 1, len(vs)):
            dd = _lev(vs[i], vs[j])
            if dd <= d:
                out.add((vs[i], vs[j], dd))
    return out


def _ds(vocab):
    return rd.from_pandas(pd.DataFrame({"token": sorted(vocab)}))


def test_variants_d1_and_d2():
    assert _variants("abc", 1) == {"abc", "bc", "ac", "ab"}
    v2 = _variants("abc", 2)
    assert {"a", "b", "c"} <= v2 and "abc" in v2


def test_d1_matches_bruteforce():
    vocab = {"table", "tables", "tible", "fable", "scan", "scam",
             "scant", "spark", "spork", "zzz", "query"}
    out = symspell_pairs(_ds(vocab), max_dist=1).to_pandas()
    got = set(zip(out.a, out.b, out.dist))
    assert got == _brute_pairs(vocab, 1)


def test_d2_matches_bruteforce():
    vocab = {"kitten", "sitten", "sittin", "mitten", "bitten",
             "kitchen", "widget"}
    out = symspell_pairs(_ds(vocab), max_dist=2).to_pandas()
    got = set(zip(out.a, out.b, out.dist))
    assert got == _brute_pairs(vocab, 2)


def test_random_vocab_d1():
    rng = np.random.default_rng(17)
    vocab = {"".join(rng.choice(list("abcd"), size=rng.integers(3, 7)))
             for _ in range(120)}
    out = symspell_pairs(_ds(vocab), max_dist=1).to_pandas()
    got = set(zip(out.a, out.b, out.dist))
    assert got == _brute_pairs(vocab, 1)


def test_layout_invariance_and_validation():
    vocab = {"alpha", "alphb", "beta", "betas", "gamma"}
    a = symspell_pairs(_ds(vocab), max_dist=1).to_pandas()
    b = symspell_pairs(_ds(vocab).repartition(4),
                       max_dist=1).to_pandas()
    key = ["a", "b", "dist"]
    pd.testing.assert_frame_equal(
        a[key].sort_values(["a", "b"]).reset_index(drop=True),
        b[key].sort_values(["a", "b"]).reset_index(drop=True))
    with pytest.raises(ValueError):
        symspell_pairs(_ds(vocab), max_dist=0)


def test_group_cap_truncation_is_logged(caplog):
    import logging

    from halvesting_geometric_ray.functions.fuzzyjoin import \
        _apply_group_cap

    # 1-char tokens all share the empty-string deletion variant;
    # a cap there must be logged with a drop count, not silently
    # absorbed (the worker-side map_groups calls this same helper)
    with caplog.at_level(logging.WARNING,
                         logger="halvesting_geometric_ray.fuzzyjoin"):
        kept = _apply_group_cap(["a", "b", "c", "d"], 2, "")
    assert kept == ["a", "b"]
    msgs = [r.message for r in caplog.records
            if "group_cap" in r.message]
    assert msgs, "expected a truncation warning"
    assert "dropping 2 tokens" in msgs[0]
    # no log when under the cap or uncapped
    caplog.clear()
    assert _apply_group_cap(["a", "b"], 2, "") == ["a", "b"]
    assert _apply_group_cap(["a", "b", "c"], None, "") == \
        ["a", "b", "c"]
    assert not caplog.records
