"""Property fuzz: Aho-Corasick scan and SymSpell candidate
completeness vs brute-force references (hypothesis)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from halvesting_geometric_ray.functions.acscan import (_scan_batch,
                                                       build_automaton)
from halvesting_geometric_ray.functions.fuzzyjoin import _variants

_AL = "abc"


def _brute_count(text, patterns):
    n = 0
    mask = 0
    for pi, p in enumerate(patterns):
        for i in range(len(text) - len(p) + 1):
            if text[i:i + len(p)] == p:
                n += 1
                mask |= 1 << pi
    return n, mask


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(alphabet=_AL, min_size=1, max_size=4),
                min_size=1, max_size=6, unique=True),
       st.lists(st.text(alphabet=_AL, max_size=30), min_size=1,
                max_size=5))
def test_ac_scan_matches_bruteforce(patterns, texts):
    delta, n_out, mask = build_automaton(patterns)
    n, pm = _scan_batch(texts, delta, n_out, mask)
    for i, t in enumerate(texts):
        bn, bm = _brute_count(t, patterns)
        assert n[i] == bn, (patterns, t)
        assert int(pm[i]) == bm, (patterns, t)


def _lev(a, b):
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                     prev + (a[i - 1] != b[j - 1]))
    return dp[n]


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=_AL, min_size=0, max_size=8),
       st.text(alphabet=_AL, min_size=0, max_size=8),
       st.integers(min_value=1, max_value=2))
def test_symspell_blocking_complete(a, b, d):
    """The SymSpell theorem: lev(a,b) <= d implies the deletion
    neighborhoods intersect — no candidate is ever missed."""
    if _lev(a, b) <= d:
        assert _variants(a, d) & _variants(b, d), (a, b, d)
