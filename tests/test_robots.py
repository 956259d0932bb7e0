"""Robots longest-match decision semantics."""

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data as rd

from halvesting_geometric_ray.functions.robots import (robots_decide,
                                                       split_host_path)


def _decide(urls, rules):
    ds = rd.from_pandas(pd.DataFrame({"url": urls}))
    out = robots_decide(ds, ray.put(rules)).to_pandas()
    return {r.url: (bool(r.allowed), r.rule_prefix)
            for r in out.itertuples()}


def test_longest_match_and_allow_wins():
    rules = {"h.example": [("/a", False), ("/a/b", True),
                           ("/a/b/c", False)]}
    got = _decide(["http://h.example/a/x", "http://h.example/a/b",
                   "http://h.example/a/b/c", "http://h.example/z/1"],
                  rules)
    assert got["http://h.example/a/x"] == (False, "/a")
    assert got["http://h.example/a/b"] == (True, "/a/b")
    assert got["http://h.example/a/b/c"] == (False, "/a/b/c")
    assert got["http://h.example/z/1"] == (True, "")  # no match


def test_equal_length_tie_allow_wins():
    rules = {"h.example": [("/ab", False), ("/a" + "b", True)]}
    # identical prefixes with conflicting verdicts: allow wins (REP)
    got = _decide(["http://h.example/ab/1"], rules)
    assert got["http://h.example/ab/1"][0] is True


def test_unknown_host_allowed():
    rules = {"other.example": [("/", False)]}
    got = _decide(["http://h.example/a/b"], rules)
    assert got["http://h.example/a/b"] == (True, "")


def test_split_host_path():
    h, p = split_host_path(np.asarray(
        ["https://x.example/p/1", "https://y.example/a/b"],
        dtype=object))
    assert list(h) == ["x.example", "y.example"]
    assert list(p) == ["/p/1", "/a/b"]


def test_crawl_budget_apportionment():
    """Hamilton apportionment invariants on the gate output: quotas
    sum exactly to the budget, every quota within 1 of the exact
    proportional share (the largest-remainder property)."""
    from halvesting_geometric_ray.queries_graph import QUERIES

    out = QUERIES["q_crawl_budget"]("/root/testdata/sf0.001")
    total = out.n_pages.sum()
    exact = out.n_pages.to_numpy() * 10000 / total
    assert out.quota.sum() == 10000
    assert (np.abs(out.quota.to_numpy() - exact) < 1.0).all()


def test_null_url_allowed_by_default():
    # null urls match no host rule -> allowed, prefix ''; previously
    # raised AttributeError on None.split
    rules = {"h.example": [("/", False)]}
    ds = rd.from_pandas(pd.DataFrame(
        {"url": ["http://h.example/a/b", None]}))
    out = robots_decide(ds, ray.put(rules)).to_pandas()
    by_null = out[out.url.isna()]
    assert len(by_null) == 1
    assert bool(by_null.allowed.iloc[0]) is True
    assert by_null.rule_prefix.iloc[0] == ""


def test_split_host_path_any_segment_count():
    h, p = split_host_path(np.asarray(
        ["https://x.example/a", "https://x.example/a/b/c/d",
         "https://x.example", None], dtype=object))
    assert list(h) == ["x.example", "x.example", "x.example", ""]
    assert list(p) == ["/a", "/a/b/c/d", "/", "/"]
