"""resolve_pointers: crafted chains, cycles, bound saturation, and
layout invariance."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.graph.redirects import resolve_pointers


def _m(pairs, blocks=1):
    df = pd.DataFrame(pairs, columns=["src", "dst"])
    return rd.from_pandas(df).repartition(blocks)


def _res(pairs, rounds=5, blocks=1):
    out = resolve_pointers(_m(pairs, blocks), rounds=rounds)
    return {r.k: (r.final, r.hops) for r in out.to_pandas().itertuples()}


def test_chain_resolves_to_terminal_with_hops():
    # a -> b -> c -> d (terminal)
    got = _res([("a", "b"), ("b", "c"), ("c", "d")])
    assert got == {"a": ("d", 3), "b": ("d", 2), "c": ("d", 1)}


def test_cycle_saturates_bound():
    # x <-> y plus a tail in: t -> x; 2^5 = 32 hop bound
    got = _res([("x", "y"), ("y", "x"), ("t", "x")])
    assert got["x"] == ("x", 32)
    assert got["y"] == ("y", 32)
    # t after 32 hops: t->x is hop 1, then 31 more around the 2-cycle
    assert got["t"] == ("y", 32)


def test_self_pointer_is_terminal():
    got = _res([("a", "b"), ("b", "b")])
    # b's self-pointer is dropped (terminal); only a is chased
    assert got == {"a": ("b", 1)}


def test_long_chain_truncates_at_bound():
    n = 40
    pairs = [(f"v{i:03d}", f"v{i+1:03d}") for i in range(n)]
    got = _res(pairs, rounds=3)  # 8-hop bound
    assert got["v000"] == ("v008", 8)
    assert got[f"v{n-1:03d}"] == (f"v{n:03d}", 1)


def test_layout_invariance():
    pairs = [(f"a{i}", f"a{(i * 7 + 3) % 50}") for i in range(50)]
    pairs = [(a, b) for a, b in pairs if a != b]
    r1 = _res(pairs, blocks=1)
    r2 = _res(pairs, blocks=7)
    assert r1 == r2
