"""Directed triad census (graph/triads.py) vs an INDEPENDENT oracle:
brute-force triple enumeration classified by digraph isomorphism
against exemplar triads built from the published Holland-Leinhardt
pictograms — no shared classification code with the engine."""

from itertools import combinations, permutations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.config import EngineConfig
from halvesting_geometric_ray.graph.triads import (TRIAD_NAMES,
                                                   classify_bits,
                                                   triad_census,
                                                   triad_census_table)

# exemplar arc sets over vertices 0,1,2 straight from the pictograms
# (A=0, B=1, C=2); e.g. 021D = "A<-B->C", 111U = "A<->B->C"
_EXEMPLARS = {
    "003": set(),
    "012": {(0, 1)},
    "102": {(0, 1), (1, 0)},
    "021D": {(1, 0), (1, 2)},
    "021U": {(0, 1), (2, 1)},
    "021C": {(0, 1), (1, 2)},
    "111D": {(0, 1), (1, 0), (2, 1)},
    "111U": {(0, 1), (1, 0), (1, 2)},
    "030T": {(0, 1), (2, 1), (0, 2)},
    "030C": {(1, 0), (2, 1), (0, 2)},
    "201": {(0, 1), (1, 0), (0, 2), (2, 0)},
    "120D": {(1, 0), (1, 2), (0, 2), (2, 0)},
    "120U": {(0, 1), (2, 1), (0, 2), (2, 0)},
    "120C": {(0, 1), (1, 2), (0, 2), (2, 0)},
    "210": {(0, 1), (1, 0), (0, 2), (2, 0), (1, 2)},
    "300": {(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)},
}


def _iso_type(arcs):
    """Classify a 3-vertex digraph (arcs over {0,1,2}) by isomorphism
    search against the exemplars."""
    for name, ex in _EXEMPLARS.items():
        if len(ex) != len(arcs):
            continue
        for p in permutations(range(3)):
            if {(p[a], p[b]) for a, b in arcs} == ex:
                return name
    raise AssertionError(f"unclassifiable {arcs}")


def _census_oracle(n, arcs):
    """Brute-force census over all C(n,3) triples."""
    aset = set(arcs)
    out = {t: 0 for t in TRIAD_NAMES}
    for tri in combinations(range(n), 3):
        idx = {v: i for i, v in enumerate(tri)}
        sub = {(idx[a], idx[b]) for a, b in aset
               if a in idx and b in idx}
        out[_iso_type(sub)] += 1
    return out


def test_classify_bits_matches_isomorphism_oracle():
    """The engine's 64-entry derived table agrees with independent
    exemplar isomorphism on EVERY possible triple pattern."""
    for bits in range(64):
        arcs = set()
        for bit, arc in [(1, (0, 1)), (2, (1, 0)), (4, (0, 2)),
                         (8, (2, 0)), (16, (1, 2)), (32, (2, 1))]:
            if bits & bit:
                arcs.add(arc)
        assert classify_bits(bits) == _iso_type(arcs), bits


def _edges_ds(arcs):
    return rd.from_pandas(pd.DataFrame({
        "src": np.array([a for a, _ in arcs], dtype=np.int64),
        "dst": np.array([b for _, b in arcs], dtype=np.int64)}))


def _random_arcs(rng, n, m):
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    return [(int(a), int(b)) for a, b in zip(src, dst) if a != b]


def test_census_random_graph_matches_bruteforce():
    rng = np.random.default_rng(17)
    n = 30
    arcs = _random_arcs(rng, n, 140)
    # census n = touched vertices; remap so every vid has an arc
    touched = sorted({v for a in arcs for v in a})
    remap = {v: i for i, v in enumerate(touched)}
    arcs = [(remap[a], remap[b]) for a, b in arcs]
    exp = _census_oracle(len(touched), arcs)
    got = triad_census(_edges_ds(arcs), EngineConfig(num_parts=6))
    assert got == exp
    assert sum(got.values()) == len(touched) * (len(touched) - 1) \
        * (len(touched) - 2) // 6
    # the random fixture must exercise the interesting rows
    assert got["030T"] + got["030C"] + got["120C"] + got["210"] > 0


def test_census_reciprocal_and_dag_invariants():
    # complete mutual digraph on 5: every triple is 300
    arcs = [(a, b) for a in range(5) for b in range(5) if a != b]
    got = triad_census(_edges_ds(arcs), EngineConfig(num_parts=3))
    assert got["300"] == 10 and sum(got.values()) == 10
    # a DAG has no mutual dyads and no 3-cycles
    rng = np.random.default_rng(3)
    arcs = [(a, b) for a, b in _random_arcs(rng, 25, 90) if a < b]
    touched = sorted({v for a in arcs for v in a})
    remap = {v: i for i, v in enumerate(touched)}
    arcs = [(remap[a], remap[b]) for a, b in arcs]
    got = triad_census(_edges_ds(arcs), EngineConfig(num_parts=4))
    exp = _census_oracle(len(touched), arcs)
    assert got == exp
    for t in ("030C", "102", "111D", "111U", "201", "120D", "120U",
              "120C", "210", "300"):
        assert got[t] == 0


def test_partitioning_invariance_and_table():
    rng = np.random.default_rng(23)
    arcs = _random_arcs(rng, 40, 220)
    a = triad_census(_edges_ds(arcs), EngineConfig(num_parts=3))
    b = triad_census(_edges_ds(arcs), EngineConfig(num_parts=16))
    assert a == b
    t = triad_census_table(_edges_ds(arcs), EngineConfig(num_parts=8))
    assert t.column("triad_type").to_pylist() == list(TRIAD_NAMES)
    assert dict(zip(t.column("triad_type").to_pylist(),
                    t.column("n").to_pylist())) == a
