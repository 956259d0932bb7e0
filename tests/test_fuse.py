"""Reciprocal rank fusion (ops/fuse.py): brute-force oracle, missing-
key convention, validation.  (SQL parity at the gate is swept via
q_rrf_pages in tests/test_queries_graph_oracle.py.)"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.ops.fuse import reciprocal_rank_fusion


def _ds(rows):
    q, key, s = zip(*rows)
    return rd.from_arrow(pa.table({
        "q": pa.array(list(q)), "item": pa.array(list(key)),
        "s": pa.array(list(s), type=pa.float64())}))


def test_matches_bruteforce():
    rng = np.random.default_rng(3)
    rows1 = [(f"q{i%3}", f"d{j}", float(rng.integers(0, 50)))
             for i in range(3) for j in range(12)]
    rows2 = [(f"q{i%3}", f"d{j}", float(rng.integers(0, 50)))
             for i in range(3) for j in range(12)]
    got = {(r.q, r.item): r.rrf for r in reciprocal_rank_fusion(
        [(_ds(rows1), "s", True), (_ds(rows2), "s", False)],
        partition_by="q", key="item", k=10).to_pandas().itertuples()}

    want = {}
    for rows, desc in ((rows1, True), (rows2, False)):
        byq = {}
        for q, it, s in rows:
            byq.setdefault(q, []).append((s, it))
        for q, lst in byq.items():
            lst.sort(key=lambda t: ((-t[0] if desc else t[0]), t[1]))
            for r, (_, it) in enumerate(lst, 1):
                want[(q, it)] = want.get((q, it), 0.0) + 1.0 / (10 + r)
    assert set(got) == set(want)
    for kk in got:
        assert got[kk] == pytest.approx(want[kk], abs=1e-12), kk


def test_missing_keys_contribute_no_term():
    a = _ds([("q", "x", 5.0), ("q", "y", 3.0)])
    b = _ds([("q", "x", 1.0)])  # y absent from ranking b
    got = {r.item: r.rrf for r in reciprocal_rank_fusion(
        [(a, "s", True), (b, "s", True)], partition_by="q",
        key="item", k=60).to_pandas().itertuples()}
    assert got["x"] == pytest.approx(1 / 61 + 1 / 61)
    assert got["y"] == pytest.approx(1 / 62)


def test_validation():
    a = _ds([("q", "x", 1.0)])
    with pytest.raises(ValueError, match="k must be"):
        reciprocal_rank_fusion([(a, "s", True)], partition_by="q",
                               key="item", k=0)
    with pytest.raises(ValueError, match="at least one"):
        reciprocal_rank_fusion([], partition_by="q", key="item")
