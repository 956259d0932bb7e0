"""Keyed upsert (ops/merge.py): replacement semantics, multi-column
keys, insert-only deltas, validation.  (SQL parity is swept via
q_upsert_events in tests/test_queries_relational.py.)"""

import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.ops.merge import upsert


def _ds(rows, names=("k", "v")):
    cols = list(zip(*rows))
    return rd.from_arrow(pa.table(
        {n: pa.array(list(c)) for n, c in zip(names, cols)}))


def test_delta_wins_and_inserts():
    base = _ds([(1, "a"), (2, "b"), (3, "c")])
    delta = _ds([(2, "B"), (4, "D")])
    got = {r.k: r.v for r in upsert(base, delta, "k")
           .to_pandas().itertuples()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "D"}


def test_multi_key():
    base = _ds([(1, 1, "a"), (1, 2, "b"), (2, 1, "c")],
               names=("k1", "k2", "v"))
    delta = _ds([(1, 2, "B")], names=("k1", "k2", "v"))
    got = {(r.k1, r.k2): r.v for r in upsert(base, delta, ["k1", "k2"])
           .to_pandas().itertuples()}
    assert got == {(1, 1): "a", (1, 2): "B", (2, 1): "c"}


def test_empty_delta_is_identity():
    base = _ds([(1, "a"), (2, "b")])
    delta = _ds([(9, "x")]).filter(expr="k < 0")
    got = {r.k: r.v for r in upsert(base, delta, "k")
           .to_pandas().itertuples()}
    assert got == {1: "a", 2: "b"}


def test_validation():
    base = _ds([(1, "a")])
    with pytest.raises(ValueError, match="at least one"):
        upsert(base, base, [])
    with pytest.raises(ValueError, match="not in schema"):
        upsert(base, base, "missing")
