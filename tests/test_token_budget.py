"""Token-budget sampling (ops/sample.py::token_budget_sample): budget
respected, inclusive-sum semantics, per-group budget dict, hash-
priority determinism, validation.  (SQL parity: q_token_budget in
tests/test_text_dedup.py.)"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.ops.sample import token_budget_sample


def _ds(rows):
    g, k, w = zip(*rows)
    return rd.from_arrow(pa.table({
        "g": pa.array(list(g)), "id": pa.array(list(k)),
        "w": pa.array(list(w), type=pa.int64())}))


def test_budget_respected_inclusive():
    rows = [("a", i, 10) for i in range(10)] + [("b", i, 7) for i in range(10)]
    out = token_budget_sample(_ds(rows), "g", "w", 35,
                              order_by="id").to_pandas()
    a = out[out.g == "a"].sort_values("id")
    b = out[out.g == "b"].sort_values("id")
    # a: 10+10+10=30 <= 35, fourth row would make 40 -> 3 rows
    assert list(a.id) == [0, 1, 2]
    # b: 7*5=35 <= 35 (inclusive), sixth would make 42 -> 5 rows
    assert list(b.id) == [0, 1, 2, 3, 4]


def test_per_group_budget_dict_drops_unlisted():
    rows = [("a", 0, 5), ("a", 1, 5), ("b", 0, 5)]
    out = token_budget_sample(_ds(rows), "g", "w", {"a": 5},
                              order_by="id").to_pandas()
    assert list(out.g.unique()) == ["a"]
    assert len(out) == 1


def test_hash_priority_deterministic_and_partition_independent():
    rows = [("a", i, 3) for i in range(50)]
    got = []
    for blocks in (1, 5):
        ds = _ds(rows)
        if blocks > 1:
            ds = ds.repartition(blocks)
        out = token_budget_sample(ds, "g", "w", 60, key="id",
                                  seed=9).to_pandas()
        got.append(sorted(out.id.tolist()))
    assert got[0] == got[1]
    assert len(got[0]) == 20  # 60/3 tokens
    # different seed -> different subset (overwhelmingly)
    other = token_budget_sample(_ds(rows), "g", "w", 60, key="id",
                                seed=10).to_pandas()
    assert sorted(other.id.tolist()) != got[0]


def test_validation():
    ds = _ds([("a", 0, 1)])
    with pytest.raises(ValueError, match="exactly one"):
        token_budget_sample(ds, "g", "w", 10)
    with pytest.raises(ValueError, match="exactly one"):
        token_budget_sample(ds, "g", "w", 10, order_by="id", key="id")
