"""snapshot_diff: added/removed/changed/unchanged classification,
including the null-value vs missing-row distinction the int8 presence
indicators exist for."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.ops.merge import snapshot_diff


def _ds(rows, schema):
    return rd.from_arrow(pa.Table.from_pylist(rows, schema=schema))


SCH = pa.schema([("k", pa.int64()), ("v", pa.string()),
                 ("n", pa.int64())])


def test_all_four_statuses(ray_session):
    base = _ds([{"k": 1, "v": "a", "n": 1},
                {"k": 2, "v": "b", "n": 2},
                {"k": 3, "v": "c", "n": 3}], SCH)
    delta = _ds([{"k": 2, "v": "b", "n": 2},       # unchanged
                 {"k": 3, "v": "c", "n": 9},       # changed
                 {"k": 4, "v": "d", "n": 4}], SCH)  # added; 1 removed
    out = snapshot_diff(base, delta, "k", cmp_cols=["v", "n"],
                        base_schema=SCH, delta_schema=SCH).to_pandas()
    got = dict(zip(out["k"], out["status"]))
    assert got == {1: "removed", 2: "unchanged", 3: "changed",
                   4: "added"}


def test_null_value_is_not_missing_row(ray_session):
    base = _ds([{"k": 1, "v": None, "n": 1},
                {"k": 2, "v": "x", "n": 2}], SCH)
    delta = _ds([{"k": 1, "v": None, "n": 1},      # null == null: same
                 {"k": 2, "v": None, "n": 2}], SCH)  # value -> null: change
    out = snapshot_diff(base, delta, "k", cmp_cols=["v"],
                        base_schema=SCH, delta_schema=SCH).to_pandas()
    got = dict(zip(out["k"], out["status"]))
    assert got == {1: "unchanged", 2: "changed"}


def test_multi_key(ray_session):
    sch = pa.schema([("a", pa.int64()), ("b", pa.string()),
                     ("v", pa.int64())])
    base = _ds([{"a": 1, "b": "x", "v": 1},
                {"a": 1, "b": "y", "v": 2}], sch)
    delta = _ds([{"a": 1, "b": "x", "v": 5},
                 {"a": 2, "b": "x", "v": 1}], sch)
    out = snapshot_diff(base, delta, ["a", "b"], cmp_cols=["v"],
                        base_schema=sch, delta_schema=sch).to_pandas()
    got = {(r.a, r.b): r.status for r in out.itertuples()}
    assert got == {(1, "x"): "changed", (1, "y"): "removed",
                   (2, "x"): "added"}


def test_validates(ray_session):
    base = _ds([{"k": 1, "v": "a", "n": 1}], SCH)
    with pytest.raises(ValueError, match="overlap"):
        snapshot_diff(base, base, "k", cmp_cols=["k", "v"],
                      base_schema=SCH, delta_schema=SCH)
    with pytest.raises(ValueError, match="key and cmp"):
        snapshot_diff(base, base, "k", cmp_cols=[],
                      base_schema=SCH, delta_schema=SCH)
