"""json_schema_profile vs hand-computed expectations."""

import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.ops.strings import json_schema_profile


def _profile(docs, **kw):
    ds = rd.from_pandas(pd.DataFrame({"j": docs}))
    out = json_schema_profile(ds, "j", **kw).to_pandas()
    return {(r.path, r.type): r.n for r in out.itertuples()}


def test_flat_and_conflicting_types():
    docs = ['{"a": 1, "b": "x"}', '{"a": 2.5, "b": "y", "c": true}',
            '{"a": null}']
    got = _profile(docs, max_depth=2)
    assert got[("$", "object")] == 3
    assert got[("$.a", "number_int")] == 1
    assert got[("$.a", "number_float")] == 1
    assert got[("$.a", "null")] == 1
    assert got[("$.b", "string")] == 2
    assert got[("$.c", "boolean")] == 1


def test_nested_and_arrays():
    docs = ['{"a": {"b": [1, "x", {"c": 2}]}}']
    got = _profile(docs, max_depth=4)
    assert got[("$", "object")] == 1
    assert got[("$.a", "object")] == 1
    assert got[("$.a.b", "array")] == 1
    assert got[("$.a.b[]", "number_int")] == 1
    assert got[("$.a.b[]", "string")] == 1
    assert got[("$.a.b[]", "object")] == 1
    # depth cap: c is at depth 5, absent
    assert ("$.a.b[].c", "number_int") not in got


def test_depth_truncation_and_root_scalars():
    docs = ['{"a": {"b": 1}}', '7', '"s"', '[1, 2]']
    got = _profile(docs, max_depth=1)
    assert got[("$", "object")] == 1
    assert got[("$", "number_int")] == 1
    assert got[("$", "string")] == 1
    assert got[("$", "array")] == 1
    assert all(not p.startswith("$.") for p, _t in got)


def test_malformed_and_null_rows():
    docs = ['{"a": 1}', "not json", None, "{broken"]
    got = _profile(docs, max_depth=2)
    assert got[("$", "invalid")] == 2
    assert got[("$", "null")] == 1
    assert got[("$.a", "number_int")] == 1


def test_partitioning_invariance_and_validation():
    docs = ['{"a": %d}' % i for i in range(200)] + ['[1]'] * 50
    a = _profile(docs, max_depth=2)
    ds = rd.from_pandas(pd.DataFrame({"j": docs})).repartition(7)
    out = json_schema_profile(ds, "j", max_depth=2).to_pandas()
    b = {(r.path, r.type): r.n for r in out.itertuples()}
    assert a == b
    with pytest.raises(ValueError):
        json_schema_profile(rd.from_pandas(pd.DataFrame({"j": ["1"]})),
                            "j", max_depth=0)
