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


def _hist(rows):
    k, v, vf, vt = zip(*rows)
    return rd.from_arrow(pa.table({
        "k": pa.array(list(k)), "v": pa.array(list(v)),
        "valid_from": pa.array(list(vf), type=pa.int64()),
        "valid_to": pa.array(list(vt), type=pa.int64())}))


def test_scd2_closes_and_appends():
    from halvesting_geometric_ray.ops.merge import upsert_scd2

    base = _hist([
        (1, "a0", 0, 5),     # expired version of key 1
        (1, "a1", 5, None),  # current
        (2, "b0", 0, None),  # current, not in delta
    ])
    delta = rd.from_arrow(pa.table({
        "k": pa.array([1, 3]), "v": pa.array(["a2", "c0"]),
        "ts": pa.array([9, 9], type=pa.int64())}))
    out = upsert_scd2(base, delta, "k", ts_col="ts").to_pandas()
    out = out.sort_values(["k", "valid_from"]).reset_index(drop=True)
    import pandas as pd

    rows = [(r.k, r.v, int(r.valid_from),
             None if pd.isna(r.valid_to) else int(r.valid_to))
            for r in out.itertuples(index=False)]
    assert rows == [
        (1, "a0", 0, 5), (1, "a1", 5, 9), (1, "a2", 9, None),
        (2, "b0", 0, None), (3, "c0", 9, None)]
    # exactly one current row per key
    cur = out[out.valid_to.isna()]
    assert sorted(cur.k.tolist()) == [1, 2, 3]


def test_scd2_two_generations_chain():
    from halvesting_geometric_ray.ops.merge import upsert_scd2

    base = _hist([(1, "a0", 0, None)])

    def delta(v, ts):
        return rd.from_arrow(pa.table({
            "k": pa.array([1]), "v": pa.array([v]),
            "ts": pa.array([ts], type=pa.int64())}))

    h1 = upsert_scd2(base, delta("a1", 5), "k", ts_col="ts").materialize()
    h2 = upsert_scd2(h1, delta("a2", 8), "k", ts_col="ts").to_pandas()
    h2 = h2.sort_values("valid_from").reset_index(drop=True)
    assert h2.v.tolist() == ["a0", "a1", "a2"]
    assert h2.valid_from.tolist() == [0, 5, 8]
    vt = h2.valid_to.tolist()
    assert vt[0] == 5 and vt[1] == 8 and pd_isna(vt[2])


def pd_isna(x):
    import pandas as pd

    return pd.isna(x)
