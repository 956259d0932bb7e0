"""ops/validate.py vs hand-computed expectations (sf0.01 path is
swept by the gate replica)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from halvesting_geometric_ray.ops.validate import validate


def _ds():
    return rd.from_pandas(pd.DataFrame({
        "id": [1, 2, 3, 4, 5, 5, None, 8],
        "x": [0.5, 1.5, -0.1, 0.9, 0.2, 0.2, 0.3, None],
        "cat": ["a", "b", "z", "a", None, "b", "a", "a"],
        "code": ["A1", "B2", "xx", "C3", "D4", "E5", None, "F6"],
    }))


def _get(out, rule):
    row = out[out["rule"] == rule].iloc[0]
    return int(row.n_checked), int(row.n_violations), bool(row.ok)


def test_row_local_rules():
    out = validate(_ds(), [
        ("not_null", "id"),
        ("in_range", "x", 0.0, 1.0),
        ("accepted_values", "cat", ["a", "b"]),
        ("matches_regex", "code", "^[A-F][0-9]$"),
    ]).to_pandas()
    assert _get(out, "not_null") == (8, 1, False)
    # x: 7 non-null; violations 1.5 and -0.1
    assert _get(out, "in_range") == (7, 2, False)
    # cat: 7 non-null; violation 'z' (null NOT a violation here)
    assert _get(out, "accepted_values") == (7, 1, False)
    # code: 7 non-null; violation 'xx'
    assert _get(out, "matches_regex") == (7, 1, False)


def test_unique_and_fk():
    ref = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3, 4, 5]}))
    out = validate(_ds(), [
        ("unique", ["id"]),
        ("foreign_key", "id", ref, "k"),
    ]).to_pandas()
    # id 5 appears twice -> 1 surplus row; nulls group as one key
    c, v, ok = _get(out, "unique")
    assert c == 8 and v >= 1 and not ok
    # non-null ids: 7; 8 is not in ref -> 1 violation (null passes)
    assert _get(out, "foreign_key") == (7, 1, False)


def test_all_clean_passes():
    ds = rd.from_pandas(pd.DataFrame({"id": [1, 2, 3],
                                      "x": [0.1, 0.2, 0.3]}))
    out = validate(ds, [("not_null", "id"),
                        ("in_range", "x", 0.0, 1.0),
                        ("unique", ["id"])]).to_pandas()
    assert out.ok.all()
    assert (out.n_violations == 0).all()


def test_matches_duckdb_counts():
    import duckdb

    rng = np.random.default_rng(6)
    pdf = pd.DataFrame({
        "v": rng.choice(["ok", "bad", "fine"], 500),
        "y": rng.normal(0, 1, 500)})
    out = validate(rd.from_pandas(pdf), [
        ("accepted_values", "v", ["ok", "fine"]),
        ("in_range", "y", -1.0, 1.0)]).to_pandas()
    con = duckdb.connect()
    con.register("t", pdf)
    nv = con.execute("SELECT count(*) FILTER (WHERE v NOT IN "
                     "('ok','fine')) FROM t").fetchone()[0]
    ny = con.execute("SELECT count(*) FILTER (WHERE y < -1 OR y > 1) "
                     "FROM t").fetchone()[0]
    assert _get(out, "accepted_values")[1] == nv
    assert _get(out, "in_range")[1] == ny


def test_validation_errors():
    with pytest.raises(ValueError):
        validate(_ds(), [])
    with pytest.raises(ValueError):
        validate(_ds(), [("nope", "id")])


def test_cli_validate(tmp_path, capsys):
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from halvesting_geometric_ray.cli import main

    t = pa.table({"id": [1, 2, 2, None], "x": [0.5, 2.0, 0.1, 0.2]})
    pq.write_table(t, str(tmp_path / "t.parquet"))
    ref = pa.table({"k": [1, 2]})
    pq.write_table(ref, str(tmp_path / "ref.parquet"))
    rules = [["not_null", "id"], ["in_range", "x", 0.0, 1.0],
             ["unique", ["id"]],
             ["foreign_key", "id", str(tmp_path / "ref.parquet"), "k"]]
    rp = tmp_path / "rules.json"
    rp.write_text(_json.dumps(rules))
    rc = main(["validate", "--table", str(tmp_path / "t.parquet"),
               "--rules", str(rp)])
    assert rc == 0  # non-strict always 0
    out = _json.loads(capsys.readouterr().out.strip()
                      .splitlines()[-1])["validate"]
    by = {r["rule"]: r for r in out}
    assert by["not_null"]["n_violations"] == 1
    assert by["in_range"]["n_violations"] == 1  # 2.0 out of range
    assert by["unique"]["n_violations"] == 1
    assert by["foreign_key"]["n_violations"] == 0  # nulls pass FK
    # strict mode fails on violations
    rc = main(["validate", "--table", str(tmp_path / "t.parquet"),
               "--rules", str(rp), "--strict"])
    assert rc == 1
