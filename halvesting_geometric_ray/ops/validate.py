"""Data-validation / expectation checks — the contract-enforcement
pass a production ingest pipeline runs before anything downstream
trusts a table (the dbt-test / Great-Expectations operator family):

    not_null(col)                   null rows
    in_range(col, lo, hi)           non-null rows outside [lo, hi]
    accepted_values(col, values)    non-null rows outside the set
    matches_regex(col, pattern)     non-null rows not matching (RE2 —
                                    the same engine pyarrow and DuckDB
                                    compile, so oracles transfer)
    unique(cols)                    sum over duplicated keys of
                                    (multiplicity - 1) — the number of
                                    rows that would need to be dropped
    foreign_key(col, ref, ref_col)  non-null rows whose value is
                                    absent from the referenced column
                                    (SQL FK semantics: NULL passes)

Returns one row per rule: (rule, col, n_checked, n_violations, ok).
``n_checked`` counts the rows the rule actually examined (all rows for
not_null/unique, non-null rows for value rules).

Scale shape: every row-local rule folds into ONE shared streaming pass
(per-block partial counts, 2 ints per rule per block — no exchange);
``unique`` pays one grouped count exchange on its key; ``foreign_key``
pays one bucketed anti semi-join against the referenced column.  The
summary is driver-side but O(rules), independent of row count.

Reference anchor: the reference's scattered ad-hoc guards — dropna on
halid, `halauthorid != 0`, dtype maps at read time
(link_prediction_metadata.py:208,226,237-241,392) — are exactly these
rules, done implicitly; this operator makes them a declared, audited
contract.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import pyarrow as pa
import pyarrow.compute as pc

_ROW_LOCAL = {"not_null", "in_range", "accepted_values", "matches_regex"}
_ALL = _ROW_LOCAL | {"unique", "foreign_key"}


def validate(ds, rules: Sequence[Tuple], *, num_parts: int = 16):
    """``rules``: list of tuples —
    ("not_null", col) / ("in_range", col, lo, hi) /
    ("accepted_values", col, [v, ...]) / ("matches_regex", col, pat) /
    ("unique", [cols...]) / ("foreign_key", col, ref_ds, ref_col).
    Returns a Dataset (rule, col, n_checked, n_violations, ok)."""
    import pandas as pd
    import ray.data as rd

    from .agg import grouped_aggregate
    from .dedup import distinct
    from .join import hash_join

    if not rules:
        raise ValueError("rules must be non-empty")
    for r in rules:
        if r[0] not in _ALL:
            raise ValueError(f"unknown rule kind: {r[0]!r}")

    local = [(i, r) for i, r in enumerate(rules) if r[0] in _ROW_LOCAL]
    results: Dict[int, Tuple[int, int]] = {}

    # ---- one shared streaming pass for every row-local rule --------
    if local:
        def partial(b: pa.Table) -> pa.Table:
            out_i, out_c, out_v = [], [], []
            for i, r in local:
                kind, col = r[0], r[1]
                arr = b.column(col)
                nn = len(arr) - arr.null_count
                if kind == "not_null":
                    out_i.append(i)
                    out_c.append(len(arr))
                    out_v.append(arr.null_count)
                    continue
                if kind == "in_range":
                    lo, hi = r[2], r[3]
                    bad = pc.or_(pc.less(arr, pa.scalar(lo)),
                                 pc.greater(arr, pa.scalar(hi)))
                elif kind == "accepted_values":
                    bad = pc.invert(pc.is_in(
                        arr, value_set=pa.array(list(r[2]))))
                else:  # matches_regex
                    bad = pc.invert(pc.match_substring_regex(
                        arr, pattern=r[2]))
                # nulls are NOT value-rule violations (not_null owns
                # them); is_in returns non-null False for nulls, so
                # mask explicitly rather than relying on null-prop
                bad = pc.and_kleene(pc.is_valid(arr), bad)
                nbad = pc.sum(pc.fill_null(bad, False)).as_py() or 0
                out_i.append(i)
                out_c.append(nn)
                out_v.append(int(nbad))
            return pa.table({"i": pa.array(out_i, type=pa.int32()),
                             "c": pa.array(out_c, type=pa.int64()),
                             "v": pa.array(out_v, type=pa.int64())})

        p = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
        if len(p):
            agg = p.groupby("i")[["c", "v"]].sum()
            for i, row in agg.iterrows():
                results[int(i)] = (int(row.c), int(row.v))
        for i, _r in local:
            results.setdefault(i, (0, 0))

    # ---- unique: one grouped count exchange per rule ---------------
    for i, r in enumerate(rules):
        if r[0] != "unique":
            continue
        keys = [r[1]] if isinstance(r[1], str) else list(r[1])
        cnt = grouped_aggregate(ds.select_columns(keys), keys,
                                {"n": ("count", None)},
                                num_parts=num_parts)

        def dup_part(b: pa.Table) -> pa.Table:
            n = b.column("n").to_numpy()
            return pa.table({
                "c": pa.array([int(n.sum())], type=pa.int64()),
                "v": pa.array([int((n[n > 1] - 1).sum())],
                              type=pa.int64())})

        dp = cnt.map_batches(dup_part, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
        results[i] = (int(dp["c"].sum()), int(dp["v"].sum()))

    # ---- foreign_key: bucketed anti join on distinct values --------
    for i, r in enumerate(rules):
        if r[0] != "foreign_key":
            continue
        _kind, col, ref, ref_col = r
        vals = ds.select_columns([col]).map_batches(
            lambda b, c=col: b.filter(pc.is_valid(b.column(c))),
            batch_format="pyarrow", zero_copy_batch=True).materialize()
        n_checked = vals.count()
        refd = distinct(ref.select_columns([ref_col]), [ref_col],
                        num_parts=num_parts).materialize()
        missing = hash_join(vals, refd, on=col, right_on=ref_col,
                            join_type="anti", num_parts=num_parts)
        results[i] = (int(n_checked), int(missing.count()))

    rows = []
    for i, r in enumerate(rules):
        kind = r[0]
        col = (",".join(r[1]) if kind == "unique"
               and not isinstance(r[1], str) else r[1])
        c, v = results[i]
        rows.append({"rule": kind, "col": col,
                     "n_checked": c, "n_violations": v, "ok": v == 0})
    pdf = pd.DataFrame(rows)
    pdf["n_checked"] = pdf["n_checked"].astype("int64")
    pdf["n_violations"] = pdf["n_violations"].astype("int64")
    return rd.from_pandas(pdf)
