"""Vectorized string extraction: regex capture groups and JSON fields.

The workhorse parse-a-column steps of log/event pipelines (the
reference's XML payload parse is the heavyweight cousin —
link_prediction_metadata.py:289-306; these are the cheap structured
cases).  Both are stateless per-batch polars Rust kernels — zero
exchanges, no Python per-row work.

Pattern compatibility: polars uses the Rust regex crate, DuckDB uses
RE2 — the same dialect intersection the PII scrubber pins
(functions/text.py) — so results SQL-certify exactly as long as
patterns avoid backrefs/lookarounds (both engines reject them anyway).
"""

from __future__ import annotations

from typing import Dict, Optional

import pyarrow as pa


def regex_extract(ds, col: str, pattern: str,
                  groups: Optional[Dict[str, int]] = None):
    """Append one column per capture group: ``groups`` maps output name
    -> 1-based group index (default {"match": 1}).  Non-matching rows
    get null (DuckDB regexp_extract's '' is normalized to NULL there —
    use the provided oracle pattern ``NULLIF(regexp_extract(...), '')``).
    """
    import polars as pl

    gg = groups or {"match": 1}
    if not gg or any(i < 1 for i in gg.values()):
        raise ValueError("groups must map names to 1-based group indexes")
    # fail fast on a bad pattern (before any distributed work)
    import re as _re

    _re.compile(pattern)

    def fn(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        df = df.with_columns([
            pl.col(col).str.extract(pattern, i).alias(name)
            for name, i in gg.items()])
        return df.to_arrow().cast(
            pa.schema(list(b.schema)
                      + [pa.field(n, pa.string()) for n in gg]))

    return ds.map_batches(fn, batch_format="pyarrow",
                          zero_copy_batch=True)


def json_field(ds, col: str, path: str, out_col: str = "value",
               out_type: pa.DataType = pa.string()):
    """Extract a JSON path (e.g. ``$.k`` / ``$.a.b``) from a JSON-string
    column into ``out_col``, cast to ``out_type`` (missing field or
    invalid JSON -> null)."""
    import polars as pl

    if not path.startswith("$"):
        raise ValueError("path must be a JSONPath starting with '$'")

    def fn(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        df = df.with_columns(
            pl.col(col).str.json_path_match(path).alias(out_col))
        t = df.to_arrow()
        v = t.column(out_col)
        if out_type != pa.string():
            import pyarrow.compute as pc

            v = pc.cast(v, out_type)
            t = t.set_column(t.column_names.index(out_col), out_col, v)
        return t.cast(pa.schema(list(b.schema)
                                + [pa.field(out_col, out_type)]))

    return ds.map_batches(fn, batch_format="pyarrow",
                          zero_copy_batch=True)


def json_schema_profile(ds, col: str, *, max_depth: int = 3,
                        num_parts: int = 16):
    """Schema inference over a semi-structured JSON column — the
    ingest-time profiling pass that tells you what a scraped/event
    payload actually contains before you write extraction rules:
    one row per (path, type) with its observation count.

    Paths are JSONPath-ish ('$', '$.a', '$.a.b', '$.a[]' for array
    elements), truncated at ``max_depth`` levels; types are
    {object, array, string, number_int, number_float, boolean, null};
    a malformed document counts under ('$', 'invalid').  A key whose
    values disagree across rows yields MULTIPLE rows for the same path
    — that disagreement count is exactly the signal schema inference
    exists to surface.

    Scale shape: per-batch Counter partials (rows proportional to the
    number of DISTINCT (path, type) pairs per batch, not row count)
    -> one grouped sum.  Parsing is per-row json.loads by necessity —
    heterogeneous JSON has no vectorized parse; this is a diagnostic
    pass, not a hot-loop transform (the hot path extracts known fields
    via json_field's vectorized json_path_match above).

    Reference anchor: the reference hand-assumes its JSON metadata
    shape at read time (pd_read_jsons + json_normalize,
    build_metadata.py:50-68); this operator derives that shape, with
    evidence, from the data.
    """
    import json
    from collections import Counter

    if max_depth < 1:
        raise ValueError("max_depth must be >= 1")

    def walk(v, path: str, depth: int, out: Counter):
        if isinstance(v, dict):
            out[(path, "object")] += 1
            if depth < max_depth:
                for k, sub in v.items():
                    walk(sub, f"{path}.{k}", depth + 1, out)
        elif isinstance(v, list):
            out[(path, "array")] += 1
            if depth < max_depth:
                for sub in v:
                    walk(sub, f"{path}[]", depth + 1, out)
        elif isinstance(v, bool):  # before int (bool is int subclass)
            out[(path, "boolean")] += 1
        elif isinstance(v, int):
            out[(path, "number_int")] += 1
        elif isinstance(v, float):
            out[(path, "number_float")] += 1
        elif isinstance(v, str):
            out[(path, "string")] += 1
        elif v is None:
            out[(path, "null")] += 1

    def partial(b: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in b.column(col).to_pylist():
            if s is None:
                c[("$", "null")] += 1
                continue
            try:
                v = json.loads(s)
            except (ValueError, TypeError):
                c[("$", "invalid")] += 1
                continue
            walk(v, "$", 1, c)
        paths = [p for p, _t in c]
        types = [t for _p, t in c]
        return pa.table({"path": pa.array(paths, type=pa.string()),
                         "type": pa.array(types, type=pa.string()),
                         "n": pa.array([c[k] for k in c],
                                       type=pa.int64())})

    from .agg import grouped_aggregate

    return grouped_aggregate(
        ds.select_columns([col]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True),
        ["path", "type"], {"n": ("sum", "n")}, num_parts=num_parts)
