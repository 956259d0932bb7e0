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
