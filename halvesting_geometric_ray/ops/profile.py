"""One-pass dataset profiling: row count, per-column null counts and
min/max — the schema-sanity "describe" every ingest runs before the
real pipeline (the reference eyeballs pandas .info(); this is the
distributed equivalent).

Scale shape: each batch emits ONE partial-stats row (constant size —
count/null-count/min/max are all mergeable), a single coalesce task
folds the partials, so the exchange is num_blocks x 1 row regardless of
data volume.  Min/max on floats are exact (comparisons only, no
arithmetic), so the result is engine-exact and SQL-certifiable.
"""

from __future__ import annotations

from typing import List

import pyarrow as pa
import pyarrow.compute as pc


def _partial(b: pa.Table, cols: List[str]) -> pa.Table:
    out = {"n_rows": pa.array([b.num_rows], type=pa.int64())}
    for c in cols:
        col = b.column(c)
        nn = b.num_rows - col.null_count
        out[f"{c}__n"] = pa.array([nn], type=pa.int64())
        if nn:
            mm = pc.min_max(col).as_py()
            lo, hi = mm["min"], mm["max"]
        else:
            lo = hi = None
        t = col.type
        out[f"{c}__min"] = pa.array([lo], type=t)
        out[f"{c}__max"] = pa.array([hi], type=t)
    return pa.table(out)


def profile(ds, cols: List[str]):
    """Returns a ONE-ROW dataset: n_rows + {col}__n / __min / __max per
    requested column."""
    if not cols:
        raise ValueError("cols must be non-empty")

    def partial(b: pa.Table) -> pa.Table:
        return _partial(b, cols)

    def merge(b: pa.Table) -> pa.Table:
        out = {"n_rows": pa.array(
            [pc.sum(b.column("n_rows")).as_py() or 0], type=pa.int64())}
        for c in cols:
            out[f"{c}__n"] = pa.array(
                [pc.sum(b.column(f"{c}__n")).as_py() or 0],
                type=pa.int64())
            for fn, name in ((pc.min, "min"), (pc.max, "max")):
                col = b.column(f"{c}__{name}")
                v = fn(col).as_py() if b.num_rows else None
                out[f"{c}__{name}"] = pa.array([v], type=col.type)
        return pa.table(out)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    # single merge task: the partials are one row per block
    return parts.repartition(1).map_batches(merge, batch_format="pyarrow",
                                            batch_size=None,
                                            zero_copy_batch=True)
