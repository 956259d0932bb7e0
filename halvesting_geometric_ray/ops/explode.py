"""List-column explode — vectorized Arrow flatten.

Reference analogue: pandas ``explode("authors")`` / citation explode
(reference build_metadata.py:59, link_prediction_metadata.py:297-310),
re-expressed as a zero-copy pyarrow flatten inside ``map_batches`` —
no row-at-a-time apply.
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa
import pyarrow.compute as pc


def explode_batch(batch: pa.Table, list_col: str, out_col: str,
                  keep: Optional[List[str]] = None) -> pa.Table:
    """One output row per list element; `keep` columns are repeated.

    Rows with empty/null lists produce no output (reference semantics:
    a paper with no citations contributes no edges).
    """
    col = batch.column(list_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    parent = pc.list_parent_indices(col)
    flat = pc.list_flatten(col)
    cols = {}
    for k in keep or []:
        cols[k] = pc.take(batch.column(k), parent)
    cols[out_col] = flat
    return pa.table(cols)


def explode(ds, list_col: str, out_col: str, keep: Optional[List[str]] = None):
    return ds.map_batches(
        lambda b: explode_batch(b, list_col, out_col, keep),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
