"""Equi-depth bucketization: assign each row to a quantile bin.

The standard discretization step before stratified sampling, histogram
features or per-bin mixing weights (e.g. "split the corpus into 10
equal-mass length bins").

Scale shape: bin BOUNDARIES come from ops/sketch.quantile_sketch (KLL —
no global sort, the classic alternative would be a full sort +
row_number, an all-to-all exchange); the assignment pass is a stateless
vectorized ``searchsorted`` over the broadcast boundary array.  Total
cost: one sketch reduce + one map — no shuffle of the data itself.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .sketch import quantile_sketch


def equi_depth_boundaries(ds, col: str, n_buckets: int,
                          k: int = 256) -> np.ndarray:
    """Interior boundaries (n_buckets - 1 ascending values) of the
    approximate equi-depth binning of ``col``."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    res = quantile_sketch(ds, col, qs, k=k)
    bounds = np.array([res["quantiles"][q] for q in qs], dtype=np.float64)
    return np.maximum.accumulate(bounds)  # enforce monotone boundaries


def bucketize(ds, col: str, n_buckets: int = 10, out_col: str = "bucket",
              boundaries: np.ndarray | None = None, k: int = 256):
    """Append ``out_col``: the 0-based equi-depth bin of ``col``
    (nulls -> null bin).  Pass precomputed ``boundaries`` to reuse one
    binning across datasets (train/validation consistency)."""
    b = np.asarray(boundaries, dtype=np.float64) if boundaries is not None \
        else equi_depth_boundaries(ds, col, n_buckets, k=k)

    def assign(t: pa.Table) -> pa.Table:
        v = pc.cast(t.column(col), pa.float64()).combine_chunks()
        null = np.asarray(pc.is_null(v).to_numpy(zero_copy_only=False))
        arr = np.nan_to_num(v.to_numpy(zero_copy_only=False))
        idx = np.searchsorted(b, arr, side="right").astype(np.int64)
        out = pa.array(idx, type=pa.int64(),
                       mask=null if null.any() else None)
        return t.append_column(out_col, out)

    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)
