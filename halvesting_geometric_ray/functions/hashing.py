"""Stable, vectorized 64-bit hashing for partition keys and content ids.

The reference assigns ids via the dask partition index — documented there
as buggy across partitions (reference link_prediction_metadata.py:349-353).
We instead key all placement decisions on a *stable* vectorized hash
(polars/xxhash, pinned seed) so results are reproducible under any
parallelism.  Hashes are only used for PLACEMENT (partitioning, bucketing,
salting) and content fingerprints — never as user-visible ids unless
explicitly requested (see ops/ids.py for dense-id assignment).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_MASK63 = (1 << 63) - 1


def stable_hash64(arr, seed: int = 42) -> np.ndarray:
    """Vectorized stable 64-bit hash of a string/binary/int array.

    Accepts a pyarrow Array/ChunkedArray, numpy array, or Python list.
    Returns int64 (top bit cleared so values are non-negative and safe to
    mod). Deterministic across processes and runs (no PYTHONHASHSEED
    dependence).
    """
    import polars as pl

    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        s = pl.from_arrow(arr)
        if isinstance(s, pl.DataFrame):  # chunked array of one field
            s = s.to_series()
    else:
        s = pl.Series(np.asarray(arr))
    h = s.hash(seed=seed).to_numpy()
    return (h & _MASK63).astype(np.int64)


def stable_hash_pair64(a, b, seed: int = 42) -> np.ndarray:
    """Stable hash of a pair of columns (order-sensitive)."""
    ha = stable_hash64(a, seed=seed)
    hb = stable_hash64(b, seed=seed + 1)
    # 64-bit mix (splitmix-style) of the combination.
    x = (ha.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ hb.astype(np.uint64)
    x ^= x >> np.uint64(31)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    return (x & np.uint64(_MASK63)).astype(np.int64)


def stable_hash_cols64(cols, seed: int = 42) -> np.ndarray:
    """Stable order-sensitive hash of N >= 1 columns, chained with the
    same splitmix-style mix as stable_hash_pair64 (for exactly two
    columns the result is bit-identical to stable_hash_pair64)."""
    x = stable_hash64(cols[0], seed=seed).astype(np.uint64)
    for i, c in enumerate(cols[1:], start=1):
        hb = stable_hash64(c, seed=seed + i).astype(np.uint64)
        with np.errstate(over="ignore"):
            x = (x * np.uint64(0x9E3779B97F4A7C15)) ^ hb
            x ^= x >> np.uint64(31)
            x *= np.uint64(0xBF58476D1CE4E5B9)
            x ^= x >> np.uint64(27)
    return (x & np.uint64(_MASK63)).astype(np.int64)


def blake2b64(data: bytes) -> int:
    """Scalar fallback/reference hash (used in tests to sanity-check)."""
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "big") & _MASK63


def dataset_fingerprint(ds, cols, seed: int = 42) -> dict:
    """Order-insensitive content checksum of a dataset projection — the
    reproducibility-audit primitive: two runs (any partitioning, any
    row order) produce identical fingerprints iff they produced the
    same multiset of rows.

    Per batch: one stable row hash (column hashes chained pairwise),
    reduced by commutative (count, sum mod 2^64, xor) partials; the
    driver folds <= num_blocks tiny dicts.  Returns {rows, sum64, xor64,
    hex} where hex digests the triple for logging."""
    import pyarrow as pa

    cols = list(cols)
    if not cols:
        raise ValueError("dataset_fingerprint needs at least one column")

    def partial(b: pa.Table) -> pa.Table:
        h = stable_hash64(b.column(cols[0]), seed=seed)
        for c in cols[1:]:
            h = stable_hash_pair64(pa.array(h), b.column(c), seed=seed)
        hu = h.astype(np.uint64)
        return pa.table({
            "rows": pa.array([b.num_rows], type=pa.int64()),
            "sum64": pa.array([int(hu.sum(dtype=np.uint64))],
                              type=pa.uint64()),
            "xor64": pa.array([int(np.bitwise_xor.reduce(hu))
                               if len(hu) else 0], type=pa.uint64()),
        })

    pdf = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    rows = int(pdf["rows"].sum())
    s = int(np.uint64(pdf["sum64"].to_numpy(dtype=np.uint64).sum(
        dtype=np.uint64))) if len(pdf) else 0
    x = int(np.bitwise_xor.reduce(pdf["xor64"].to_numpy(
        dtype=np.uint64))) if len(pdf) else 0
    hexd = hashlib.blake2b(
        f"{rows}:{s}:{x}".encode(), digest_size=16).hexdigest()
    return {"rows": rows, "sum64": s, "xor64": x, "hex": hexd}
