"""Z-order (Morton) multi-column clustering for prunable layouts.

A single-column sort lets the reader skip files on ONE predicate
column; a 100 TB table queried by (host, date) or (quality, length)
boxes needs locality in SEVERAL columns at once.  Z-ordering
bit-interleaves per-column EQUI-DEPTH ranks (KLL quantile bins, so
skewed web columns still fill cells evenly) into one sort key; files
cut along that key have small extents in EVERY clustered column, and a
box predicate touches O(perimeter) files instead of all of them — the
layout trick behind Delta/Iceberg Z-ORDER compaction.

Scale shape: one KLL sketch pass per column (tree-merged, no
shuffle), one map to stamp the z-value, and ONE range exchange (the
partition-by-z write) — the same cost as a single sort.  Bin edges are
a driver-side ``2^bits`` array per column, broadcast once.

Determinism: the z-value is a pure function of (row, edges) and the
file id a fixed z prefix, so a rerun on the SAME input layout is
bitwise identical — but the edges come from the KLL fold, whose level
compaction depends on block/merge order, so a DIFFERENT block layout
shifts bin edges by up to the sketch's rank error and moves rows near
a bin boundary to the adjacent cell.  That only perturbs FILE
PLACEMENT (data content and pruning quality are unaffected to ~1%);
treat the input layout like the SGNS shard count — part of the layout
recipe, not of row-level semantics.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa

from .sketch import quantile_sketch

_Z = "__z"
_ZFILE = "zfile"


def _interleave(ranks: np.ndarray, bits: int) -> np.ndarray:
    """Morton-interleave (n, d) uint ranks of ``bits`` bits each into
    one int64: bit j of column c lands at position j*d + c."""
    n, d = ranks.shape
    if bits * d > 62:
        raise ValueError("bits * num_cols must be <= 62")
    z = np.zeros(n, dtype=np.uint64)
    r = ranks.astype(np.uint64)
    for j in range(bits):
        for c in range(d):
            z |= ((r[:, c] >> np.uint64(j)) & np.uint64(1)) \
                << np.uint64(j * d + c)
    return z.astype(np.int64)


def zorder_values(ds, cols: List[str], bits: int = 8,
                  k: int = 256) -> Tuple["object", Dict]:
    """Append a ``__z`` int64 Morton key over equi-depth ranks of
    ``cols``.  Returns (dataset, info) with info carrying the bin
    edges per column.  NULLs rank into bin 0."""
    if len(cols) < 2:
        raise ValueError("z-ordering needs >= 2 columns")
    if bits < 2 or bits > 16:
        raise ValueError("bits in [2, 16]")
    nbins = 1 << bits
    qs = [i / nbins for i in range(1, nbins)]
    edges = {}
    for c in cols:
        sk = quantile_sketch(ds, c, qs, k=k)
        edges[c] = np.asarray([sk["quantiles"][q] for q in qs],
                              dtype=np.float64)

    def stamp(b: pa.Table) -> pa.Table:
        n = len(b)
        ranks = np.zeros((n, len(cols)), dtype=np.int64)
        for i, c in enumerate(cols):
            x = b.column(c).to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            r = np.searchsorted(edges[c], x, side="right")
            r[np.isnan(x)] = 0
            ranks[:, i] = np.clip(r, 0, nbins - 1)
        return b.append_column(_Z, pa.array(_interleave(ranks, bits)))

    out = ds.map_batches(stamp, batch_format="pyarrow",
                         zero_copy_batch=True)
    return out, {"cols": list(cols), "bits": bits, "edges": edges}


def zorder_write(ds, cols: List[str], path: str, bits: int = 8,
                 num_files: int = 64, compression: str = "zstd",
                 k: int = 256) -> Dict:
    """Write ``ds`` as a hive-partitioned layout clustered by the
    z-order of ``cols``: partition dir = the top log2(num_files) bits
    of the z-value, so every output file covers a small box in the
    clustered columns and ``zorder_extents`` / any min-max-stats
    reader can prune box predicates.  ONE extra exchange vs a plain
    write (the partition-by-zfile shuffle)."""
    if num_files & (num_files - 1) or num_files < 2:
        raise ValueError("num_files must be a power of two >= 2")
    zds, info = zorder_values(ds, cols, bits=bits, k=k)
    total_bits = bits * len(cols)
    shift = total_bits - int(np.log2(num_files))
    if shift < 0:
        raise ValueError("num_files exceeds 2^(bits * num_cols)")

    def fid(b: pa.Table) -> pa.Table:
        z = b.column(_Z).to_numpy(zero_copy_only=False)
        f = (z >> shift).astype(np.int64)
        return b.drop_columns([_Z]).append_column(_ZFILE, pa.array(f))

    out = zds.map_batches(fid, batch_format="pyarrow",
                          zero_copy_batch=True)
    out.write_parquet(path, partition_cols=[_ZFILE],
                      compression=compression)
    info["num_files"] = num_files
    info["path"] = path
    return info


def zorder_extents(path: str, cols: List[str]) -> pa.Table:
    """Per-partition min/max of each clustered column (the pruning
    index a reader consults): one row per zfile dir.  Small — reads
    only the listed columns."""
    import pyarrow.dataset as pads

    rows = []
    for d in sorted(os.listdir(path)):
        if not d.startswith(f"{_ZFILE}="):
            continue
        t = pads.dataset(os.path.join(path, d)).to_table(columns=cols)
        row = {"zfile": int(d.split("=", 1)[1])}
        for c in cols:
            x = t.column(c).to_numpy(zero_copy_only=False)
            row[f"{c}_min"] = float(np.nanmin(x)) if len(x) else None
            row[f"{c}_max"] = float(np.nanmax(x)) if len(x) else None
        rows.append(row)
    names = ["zfile"] + [f"{c}_{m}" for c in cols for m in ("min", "max")]
    return pa.table({n: [r[n] for r in rows] for n in names})


def prune_fraction(extents: pa.Table, cols: List[str],
                   box: Dict[str, Tuple[float, float]]) -> float:
    """Fraction of partitions whose extents intersect ``box``
    ({col: (lo, hi)}) — the scan fraction a min-max-pruning reader
    pays.  Lower is better; compare clustered vs unclustered layouts."""
    n = extents.num_rows
    keep = np.ones(n, dtype=bool)
    for c, (lo, hi) in box.items():
        cmin = extents.column(f"{c}_min").to_numpy(zero_copy_only=False)
        cmax = extents.column(f"{c}_max").to_numpy(zero_copy_only=False)
        keep &= (cmax >= lo) & (cmin <= hi)
    return float(keep.sum()) / n if n else 0.0
