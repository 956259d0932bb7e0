"""Grouped COUNT(DISTINCT ...) — exact and sketched.

Exact path: per-batch local dedup of (keys, col) is the combiner (the
exchange carries distinct pairs, not rows), then ONE hash-partitioned
exchange on the group key and a polars ``n_unique`` per partition.

Sketch path: per-group HyperLogLog registers — each batch emits one
register row per group it sees, merged by a grouped elementwise-max
(registers are max-mergeable), estimated once per group.  The exchange
carries ``groups x 2^p`` bytes regardless of value cardinality — the
scale path when groups hold billions of distinct values (exact must
move every distinct pair; the sketch moves a constant per group).
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa

from ._util import cast_like, pre_shuffle
from ..functions.hashing import stable_hash64, stable_hash_pair64
from .sketch import _estimate, _registers_for

_PART = "__cd_part"


def _key_hash(b: pa.Table, keys: List[str]):
    if len(keys) == 1:
        return np.asarray(stable_hash64(b.column(keys[0])))
    h = stable_hash_pair64(b.column(keys[0]), b.column(keys[1]))
    for k in keys[2:]:
        h = stable_hash_pair64(pa.array(h), b.column(k))
    return np.asarray(h)


def grouped_count_distinct(ds, keys, col: str, out_col: str = "n_distinct",
                           num_parts: int = 16):
    """Exact ``SELECT keys, count(DISTINCT col) GROUP BY keys``."""
    import polars as pl

    kk = [keys] if isinstance(keys, str) else list(keys)

    def local(b: pa.Table) -> pa.Table:
        df = (pl.from_arrow(b.select(kk + [col]))
              .unique(subset=kk + [col]))
        t = df.to_arrow()
        h = _key_hash(t, kk) % num_parts
        return t.append_column(_PART, pa.array(h.astype(np.int32)))

    def per_part(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g.drop_columns([_PART]))
        out = (df.group_by(kk)
               .agg(pl.col(col).n_unique().cast(pl.Int64).alias(out_col)))
        want = pa.schema([g.schema.field(k) for k in kk]
                         + [pa.field(out_col, pa.int64())])
        return cast_like(out.to_arrow(), want)

    prepped = ds.map_batches(local, batch_format="pyarrow",
                             zero_copy_batch=True)
    return (pre_shuffle(prepped).groupby(_PART)
            .map_groups(per_part, batch_format="pyarrow",
                        retry_exceptions=True))


def grouped_count_distinct_hll(ds, keys, col: str, p: int = 12,
                               out_col: str = "n_distinct",
                               num_parts: int = 16):
    """Approximate grouped distinct count, ~1.04/sqrt(2^p) relative
    error.  One register row (2^p bytes) per (group, batch) exchanged;
    merge = grouped elementwise max."""
    import polars as pl

    if p < 11:  # sketch.py::_registers_for frexp exactness window —
        # validate before the exchange, not inside the retried task
        raise ValueError("p >= 11 required")
    kk = [keys] if isinstance(keys, str) else list(keys)

    def partial(b: pa.Table) -> pa.Table:
        # groups are identified by their stable 64-bit key hash inside
        # the kernel (same accepted-collision model as ops/ids.py hash
        # ids); key VALUES are carried alongside for the output
        if b.num_rows == 0:
            return pa.schema(
                [b.schema.field(k) for k in kk]
                + [pa.field("__regs", pa.list_(pa.uint8())),
                   pa.field(_PART, pa.int32())]).empty_table()
        hv = np.asarray(stable_hash64(b.column(col)))
        gh = _key_hash(b, kk)
        order = np.argsort(gh, kind="stable")
        gs, hs = gh[order], hv[order]
        starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
        ends = np.r_[starts[1:], len(gs)]
        regs, rows = [], []
        for s, e in zip(starts, ends):
            regs.append(_registers_for(hs[s:e], p))
            rows.append(order[s])
        kb = b.select(kk).take(pa.array(rows, type=pa.int64()))
        part = (gs[starts] % num_parts).astype(np.int32)
        return (kb.append_column("__regs", pa.array(
            regs, type=pa.list_(pa.uint8())))
                .append_column(_PART, pa.array(part)))

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.schema(
                [g.schema.field(k) for k in kk]
                + [pa.field(out_col, pa.int64())]).empty_table()
        gh = _key_hash(g, kk)
        order = np.argsort(gh, kind="stable")
        gs = gh[order]
        starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
        ends = np.r_[starts[1:], len(gs)]
        regcol = g.column("__regs")
        counts, rows = [], []
        for s, e in zip(starts, ends):
            acc = None
            for i in order[s:e]:
                r = np.asarray(regcol[int(i)].values)
                acc = r if acc is None else np.maximum(acc, r)
            counts.append(int(round(_estimate(acc))))
            rows.append(int(order[s]))
        kb = g.select(kk).take(pa.array(rows, type=pa.int64()))
        return kb.append_column(out_col,
                                pa.array(counts, type=pa.int64()))

    prepped = ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
    return (pre_shuffle(prepped).groupby(_PART)
            .map_groups(per_part, batch_format="pyarrow",
                        retry_exceptions=True))
