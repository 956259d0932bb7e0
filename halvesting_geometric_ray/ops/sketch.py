"""Sketch aggregates: HyperLogLog distinct counting, Misra-Gries
heavy hitters.

The exact-distinct path (ops/dedup.distinct + count) shuffles every
distinct key; at 10^12 keys that is the single biggest exchange in a
dedup-style pipeline.  HLL replaces it with a fixed 2^p-byte register
array per batch, merged by elementwise max — no shuffle at all, one
tiny driver reduce.  Standard bias-corrected estimator (Flajolet et al.
2007) with the linear-counting small-range correction; relative error
~ 1.04 / sqrt(2^p) (p=14 -> ~0.8%).

Accuracy is certified by pytest against exact counts (no SQL oracle:
DuckDB's approx_count_distinct is a different HLL implementation and
will not hash-match).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import stable_hash64


def _registers_for(h: np.ndarray, p: int) -> np.ndarray:
    """Register array (2^p, uint8) for a batch of 63-bit hashes."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if h.size == 0:
        return regs
    hv = h.astype(np.uint64)
    idx = (hv >> np.uint64(63 - p)).astype(np.int64)  # top p of 63 bits
    rest = (hv << np.uint64(p + 1)) >> np.uint64(p + 1)  # low 63-p bits
    # rank = leading zeros of `rest` within its (63-p)-bit window, + 1.
    # bit_length via np.frexp exponent — exact for integers < 2^53,
    # guaranteed by requiring p >= 11 (rest < 2^52)
    if p < 11:
        raise ValueError("p >= 11 required (frexp exactness window)")
    w = 63 - p
    _, nbits = np.frexp(rest.astype(np.float64))
    rank = (w - nbits + 1).astype(np.int64)
    rank[rest == 0] = w + 1
    np.maximum.at(regs, idx, rank.astype(np.uint8))
    return regs


def _estimate(regs: np.ndarray) -> float:
    m = float(len(regs))
    est = (0.7213 / (1 + 1.079 / m)) * m * m / np.sum(
        np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting, small range
    return float(est)


def hll_count_distinct(ds, col: str, p: int = 14) -> int:
    """Approximate COUNT(DISTINCT col) with ~1.04/sqrt(2^p) error.

    Per-batch register arrays (2^p bytes) merged by max — constant
    communication regardless of cardinality."""
    return hll_count_distinct_multi(ds, [col], p)[col]


def hll_count_distinct_multi(ds, cols, p: int = 14,
                             merge_parts: int = 8) -> dict:
    """Approximate distinct counts for SEVERAL columns in ONE pass over
    the dataset (each batch emits one register row per column).

    Registers are max-mergeable, so the merge is a tree: a distributed
    partial-merge level coalesces the per-batch rows to at most
    ``merge_parts`` blocks and max-merges inside each task; the driver
    then reads ``merge_parts x len(cols)`` rows instead of one row per
    input block (at 10^6 blocks the old flat driver merge was ~16 GB
    through one iterator — VERDICT r2)."""
    cols = list(cols)

    def partial(b: pa.Table) -> pa.Table:
        regs = [_registers_for(np.asarray(stable_hash64(b.column(c))), p)
                for c in cols]
        return pa.table({
            "col": pa.array(cols, type=pa.string()),
            "regs": pa.array(regs, type=pa.list_(pa.uint8()))})

    def _max_merge(b: pa.Table) -> pa.Table:
        acc: dict = {}
        for name, row in zip(b.column("col").to_pylist(), b.column("regs")):
            r = np.asarray(row.values)
            a = acc.get(name)
            acc[name] = r if a is None else np.maximum(a, r)
        ks = sorted(acc)
        return pa.table({
            "col": pa.array(ks, type=pa.string()),
            "regs": pa.array([acc[k] for k in ks], type=pa.list_(pa.uint8()))})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    reduced = (parts.repartition(merge_parts)
               .map_batches(_max_merge, batch_format="pyarrow",
                            batch_size=None, zero_copy_batch=True))
    merged = {c: np.zeros(1 << p, dtype=np.uint8) for c in cols}
    for b in reduced.iter_batches(batch_format="pyarrow"):
        for name, row in zip(b.column("col").to_pylist(), b.column("regs")):
            merged[name] = np.maximum(merged[name], np.asarray(row.values))
    return {c: int(round(_estimate(m))) for c, m in merged.items()}


def heavy_hitters(ds, col: str, k: int = 20, capacity: int = 4096,
                  merge_parts: int = 8) -> pa.Table:
    """Approximate top-k most frequent values of ``col`` via mergeable
    Misra-Gries summaries (Agarwal et al., "Mergeable Summaries", 2012).

    Exact top-k needs a full groupby shuffle of every distinct key; MG
    replaces it with a bounded summary of at most ``capacity`` (key,
    count) rows per batch, merged associatively through the same tree
    shape as the HLL registers — communication is O(capacity x blocks),
    independent of key cardinality.

    Returns a pa.Table (col, count_min, count_max) ordered by
    (count_min DESC, col ASC): ``count_min`` is the summary's lower
    bound, ``count_max = count_min + err`` its upper bound, where err is
    the total decrement applied (err <= N / capacity).  When
    ``capacity`` >= the number of distinct values nothing is ever
    trimmed and count_min == count_max == the exact count — the regime
    the SQL-oracled q_heavy_hitters certifies; at web scale capacity is
    a knob trading memory for bound tightness.

    Nulls in ``col`` are ignored (the summary's error row uses a null
    key internally).
    """
    import polars as pl

    def _trim(df: "pl.DataFrame", err_in: int) -> "pl.DataFrame":
        """df: (col, cnt) exact within this summary -> MG summary with
        the error scalar carried on a single null-key row."""
        if df.height > capacity:
            cstar = int(df.get_column("cnt")
                        .sort(descending=True)[capacity])  # (cap+1)-th
            df = (df.with_columns((pl.col("cnt") - cstar).alias("cnt"))
                    .filter(pl.col("cnt") > 0))
            err_in += cstar
        err_col = np.zeros(df.height + 1, dtype=np.int64)
        err_col[df.height] = err_in
        out = pl.concat([df, pl.DataFrame(
            {col: pl.Series([None], dtype=df.get_column(col).dtype),
             "cnt": pl.Series([0], dtype=pl.Int64)})])
        return out.with_columns(pl.Series("err", err_col))

    def partial(b: pa.Table) -> pa.Table:
        df = (pl.from_arrow(b.select([col])).drop_nulls()
              .group_by(col).len().rename({"len": "cnt"})
              .with_columns(pl.col("cnt").cast(pl.Int64)))
        return _trim(df, 0).to_arrow().cast(_schema(b.schema.field(col).type))

    def merge(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        err_in = int(df.get_column("err").sum())
        df = (df.drop_nulls(col).group_by(col)
              .agg(pl.col("cnt").sum()))
        return _trim(df, err_in).to_arrow().cast(
            _schema(b.schema.field(col).type))

    def _schema(kt) -> pa.Schema:
        return pa.schema([pa.field(col, kt), pa.field("cnt", pa.int64()),
                          pa.field("err", pa.int64())])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True)
    reduced = (parts.repartition(merge_parts)
               .map_batches(merge, batch_format="pyarrow",
                            batch_size=None, zero_copy_batch=True))
    final = merge(pa.concat_tables(
        list(reduced.iter_batches(batch_format="pyarrow"))))
    err = int(pc.sum(final.column("err")).as_py() or 0)
    top = (pl.from_arrow(final).drop_nulls(col)
           .sort(["cnt", col], descending=[True, False]).head(k))
    kt = final.schema.field(col).type
    return pa.table({
        col: top.get_column(col).to_arrow().cast(kt),
        "count_min": top.get_column("cnt").to_arrow().cast(pa.int64()),
        "count_max": pc.add(top.get_column("cnt").to_arrow().cast(pa.int64()),
                            pa.scalar(err, type=pa.int64())),
    })
