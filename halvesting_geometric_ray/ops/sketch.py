"""Sketch aggregates: HyperLogLog distinct counting, Misra-Gries
heavy hitters, KLL-style mergeable quantiles.

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


class _KLL:
    """Compactor-ladder quantile sketch (Karnin-Lall-Liberty 2016,
    simplified: every level holds up to ``k`` items; a full level is
    sorted and every second item promoted with doubled weight).

    Deterministic: the keep-offset alternates per level-compaction
    (0, 1, 0, ...) instead of coin flips, so a given ingest order always
    yields the same sketch.  Results are therefore reproducible but
    PARTITIONING-dependent within the error bound — unlike the exact
    histogram percentiles (queries_text.q_token_percentiles), which stay
    the certified path for integer metrics.  Rank error is O(log2(n/k)/k);
    empirically < 1.5/k of n at the sizes the tests pin.

    ``n`` is exact under add(); under add_weighted() the weighted row
    mass drifts by +-1 per odd-size compaction in the source sketch, so
    distributed callers carry the exact count out-of-band (the ``cnt``
    column in quantile_sketch()).
    """

    __slots__ = ("k", "levels", "flips", "n")

    def __init__(self, k: int = 256):
        if k < 8:
            raise ValueError("k >= 8 required")
        self.k = k
        self.levels: list = [np.empty(0, dtype=np.float64)]
        self.flips: list = [0]
        self.n = 0

    def add(self, vals: np.ndarray) -> None:
        vals = np.asarray(vals, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        if vals.size == 0:
            return
        self.n += int(vals.size)
        self.levels[0] = np.concatenate([self.levels[0], vals])
        self._compress()

    def add_weighted(self, vals: np.ndarray, levels: np.ndarray) -> None:
        """Ingest serialized sketch rows: each value carries weight
        2^level and lands in its original compactor level (KLL merge =
        same-level buffer concatenation)."""
        vals = np.asarray(vals, dtype=np.float64)
        levels = np.asarray(levels, dtype=np.int64)
        if vals.size == 0:
            return
        top = int(levels.max())
        while len(self.levels) <= top:
            self.levels.append(np.empty(0, dtype=np.float64))
            self.flips.append(0)
        for lv in np.unique(levels):
            sel = vals[levels == lv]
            self.levels[lv] = np.concatenate([self.levels[lv], sel])
            self.n += int(sel.size) << int(lv)
        self._compress()

    def _compress(self) -> None:
        lv = 0
        while lv < len(self.levels):
            buf = self.levels[lv]
            if buf.size <= self.k:
                lv += 1
                continue
            buf = np.sort(buf, kind="stable")
            off = self.flips[lv]
            self.flips[lv] ^= 1
            keep = buf[off::2]
            if lv + 1 == len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
                self.flips.append(0)
            self.levels[lv + 1] = np.concatenate([self.levels[lv + 1], keep])
            self.levels[lv] = np.empty(0, dtype=np.float64)
            lv += 1

    def rows(self):
        """Serialize as (level, value) arrays."""
        lvs, vs = [], []
        for lv, buf in enumerate(self.levels):
            if buf.size:
                lvs.append(np.full(buf.size, lv, dtype=np.int32))
                vs.append(buf)
        if not vs:
            return (np.empty(0, dtype=np.int32), np.empty(0, dtype=np.float64))
        return np.concatenate(lvs), np.concatenate(vs)

    def quantiles(self, qs) -> np.ndarray:
        """Value whose (weighted) rank is closest above q*n for each q
        (lower quantile semantics over the sketch's weighted sample)."""
        lvs, vs = self.rows()
        if vs.size == 0:
            return np.full(len(list(qs)), np.nan)
        w = (np.int64(1) << lvs.astype(np.int64)).astype(np.float64)
        order = np.argsort(vs, kind="stable")
        vs, w = vs[order], w[order]
        cum = np.cumsum(w)
        total = cum[-1]
        qs = np.asarray(list(qs), dtype=np.float64)
        idx = np.searchsorted(cum, qs * total, side="left")
        return vs[np.minimum(idx, vs.size - 1)]


def quantile_sketch(ds, col: str, qs, k: int = 256,
                    merge_parts: int = 8) -> dict:
    """Approximate quantiles of a numeric column via mergeable KLL
    sketches — no global sort, no shuffle: per-batch sketches serialize
    to at most ~k*log2(n/k) (level, value) rows, tree-merge through
    ``merge_parts`` tasks (same shape as the HLL/Misra-Gries reduce),
    and the driver folds ``merge_parts`` small sketches.

    Returns {"n": total_count, "quantiles": {q: value}}.  When the total
    input fits a single level (n <= k) the result is exact.  Use
    queries_text.q_token_percentiles's histogram pattern when the metric
    is integer-valued with bounded distinct values — that path is exact
    AND cheap; this sketch is for unbounded/continuous domains.
    """

    def _rows_table(sk: "_KLL", n_exact: int) -> pa.Table:
        # the exact total count rides on the first row (sketch n is
        # exact too, but carrying it explicitly keeps the contract
        # obvious); a sketch with n > 0 always has >= 1 row
        lvs, vs = sk.rows()
        cnt = np.zeros(lvs.size, dtype=np.int64)
        if lvs.size:
            cnt[0] = n_exact
        return pa.table({"level": pa.array(lvs, type=pa.int32()),
                         "value": pa.array(vs, type=pa.float64()),
                         "cnt": pa.array(cnt, type=pa.int64())})

    def partial(b: pa.Table) -> pa.Table:
        sk = _KLL(k)
        sk.add(np.asarray(pc.cast(pc.drop_null(b.column(col)),
                                  pa.float64())))
        return _rows_table(sk, sk.n)

    def merge(b: pa.Table) -> pa.Table:
        sk = _KLL(k)
        sk.add_weighted(np.asarray(b.column("value")),
                        np.asarray(b.column("level")))
        return _rows_table(sk, int(pc.sum(b.column("cnt")).as_py() or 0))

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    reduced = (parts.repartition(merge_parts)
               .map_batches(merge, batch_format="pyarrow",
                            batch_size=None, zero_copy_batch=True))
    sk = _KLL(k)
    n_exact = 0
    for b in reduced.iter_batches(batch_format="pyarrow"):
        sk.add_weighted(np.asarray(b.column("value")),
                        np.asarray(b.column("level")))
        n_exact += int(pc.sum(b.column("cnt")).as_py() or 0)
    vals = sk.quantiles(qs)
    return {"n": n_exact,
            "quantiles": {float(q): float(v) for q, v in zip(qs, vals)}}


# ------------------------------------------------------------------ Bloom

_BLOOM_MIX = np.uint64(0x9E3779B97F4A7C15)


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64/murmur3 finalizer — NONLINEAR, so h2 is independent of
    h1 modulo any power of two (a linear h2 = a*h1+b collapses
    pos_i = h1 + i*h2 to few residues whenever 1+i*a has low-order
    zeros, measured as a 72% single-probe collision rate)."""
    with np.errstate(over="ignore"):
        h = h ^ (h >> np.uint64(33))
        h = h * np.uint64(0xFF51AFD7ED558CCD)
        h = h ^ (h >> np.uint64(33))
        h = h * np.uint64(0xC4CEB9FE1A85EC53)
        return h ^ (h >> np.uint64(33))


def _bloom_positions(h: np.ndarray, num_bits: int, num_hashes: int):
    """k bit positions per hash via double hashing (Kirsch-Mitzenmacher
    2006: pos_i = h1 + i*h2 suffices for the Bloom FPR bound)."""
    h1 = h.astype(np.uint64)
    h2 = _mix64(h1) | np.uint64(1)  # odd -> full-period step
    mask = np.uint64(num_bits - 1)
    with np.errstate(over="ignore"):
        return [((h1 + np.uint64(i) * h2) & mask) for i in range(num_hashes)]


def _bloom_insert(bits: np.ndarray, h: np.ndarray, num_bits: int,
                  num_hashes: int) -> None:
    for pos in _bloom_positions(h, num_bits, num_hashes):
        np.bitwise_or.at(bits, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))


def bloom_build(ds, col: str, num_bits: int = 1 << 22, num_hashes: int = 5,
                merge_parts: int = 8) -> np.ndarray:
    """Build a Bloom filter (uint64 word array, ``num_bits`` a power of
    two) over ``col`` — the broadcastable membership structure for
    decontamination-style anti-joins: ~``num_bits/n`` bits per key
    instead of a 64-bit fingerprint each, FPR ~ (1-e^(-kn/m))^k.

    Per-batch local filters OR-merge through the same ``merge_parts``
    tree as the HLL registers; OR is commutative and idempotent, so the
    final bitmap is EXACTLY identical under any partitioning.  No false
    negatives ever; false positives only (for decontamination that
    direction is conservative — a clean doc may be dropped, contaminated
    never kept).  Communication is num_bits/8 bytes per input block;
    size num_bits ~ 10-15 bits per expected key for ~1% FPR."""
    if num_bits & (num_bits - 1):
        raise ValueError("num_bits must be a power of two")
    n_words = num_bits >> 6

    def partial(b: pa.Table) -> pa.Table:
        bits = np.zeros(n_words, dtype=np.uint64)
        h = np.asarray(stable_hash64(pc.drop_null(b.column(col))))
        if h.size:
            _bloom_insert(bits, h, num_bits, num_hashes)
        return pa.table({"bits": pa.array([bits], type=pa.list_(pa.uint64()))})

    def orm(b: pa.Table) -> pa.Table:
        acc = np.zeros(n_words, dtype=np.uint64)
        for row in b.column("bits"):
            acc |= np.asarray(row.values)
        return pa.table({"bits": pa.array([acc], type=pa.list_(pa.uint64()))})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    reduced = (parts.repartition(merge_parts)
               .map_batches(orm, batch_format="pyarrow",
                            batch_size=None, zero_copy_batch=True))
    bits = np.zeros(n_words, dtype=np.uint64)
    for b in reduced.iter_batches(batch_format="pyarrow"):
        for row in b.column("bits"):
            bits |= np.asarray(row.values)
    return bits


def bloom_might_contain(bits: np.ndarray, column,
                        num_hashes: int = 5) -> np.ndarray:
    """Vectorized membership probe; True = possibly present (FPR-bounded),
    False = definitely absent.  Nulls probe as absent."""
    num_bits = int(bits.size) << 6
    valid = np.asarray(pc.is_valid(column))
    h = np.asarray(stable_hash64(pc.drop_null(column)))
    hit = np.ones(h.size, dtype=bool)
    for pos in _bloom_positions(h, num_bits, num_hashes):
        word = bits[(pos >> np.uint64(6)).astype(np.int64)]
        hit &= ((word >> (pos & np.uint64(63))) & np.uint64(1)) != 0
    out = np.zeros(valid.size, dtype=bool)
    out[valid] = hit
    return out


def bloom_anti_filter(ds, col: str, bits: np.ndarray, num_hashes: int = 5):
    """Drop every row whose ``col`` might be in the filter (broadcast
    once via ray.put; per-worker cached)."""
    import ray

    from .join import _bcast_get

    ref = ray.put(bits)

    def drop(b: pa.Table) -> pa.Table:
        w = _bcast_get(ref, lambda x: x)
        keep = ~bloom_might_contain(w, b.column(col), num_hashes)
        return b.filter(pa.array(keep))

    return ds.map_batches(drop, batch_format="pyarrow", zero_copy_batch=True)


def key_skew_report(ds, col: str, k: int = 10, capacity: int = 4096,
                    p: int = 14, merge_parts: int = 8) -> dict:
    """Pre-shuffle skew diagnostic for a prospective join/groupby key:
    one pass over the data funding three mergeable sketches (row count
    via the MG error row is NOT reliable, so count rides its own sum),
    returning

      {"n_rows", "n_distinct_est", "avg_rows_per_key",
       "hot": pa.Table(col, count_min, count_max, share_min)}

    ``share_min`` = count_min / n_rows.  Rule of thumb used across this
    repo: a key with share >> 1/num_parts needs `salt` in hash_join or
    the orientation/star-cap treatment (SURVEY 7.4).  Cost: the MG/HLL
    tree reduces — communication independent of key cardinality."""
    import pyarrow.compute as _pc

    hot = heavy_hitters(ds, col, k=k, capacity=capacity,
                        merge_parts=merge_parts)
    n_distinct = hll_count_distinct(ds, col, p=p)
    n_rows = ds.count()
    share = _pc.divide(
        _pc.cast(hot.column("count_min"), pa.float64()),
        pa.scalar(float(max(n_rows, 1))))
    return {
        "n_rows": int(n_rows),
        "n_distinct_est": int(n_distinct),
        "avg_rows_per_key": float(n_rows) / max(n_distinct, 1),
        "hot": hot.append_column("share_min", share),
    }


def grouped_quantile_sketch(ds, keys, col: str, qs, k: int = 256,
                            num_parts: int = 16):
    """Per-group approximate quantiles via mergeable KLL sketches —
    ``SELECT keys, quantile(col, q)... GROUP BY keys`` without sorting
    any group.

    Each batch emits one serialized sketch (level, value) row-set per
    group it sees (combiner: rows per group bounded by ~k*log2(n/k),
    not group size); ONE key-partitioned exchange then merges each
    group's sketches and answers the quantiles.  Output: one row per
    group with a ``p{100q}`` float column per requested quantile.
    Same error/partitioning caveats as quantile_sketch.
    """
    import polars as pl

    from ..functions.hashing import stable_hash64, stable_hash_pair64

    kk = [keys] if isinstance(keys, str) else list(keys)
    qlist = [float(q) for q in qs]
    if not qlist or any(not 0 < q < 1 for q in qlist):
        raise ValueError("qs must be within (0, 1)")
    names = [f"p{round(100 * q)}" for q in qlist]
    if len(set(names)) != len(names):
        raise ValueError("quantile labels collide; space qs further apart")

    def _khash(t: pa.Table) -> np.ndarray:
        if len(kk) == 1:
            return np.asarray(stable_hash64(t.column(kk[0])))
        h = stable_hash_pair64(t.column(kk[0]), t.column(kk[1]))
        for c in kk[2:]:
            h = stable_hash_pair64(pa.array(h), t.column(c))
        return np.asarray(h)

    part_f = pa.field("__qs_part", pa.int32())

    def partial(b: pa.Table) -> pa.Table:
        schema = pa.schema(
            [b.schema.field(c) for c in kk]
            + [pa.field("__lv", pa.list_(pa.int32())),
               pa.field("__va", pa.list_(pa.float64())),
               pa.field("__n", pa.int64()), part_f])
        if b.num_rows == 0:
            return schema.empty_table()
        df = pl.from_arrow(b.select(kk + [col]))
        groups = df.group_by(kk).agg(pl.col(col).alias("__vals"))
        gt = groups.to_arrow()
        lvs, vas, ns = [], [], []
        for row in gt.column("__vals"):
            sk = _KLL(k)
            sk.add(np.asarray(row.values, dtype=np.float64))
            lv, va = sk.rows()
            lvs.append(lv)
            vas.append(va)
            ns.append(sk.n)
        kb = gt.select(kk)
        ph = (_khash(kb) % num_parts).astype(np.int32)
        return pa.table({**{c: kb.column(c) for c in kk},
                         "__lv": pa.array(lvs, type=pa.list_(pa.int32())),
                         "__va": pa.array(vas,
                                          type=pa.list_(pa.float64())),
                         "__n": pa.array(ns, type=pa.int64()),
                         "__qs_part": pa.array(ph)}).cast(schema)

    def per_part(g: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [g.schema.field(c) for c in kk]
            + [pa.field("n", pa.int64())]
            + [pa.field(nm, pa.float64()) for nm in names])
        if g.num_rows == 0:
            return out_schema.empty_table()
        gh = _khash(g)
        order = np.argsort(gh, kind="stable")
        gs = gh[order]
        starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
        ends = np.r_[starts[1:], len(gs)]
        lv_col, va_col, n_col = (g.column("__lv"), g.column("__va"),
                                 g.column("__n"))
        rows, counts, quants = [], [], []
        for s, e in zip(starts, ends):
            sk = _KLL(k)
            tot = 0
            for i in order[s:e]:
                i = int(i)
                sk.add_weighted(np.asarray(va_col[i].values),
                                np.asarray(lv_col[i].values))
                tot += int(n_col[i].as_py())
            rows.append(int(order[s]))
            counts.append(tot)
            quants.append(sk.quantiles(qlist))
        kb = g.select(kk).take(pa.array(rows, type=pa.int64()))
        qarr = np.asarray(quants)
        cols = {**{c: kb.column(c) for c in kk},
                "n": pa.array(counts, type=pa.int64())}
        for j, nm in enumerate(names):
            cols[nm] = pa.array(qarr[:, j], type=pa.float64())
        return pa.table(cols).cast(out_schema)

    from ._util import pre_shuffle

    prepped = ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
    return (pre_shuffle(prepped).groupby("__qs_part")
            .map_groups(per_part, batch_format="pyarrow",
                        retry_exceptions=True))


def _cms_positions(h: np.ndarray, width: int, depth: int):
    """One column index per row via double hashing (the Bloom
    Kirsch-Mitzenmacher step reused — pairwise-independent enough for
    the CMS bound in practice; width a power of two)."""
    h1 = h.astype(np.uint64)
    h2 = _mix64(h1) | np.uint64(1)
    mask = np.uint64(width - 1)
    with np.errstate(over="ignore"):
        return [((h1 + np.uint64(i) * h2) & mask).astype(np.int64)
                for i in range(depth)]


def cms_build(ds, col: str, width: int = 1 << 14, depth: int = 4,
              merge_parts: int = 8,
              weight_col: str = None) -> "np.ndarray":
    """Count-Min sketch (Cormode & Muthukrishnan 2005) over ``col`` —
    the point-frequency-query completion of the sketch family
    (HLL = distinct, Misra-Gries = top-k, KLL = ranks, Bloom =
    membership, CMS = per-key counts): a (depth x width) int64 counter
    matrix answering est(x) = min_i counts[i][pos_i(x)] with

        true <= est <= true + (e / width) * N   w.p. 1 - e^-depth

    Per-batch local sketches SUM-merge through the Bloom/HLL
    ``merge_parts`` tree; integer addition is commutative/associative,
    so the final matrix is EXACTLY identical under any partitioning.
    ``weight_col`` switches from row counting to weighted sums.
    Communication: depth*width*8 bytes per input block, key-cardinality
    independent."""
    if width & (width - 1) or width < 2:
        raise ValueError("width must be a power of two >= 2")
    if depth < 1:
        raise ValueError("depth must be >= 1")

    def partial(b: pa.Table) -> pa.Table:
        m = np.zeros((depth, width), dtype=np.int64)
        col_a = b.column(col)
        if weight_col is None:
            col_a = pc.drop_null(col_a)
            h = np.asarray(stable_hash64(col_a))
            w = None
        else:
            keep = pc.is_valid(col_a)
            t = b.filter(keep)
            h = np.asarray(stable_hash64(t.column(col)))
            w = t.column(weight_col).to_numpy().astype(np.int64)
        if h.size:
            for i, pos in enumerate(_cms_positions(h, width, depth)):
                np.add.at(m[i], pos,
                          np.int64(1) if w is None else w)
        return pa.table({"m": pa.array([m.reshape(-1)],
                                       type=pa.list_(pa.int64()))})

    def summ(b: pa.Table) -> pa.Table:
        acc = np.zeros(depth * width, dtype=np.int64)
        for row in b.column("m"):
            acc += np.asarray(row.values)
        return pa.table({"m": pa.array([acc], type=pa.list_(pa.int64()))})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    reduced = (parts.repartition(merge_parts)
               .map_batches(summ, batch_format="pyarrow",
                            batch_size=None, zero_copy_batch=True))
    acc = np.zeros(depth * width, dtype=np.int64)
    for b in reduced.iter_batches(batch_format="pyarrow"):
        for row in b.column("m"):
            acc += np.asarray(row.values)
    return acc.reshape(depth, width)


def cms_query(sketch: "np.ndarray", keys) -> "np.ndarray":
    """Estimated frequency of each key (min over rows) — vectorized;
    never underestimates."""
    depth, width = sketch.shape
    h = np.asarray(stable_hash64(keys))
    if h.size == 0:
        return np.empty(0, dtype=np.int64)
    est = np.full(h.size, np.iinfo(np.int64).max)
    for i, pos in enumerate(_cms_positions(h, width, depth)):
        est = np.minimum(est, sketch[i][pos])
    return est


# ---- KMV / theta sketch: distinct counting with SET OPERATIONS ----
#
# HLL answers |A| and (by register max) |A u B|, but intersections via
# inclusion-exclusion blow up when |A n B| << |A u B|.  The KMV /
# theta sketch (Beyer et al. SIGMOD 2007; the DataSketches theta
# family) keeps the k SMALLEST distinct 63-bit hashes: every value
# below the running threshold theta = U_(k) is a uniform sample of the
# distinct population, so |A n B|, |A u B| and Jaccard are estimated
# directly on the sample intersection/union below min(theta_a,
# theta_b).  Relative error ~ 1/sqrt(k-2); sketches are union-mergeable
# (concat + dedup + trim) and bitwise partitioning-invariant (the k
# smallest of a set do not depend on arrival order).  Below k distinct
# values the sketch IS the exact distinct set (exact regime).

_KMV_SPACE = float(1 << 63)  # stable_hash64 is uniform on [0, 2^63)


def _kmv_trim(vals: np.ndarray, k: int) -> np.ndarray:
    u = np.unique(vals.astype(np.uint64))  # sorted ascending
    return u[:k] if u.size > k else u


def kmv_build(ds, col: str, k: int = 4096, merge_parts: int = 8) -> dict:
    """KMV sketch of COUNT(DISTINCT col): {"k": k, "vals": sorted
    uint64 array of the k smallest distinct hashes}.  One pass, one
    tree merge of k-row partials — no shuffle of the data."""
    if k < 16:
        raise ValueError("k >= 16 required")

    def partial(b: pa.Table) -> pa.Table:
        h = np.asarray(stable_hash64(b.column(col)))
        return pa.table({"vals": pa.array([_kmv_trim(h, k)],
                                          type=pa.list_(pa.uint64()))})

    def merge(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({"vals": pa.array(
                [np.empty(0, np.uint64)], type=pa.list_(pa.uint64()))})
        allv = np.concatenate(
            [np.asarray(r.values) for r in b.column("vals")])
        return pa.table({"vals": pa.array([_kmv_trim(allv, k)],
                                          type=pa.list_(pa.uint64()))})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    reduced = (parts.repartition(merge_parts)
               .map_batches(merge, batch_format="pyarrow",
                            batch_size=None, zero_copy_batch=True))
    acc = np.empty(0, dtype=np.uint64)
    for b in reduced.iter_batches(batch_format="pyarrow"):
        for row in b.column("vals"):
            acc = _kmv_trim(np.concatenate([acc, np.asarray(row.values)]),
                            k)
    return {"k": k, "vals": acc}


def kmv_build_grouped(ds, key: str, col: str, k: int = 4096,
                      merge_parts: int = 8) -> dict:
    """One KMV sketch of COUNT(DISTINCT col) PER value of ``key``
    (bounded group count — e.g. per crawl snapshot / event type):
    {key_value: sketch}.  Partials carry at most k hashes per observed
    group per block; merge is the same concat+trim tree."""
    if k < 16:
        raise ValueError("k >= 16 required")

    def _per_group(keys: np.ndarray, h: np.ndarray) -> pa.Table:
        order = np.lexsort((h, keys))
        ks, hs = keys[order], h[order].astype(np.uint64)
        # drop duplicate (key, hash) pairs, then take first k per key
        keep = np.ones(ks.size, dtype=bool)
        keep[1:] = (ks[1:] != ks[:-1]) | (hs[1:] != hs[:-1])
        ks, hs = ks[keep], hs[keep]
        starts = np.flatnonzero(
            np.concatenate([[True], ks[1:] != ks[:-1]]))
        rank = np.arange(ks.size) - np.repeat(
            starts, np.diff(np.append(starts, ks.size)))
        sel = rank < k
        ks, hs = ks[sel], hs[sel]
        starts = np.flatnonzero(
            np.concatenate([[True], ks[1:] != ks[:-1]]))
        length = np.diff(np.append(starts, ks.size))
        return pa.table({
            "key": pa.array(ks[starts]),
            "vals": pa.array(np.split(hs, np.cumsum(length)[:-1]),
                             type=pa.list_(pa.uint64()))})

    def partial(b: pa.Table) -> pa.Table:
        keys = b.column(key).to_numpy(zero_copy_only=False)
        h = np.asarray(stable_hash64(b.column(col)))
        if keys.size == 0:
            return pa.table({"key": pa.array([], type=b.schema.field(key).type),
                             "vals": pa.array([], type=pa.list_(pa.uint64()))})
        return _per_group(keys, h)

    def merge(b: pa.Table) -> pa.Table:
        acc: dict = {}
        for kv, row in zip(b.column("key").to_pylist(), b.column("vals")):
            r = np.asarray(row.values)
            a = acc.get(kv)
            acc[kv] = r if a is None else _kmv_trim(
                np.concatenate([a, r]), k)
        names = sorted(acc)
        return pa.table({
            "key": pa.array(names, type=b.schema.field("key").type),
            "vals": pa.array([_kmv_trim(acc[n], k) for n in names],
                             type=pa.list_(pa.uint64()))})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    reduced = (parts.repartition(merge_parts)
               .map_batches(merge, batch_format="pyarrow",
                            batch_size=None, zero_copy_batch=True))
    out: dict = {}
    for b in reduced.iter_batches(batch_format="pyarrow"):
        for kv, row in zip(b.column("key").to_pylist(), b.column("vals")):
            r = np.asarray(row.values)
            a = out.get(kv)
            out[kv] = r if a is None else _kmv_trim(
                np.concatenate([a, r]), k)
    return {kv: {"k": k, "vals": v} for kv, v in out.items()}


def _kmv_threshold(sk: dict) -> int:
    """Sampling threshold in EXACT hash units (int, not float — 63-bit
    hashes exceed float64 precision): 2^63 while the sketch is exact
    (fewer than k values), else U_(k) itself (strictly excluded from
    the sample)."""
    v = sk["vals"]
    if v.size < sk["k"]:
        return 1 << 63
    return int(v[-1])


def kmv_estimate(sk: dict) -> float:
    """Distinct-count estimate: exact below k, else (k-1)/U_(k)."""
    v = sk["vals"]
    if v.size < sk["k"]:
        return float(v.size)
    return (sk["k"] - 1) * _KMV_SPACE / float(_kmv_threshold(sk))


def kmv_union(*sks: dict) -> dict:
    """Union sketch (concat + dedup + trim): exactly the sketch of the
    union stream; composable and commutative."""
    if not sks:
        raise ValueError("kmv_union needs at least one sketch")
    k = min(s["k"] for s in sks)
    return {"k": k, "vals": _kmv_trim(
        np.concatenate([s["vals"] for s in sks]), k)}


def kmv_set_ops(ska: dict, skb: dict) -> dict:
    """Theta-sketch set-operation estimates between two sketches:
    {"est_a", "est_b", "est_union", "est_intersection", "jaccard"}.
    Both samples are restricted BELOW theta = min(theta_a, theta_b)
    (strictly — U_(k) itself is the threshold, not a sample member),
    where they are uniform samples of each distinct population; the
    intersection/union estimates are sample counts divided by theta."""
    thr = min(_kmv_threshold(ska), _kmv_threshold(skb))
    a, b = ska["vals"], skb["vals"]
    if thr < (1 << 63):
        lim = np.uint64(thr)
        a, b = a[a < lim], b[b < lim]
    inter = np.intersect1d(a, b, assume_unique=True)
    n_union = a.size + b.size - inter.size
    theta = float(thr) / _KMV_SPACE
    return {"est_a": kmv_estimate(ska), "est_b": kmv_estimate(skb),
            "est_union": n_union / theta,
            "est_intersection": inter.size / theta,
            "jaccard": float(inter.size / n_union) if n_union else 0.0}


def grouped_mad_sketch(ds, keys, col: str, k: int = 256,
                       num_parts: int = 16, out_col: str = "mad",
                       broadcast_cap: int = 20_000_000):
    """Approximate per-group MAD — the hub-key twin of
    ops/stats.py::grouped_mad: two KLL passes (grouped median, then
    grouped median of |x - median|) instead of shipping raw rows.
    Rank error <1% per pass at k=256; the two errors compose, so this
    is the scale estimator, not the certification path.

    Pass-1 medians (one row per group) are broadcast via ray.put and
    joined map-side — bounded by ``broadcast_cap`` rows (raise on
    overflow: past ~2e7 groups fold the median in with a bucketed
    hash_join instead).  The raw data is read twice, never shuffled.
    """
    import ray as _ray
    import polars as pl

    kk = [keys] if isinstance(keys, str) else list(keys)
    med = grouped_quantile_sketch(ds, kk, col, [0.5], k=k,
                                  num_parts=num_parts)
    med_t = pa.concat_tables(
        [b for b in med.iter_batches(batch_format="pyarrow")]) \
        if med.count() else None
    if med_t is None or med_t.num_rows == 0:
        return med  # empty input: empty (keys, p50) table
    if med_t.num_rows > broadcast_cap:
        raise ValueError(
            f"{med_t.num_rows} groups exceed broadcast_cap="
            f"{broadcast_cap}; use a bucketed join variant")
    med_t = med_t.select(kk + ["p50"]).rename_columns(kk + ["__med"])
    ref = _ray.put(med_t)

    def dev(b: pa.Table) -> pa.Table:
        m = pl.from_arrow(_ray.get(ref))
        df = pl.from_arrow(b.select(kk + [col]))
        j = df.join(m, on=kk, how="inner")
        return j.with_columns(
            (pl.col(col) - pl.col("__med")).abs().alias("__dev")) \
            .drop("__med").to_arrow()

    dev_ds = ds.map_batches(dev, batch_format="pyarrow",
                            zero_copy_batch=True)
    out = grouped_quantile_sketch(dev_ds, kk, "__dev", [0.5], k=k,
                                  num_parts=num_parts)

    def ren(b: pa.Table) -> pa.Table:
        b = b.select(kk + ["p50"])
        return b.rename_columns(kk + [out_col])

    return out.map_batches(ren, batch_format="pyarrow",
                           zero_copy_batch=True)


def cms_inner_product(a: "np.ndarray", b: "np.ndarray") -> int:
    """Equi-join SIZE estimate from two Count-Min sketches built with
    the SAME (width, depth) (Cormode & Muthukrishnan 2005, section
    4.2): |A join B on k| = sum_k f_A(k) * f_B(k) is estimated by

        est = min_i  dot(rows_A[i], rows_B[i])

    never underestimating, with overshoot <= (e / width) * N_A * N_B
    w.p. 1 - e^-depth.  This is the classic cardinality-planning
    primitive: size a bucketed join (and pick salt / broadcast
    strategy) from two width*depth-byte summaries without touching
    either table again."""
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    if a.shape != b.shape:
        raise ValueError(f"sketch shapes differ: {a.shape} vs {b.shape}")
    # int64 row dots can overflow at web scale — use python ints
    return min(int(np.multiply(ra, rb, dtype=object).sum())
               for ra, rb in zip(a, b))


def cms_join_size(left, left_col: str, right, right_col: str, *,
                  width: int = 1 << 14, depth: int = 4) -> dict:
    """Estimate |left JOIN right| on an equi-key: two streaming
    cms_build passes + one driver dot.  Returns {"estimate",
    "bound_excess"} where bound_excess = (e/width) * N_l * N_r is the
    99%+ overshoot bound (depth >= 4)."""
    sa = cms_build(left, left_col, width=width, depth=depth)
    sb = cms_build(right, right_col, width=width, depth=depth)
    nl = int(sa[0].sum())
    nr = int(sb[0].sum())
    return {"estimate": cms_inner_product(sa, sb),
            "n_left": nl, "n_right": nr,
            "bound_excess": float(np.e / width) * nl * nr}


# ---- AMS F2 (second frequency moment / self-join size) -----------------

def ams_f2_build(ds, col: str, *, width: int = 64, depth: int = 5,
                 seed: int = 42) -> np.ndarray:
    """AMS second-moment sketch (Alon-Matias-Szegedy 1996): a
    (depth*width,) int64 counter vector; counter i accumulates
    sum over rows of sign_i(key) with sign_i a stable +-1 hash.
    E[Z_i^2] = F2 = sum over keys of count^2 (the SELF-JOIN size);
    the estimator is a median-of-means over the independent counters
    (Var[Z^2] <= 2*F2^2 per counter -> relative error ~sqrt(2/width)
    w.h.p. after the depth-median).

    Mergeable: counters SUM across blocks/partitions (the tree-merge
    law every sketch here obeys), so the pass is one per-block partial
    + driver vector sum — bitwise partitioning-invariant.
    """
    from ..functions.hashing import stable_hash64

    r = width * depth

    def partial(b: pa.Table) -> pa.Table:
        h = stable_hash64(b.column(col), seed=seed).astype(np.uint64)
        z = np.zeros(r, dtype=np.int64)
        for i in range(r):
            # per-counter sign: parity of a mixed (h, i) hash
            x = h * np.uint64(0x9E3779B97F4A7C15) ^ np.uint64(
                (0xD1B54A32D192ED03 * (i + 1)) & 0xFFFFFFFFFFFFFFFF)
            x ^= x >> np.uint64(33)
            x *= np.uint64(0xFF51AFD7ED558CCD)
            sign = ((x >> np.uint64(63)).astype(np.int64) * 2) - 1
            z[i] = int(sign.sum())
        return pa.table({"i": pa.array(np.arange(r, dtype=np.int64)),
                         "z": pa.array(z)})

    p = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    out = np.zeros(r, dtype=np.int64)
    if len(p):
        agg = p.groupby("i")["z"].sum()
        out[agg.index.to_numpy()] = agg.to_numpy()
    return out


def ams_f2_estimate(sketch: np.ndarray, *, width: int = 64,
                    depth: int = 5) -> float:
    """Median over depth groups of the mean over width counters of
    Z^2 — the F2 / self-join-size estimate."""
    z = np.asarray(sketch, dtype=np.float64)
    if z.size != width * depth:
        raise ValueError("sketch shape mismatch")
    means = (z.reshape(depth, width) ** 2).mean(axis=1)
    return float(np.median(means))
