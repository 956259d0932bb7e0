"""Grouped statistical-moment aggregates: mean / var / stddev / covar /
corr / skew / kurt (+ exact quantiles and MAD below).

SQL's VAR_SAMP, STDDEV_SAMP, COVAR_SAMP, CORR, SKEWNESS and KURTOSIS as
ONE pass over the data: every statistic decomposes into raw moments
(n, sum(x), sum(x^2), sum(x^3), sum(x^4), sum(x*y)) which are
sum-mergeable, so the plan is exactly the
grouped_aggregate two-level shape — a polars combiner inside each batch
shrinks the exchange to ~num_groups x num_blocks moment rows, a
hash-partitioned final merge sums them, and the closed-form statistics
are evaluated vectorized on the (tiny) merged table.  The raw data is
read once and never shuffled.

Numerical note: moments use the textbook E[x^2]-E[x]^2 form, not
Welford's online update.  For web-data magnitudes (means within ~1e6 of
the std) the cancellation loss is <1e-9 relative; callers wanting
hash-exact parity with another engine should round (the conformance
queries round to 6 decimals on both sides).

Scale shape at 100 TB: the only exchange is num_groups x num_blocks
moment rows — independent of row count.  Skewed group keys cost nothing
extra (moments are 40-byte rows regardless of group size).

Reference parity: the reference computes per-language corpus statistics
with pandas describe() over a materialized frame
(halvesting_geometric/utils/data/link_prediction_metadata.py:200-230);
this is the distributed, single-pass equivalent.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import stable_hash64, stable_hash_pair64
from ._util import cast_like, pre_shuffle

_PART = "__mom_part"

_UNARY = {"mean", "var", "std", "skew", "kurt"}
_BINARY = {"covar", "corr", "slope", "intercept", "r2"}


def moments_aggregate(ds, keys: List[str],
                      stats: Dict[str, Tuple[str, Union[str, Tuple[str, str]]]],
                      num_parts: int = 16, ddof: int = 1,
                      round_to: int = None):
    """stats: {out_name: (op, col | (x_col, y_col))} with op in
    mean/var/std/skew/kurt (unary) or covar/corr/slope/intercept/r2
    (binary).  var/covar use the sample (ddof=1) convention matching
    SQL VAR_SAMP/COVAR_SAMP; pass ddof=0 for the population forms.
    skew/kurt are the bias-corrected sample forms matching DuckDB
    SKEWNESS / KURTOSIS (Excel SKEW / KURT: kurt is EXCESS kurtosis);
    they ignore ddof.  The regression ops take src=(x, y) and fit
    y = slope*x + intercept by ordinary least squares (SQL
    REGR_SLOPE(y, x) argument order reversed to match covar/corr's
    (x, y) here); r2 is the squared correlation, SQL REGR_R2.  Groups
    with n <= ddof get null var/std/covar (SQL semantics); corr/r2
    are null when either side has zero variance, slope/intercept when
    x has zero variance; skew needs n >= 3 and kurt n >= 4, both null
    on zero variance (DuckDB semantics, pinned in tests).
    round_to rounds every float output (hash-parity discipline for
    cross-engine comparison — the E[x^k] cancellation loss grows with
    the moment order, so skew/kurt callers should round)."""
    import polars as pl

    cols = set()
    pairs = set()
    need3, need4 = set(), set()
    for name, (op, src) in stats.items():
        if op in _UNARY:
            cols.add(src)
            if op == "skew":
                need3.add(src)
            elif op == "kurt":
                need3.add(src)
                need4.add(src)
        elif op in _BINARY:
            x, y = src
            pairs.add((x, y))
            cols.update((x, y))
        else:
            raise ValueError(f"unsupported moment op {op!r} for {name}")
    cols = sorted(cols)
    pairs = sorted(pairs)
    need3 = sorted(need3)
    need4 = sorted(need4)

    def m_s(c):
        return f"__s_{c}"

    def m_q(c):
        return f"__q_{c}"

    def m_c(c):
        return f"__c_{c}"

    def m_4(c):
        return f"__f_{c}"

    def m_p(x, y):
        return f"__p_{x}__{y}"

    def partial(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        exprs = [pl.len().cast(pl.Int64).alias("__n")]
        for c in cols:
            f = pl.col(c).cast(pl.Float64)
            exprs.append(f.sum().alias(m_s(c)))
            exprs.append((f * f).sum().alias(m_q(c)))
        for c in need3:
            f = pl.col(c).cast(pl.Float64)
            exprs.append((f * f * f).sum().alias(m_c(c)))
        for c in need4:
            f = pl.col(c).cast(pl.Float64)
            exprs.append((f * f * f * f).sum().alias(m_4(c)))
        for x, y in pairs:
            exprs.append((pl.col(x).cast(pl.Float64) *
                          pl.col(y).cast(pl.Float64)).sum().alias(m_p(x, y)))
        out = df.group_by(keys).agg(exprs)
        t = cast_like(out.to_arrow(), b.schema)
        if len(keys) == 1:
            h = stable_hash64(t.column(keys[0]))
        else:
            h = stable_hash_pair64(t.column(keys[0]), t.column(keys[1]))
            for k in keys[2:]:
                h = stable_hash_pair64(pa.array(h), t.column(k))
        return t.append_column(_PART, pa.array(h % num_parts, type=pa.int32()))

    def final(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g.drop_columns([_PART]))
        merged = df.group_by(keys).agg(
            [pl.col("__n").sum()] +
            [pl.col(m).sum() for c in cols for m in (m_s(c), m_q(c))] +
            [pl.col(m_c(c)).sum() for c in need3] +
            [pl.col(m_4(c)).sum() for c in need4] +
            [pl.col(m_p(x, y)).sum() for x, y in pairs])
        t = merged.to_arrow()
        n = t.column("__n").to_numpy().astype(np.float64)

        def css(c):  # centered sum of squares: sum((x-mean)^2)
            s = t.column(m_s(c)).to_numpy()
            q = t.column(m_q(c)).to_numpy()
            return q - s * s / n

        def cs3(c):  # centered sum of cubes: sum((x-mean)^3)
            s1 = t.column(m_s(c)).to_numpy()
            s2 = t.column(m_q(c)).to_numpy()
            s3 = t.column(m_c(c)).to_numpy()
            return s3 - 3.0 * s1 * s2 / n + 2.0 * s1 ** 3 / (n * n)

        def cs4(c):  # centered sum of quartics: sum((x-mean)^4)
            s1 = t.column(m_s(c)).to_numpy()
            s2 = t.column(m_q(c)).to_numpy()
            s3 = t.column(m_c(c)).to_numpy()
            s4 = t.column(m_4(c)).to_numpy()
            return (s4 - 4.0 * s1 * s3 / n + 6.0 * s1 * s1 * s2 / (n * n)
                    - 3.0 * s1 ** 4 / (n ** 3))

        def cps(x, y):  # centered sum of products
            p = t.column(m_p(x, y)).to_numpy()
            return p - (t.column(m_s(x)).to_numpy() *
                        t.column(m_s(y)).to_numpy()) / n

        out = {k: t.column(k) for k in keys}
        denom_ok = n > ddof
        denom = np.where(denom_ok, n - ddof, 1.0)
        for name, (op, src) in stats.items():
            if op == "mean":
                v = t.column(m_s(src)).to_numpy() / n
                mask = np.ones(len(n), bool)
            elif op == "var":
                v = np.maximum(css(src), 0.0) / denom
                mask = denom_ok
            elif op == "std":
                v = np.sqrt(np.maximum(css(src), 0.0) / denom)
                mask = denom_ok
            elif op == "skew":
                # DuckDB SKEWNESS / Excel SKEW:
                #   n/((n-1)(n-2)) * sum((x-mean)^3) / s^3,  s = sample std
                m2 = np.maximum(css(src), 0.0)
                mask = (n >= 3) & (m2 > 0)
                with np.errstate(invalid="ignore", divide="ignore"):
                    s3 = (m2 / np.where(n > 1, n - 1.0, 1.0)) ** 1.5
                    v = (n / ((n - 1.0) * (n - 2.0))) * cs3(src) / s3
            elif op == "kurt":
                # DuckDB KURTOSIS / Excel KURT (sample EXCESS kurtosis):
                #   n(n+1)/((n-1)(n-2)(n-3)) * sum((x-mean)^4)/s^4
                #   - 3(n-1)^2/((n-2)(n-3))
                m2 = np.maximum(css(src), 0.0)
                mask = (n >= 4) & (m2 > 0)
                with np.errstate(invalid="ignore", divide="ignore"):
                    s4 = (m2 / np.where(n > 1, n - 1.0, 1.0)) ** 2
                    v = (n * (n + 1.0) / ((n - 1.0) * (n - 2.0) * (n - 3.0))
                         * cs4(src) / s4
                         - 3.0 * (n - 1.0) ** 2 / ((n - 2.0) * (n - 3.0)))
            elif op == "covar":
                v = cps(*src) / denom
                mask = denom_ok
            elif op == "corr":
                x, y = src
                vx, vy = np.maximum(css(x), 0.0), np.maximum(css(y), 0.0)
                with np.errstate(invalid="ignore", divide="ignore"):
                    v = cps(x, y) / np.sqrt(vx * vy)
                mask = (vx > 0) & (vy > 0)
            elif op == "slope":
                x, y = src
                vx = np.maximum(css(x), 0.0)
                with np.errstate(invalid="ignore", divide="ignore"):
                    v = cps(x, y) / vx
                mask = vx > 0
            elif op == "intercept":
                x, y = src
                vx = np.maximum(css(x), 0.0)
                with np.errstate(invalid="ignore", divide="ignore"):
                    sl = cps(x, y) / vx
                v = (t.column(m_s(y)).to_numpy() -
                     sl * t.column(m_s(x)).to_numpy()) / n
                mask = vx > 0
            else:  # r2
                x, y = src
                vx, vy = np.maximum(css(x), 0.0), np.maximum(css(y), 0.0)
                with np.errstate(invalid="ignore", divide="ignore"):
                    c = cps(x, y)
                    v = c * c / (vx * vy)
                mask = (vx > 0) & (vy > 0)
            if round_to is not None:
                v = np.round(v, round_to)
            out[name] = pa.array(np.where(mask, v, np.nan), type=pa.float64(),
                                 mask=~mask)
        res = pa.table(out)
        return cast_like(res, g.schema)

    prepped = ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
    return (pre_shuffle(prepped).groupby(_PART)
            .map_groups(final, batch_format="pyarrow",
                        retry_exceptions=True))


def grouped_quantile_exact(ds, keys: List[str], col: str,
                           qs: List[float], out_cols: List[str] = None,
                           num_parts: int = 16):
    """EXACT per-group continuous quantiles — SQL ``quantile_cont(col,
    q)`` / ``median(col)`` semantics: linear interpolation at rank
    q*(n-1) over the sorted group (DuckDB's Interpolator form
    ``lo*(CRN-RN) + hi*(RN-FRN)``, hash-exact against it on float64).

    One key-partitioned exchange of (keys, col) rows; per-bucket
    assembly is a vectorized sort + segmented gather-interpolate (no
    per-group loop).  NULLs in ``col`` are dropped (SQL aggregate
    semantics); groups whose values are all NULL are omitted.

    Scale shape: exact quantiles are not mergeable, so this ships the
    RAW column through the exchange — the certification / small-group
    path.  For bounded-memory approximation over hub keys use
    ops/sketch.py::grouped_quantile_sketch (KLL); same API, rank error
    <1% at k=256.
    """
    if not keys:
        raise ValueError("grouped_quantile_exact needs at least one key")
    qs = [float(q) for q in qs]
    if not qs or any(q < 0.0 or q > 1.0 for q in qs):
        raise ValueError(f"quantiles must lie in [0, 1]: {qs}")
    out_cols = out_cols or [f"q{q}" for q in qs]
    if len(out_cols) != len(qs):
        raise ValueError("out_cols must align with qs")

    import polars as pl

    def local(b: pa.Table) -> pa.Table:
        t = b.select(keys + [col])
        if len(keys) == 1:
            h = stable_hash64(t.column(keys[0]))
        else:
            h = stable_hash_pair64(t.column(keys[0]), t.column(keys[1]))
            for k in keys[2:]:
                h = stable_hash_pair64(pa.array(h), t.column(k))
        return t.append_column(_PART, pa.array(
            np.asarray(h) % num_parts, type=pa.int32()))

    def per_part(g: pa.Table) -> pa.Table:
        want = pa.schema([g.schema.field(k) for k in keys] +
                         [pa.field(c, pa.float64()) for c in out_cols])
        df = (pl.from_arrow(g.drop_columns([_PART]))
              .drop_nulls(subset=[col]).sort(keys + [col]))
        if df.height == 0:
            return want.empty_table()
        neq = df.select(pl.any_horizontal(
            [pl.col(k).ne_missing(pl.col(k).shift(1)) for k in keys])
            .alias("__b")).to_numpy().ravel().astype(bool)
        neq[0] = True
        starts = np.flatnonzero(neq)
        v = df[col].to_numpy().astype(np.float64)
        length = np.diff(np.append(starts, v.size))
        cols = dict(zip(keys, df.select(keys).to_arrow()
                        .take(starts).columns))
        for q, name in zip(qs, out_cols):
            # DuckDB's Interpolator form, reproduced bit-for-bit:
            # RN = q*(n-1); integer rank -> the element itself, else
            # lo*(CRN-RN) + hi*(RN-FRN)
            rel = q * (length - 1)
            frn = np.floor(rel)
            crn = np.ceil(rel)
            vlo = v[starts + frn.astype(np.int64)]
            vhi = v[starts + crn.astype(np.int64)]
            cols[name] = pa.array(
                np.where(frn == crn, vlo,
                         vlo * (crn - rel) + vhi * (rel - frn)),
                type=pa.float64())
        return cast_like(pa.table(cols), want)

    prepped = ds.map_batches(local, batch_format="pyarrow",
                             zero_copy_batch=True)
    return (pre_shuffle(prepped).groupby(_PART)
            .map_groups(per_part, batch_format="pyarrow",
                        retry_exceptions=True))


def grouped_mad(ds, keys: List[str], col: str, *, out_col: str = "mad",
                num_parts: int = 16, include_median: bool = False,
                median_col: str = "median"):
    """EXACT per-group median absolute deviation — SQL ``mad(col)``
    (DuckDB): ``median(abs(x - median(x)))`` with continuous median
    interpolation on both passes, hash-exact against DuckDB on
    float64.

    Same single exchange as grouped_quantile_exact: every row of a
    group lands in ONE hash bucket, so both medians are computed
    bucket-locally — the second pass is a segmented re-sort of the
    absolute deviations, never another shuffle.  NULLs are dropped;
    all-NULL groups are omitted (SQL aggregate semantics).

    Scale shape: ships the raw (keys, col) rows once, like the exact
    quantile — the certification / bounded-group path.  For hub keys
    use ops/sketch.py::grouped_mad_sketch (two KLL passes) instead.
    ``include_median=True`` appends the per-group median (computed
    anyway) as ``median_col`` — the (median, mad) pair robust_scale
    consumes.
    """
    if not keys:
        raise ValueError("grouped_mad needs at least one key")

    import polars as pl

    def local(b: pa.Table) -> pa.Table:
        t = b.select(keys + [col])
        if len(keys) == 1:
            h = stable_hash64(t.column(keys[0]))
        else:
            h = stable_hash_pair64(t.column(keys[0]), t.column(keys[1]))
            for k in keys[2:]:
                h = stable_hash_pair64(pa.array(h), t.column(k))
        return t.append_column(_PART, pa.array(
            np.asarray(h) % num_parts, type=pa.int32()))

    def _seg_median(v: np.ndarray, starts: np.ndarray,
                    length: np.ndarray) -> np.ndarray:
        # continuous median over SORTED per-segment values (DuckDB's
        # Interpolator at q=0.5, same form as grouped_quantile_exact)
        rel = 0.5 * (length - 1)
        frn = np.floor(rel)
        crn = np.ceil(rel)
        vlo = v[starts + frn.astype(np.int64)]
        vhi = v[starts + crn.astype(np.int64)]
        return np.where(frn == crn, vlo,
                        vlo * (crn - rel) + vhi * (rel - frn))

    def per_part(g: pa.Table) -> pa.Table:
        fields = [g.schema.field(k) for k in keys]
        if include_median:
            fields.append(pa.field(median_col, pa.float64()))
        fields.append(pa.field(out_col, pa.float64()))
        want = pa.schema(fields)
        df = (pl.from_arrow(g.drop_columns([_PART]))
              .drop_nulls(subset=[col]).sort(keys + [col]))
        if df.height == 0:
            return want.empty_table()
        neq = df.select(pl.any_horizontal(
            [pl.col(k).ne_missing(pl.col(k).shift(1)) for k in keys])
            .alias("__b")).to_numpy().ravel().astype(bool)
        neq[0] = True
        starts = np.flatnonzero(neq)
        v = df[col].to_numpy().astype(np.float64)
        length = np.diff(np.append(starts, v.size))
        med = _seg_median(v, starts, length)
        gid = np.repeat(np.arange(starts.size, dtype=np.int64), length)
        dev = np.abs(v - med[gid])
        order = np.lexsort((dev, gid))  # re-sort deviations per segment
        mad = _seg_median(dev[order], starts, length)
        cols = dict(zip(keys, df.select(keys).to_arrow()
                        .take(starts).columns))
        if include_median:
            cols[median_col] = pa.array(med, type=pa.float64())
        cols[out_col] = pa.array(mad, type=pa.float64())
        return cast_like(pa.table(cols), want)

    prepped = ds.map_batches(local, batch_format="pyarrow",
                             zero_copy_batch=True)
    return (pre_shuffle(prepped).groupby(_PART)
            .map_groups(per_part, batch_format="pyarrow",
                        retry_exceptions=True))


def robust_scale(ds, keys: List[str], col: str, *,
                 out_col: str = "scaled", num_parts: int = 16,
                 broadcast_cap: int = 20_000_000):
    """Per-row robust normalization ``(x - median) / mad`` against the
    row's GROUP statistics — the outlier-insensitive feature scaling a
    quality-score pipeline applies before thresholding (variance-based
    z-scores break under heavy-tailed web data).  Rows in zero-MAD
    groups get null (no spread to scale by); NULL x stays null.

    Exact: the (median, mad) pair comes from grouped_mad
    (hash-exact vs DuckDB), and the subtraction/division is the same
    two IEEE ops on both engines — certified check_exact.

    Scale shape: one grouped exchange for the stats (bounded by group
    count, guarded by ``broadcast_cap``), then a map-side broadcast
    join — the data itself is read once more, never shuffled.
    """
    import ray as _ray
    import polars as pl

    stats = grouped_mad(ds, keys, col, num_parts=num_parts,
                        include_median=True, median_col="__med",
                        out_col="__mad")
    stats_t = pa.concat_tables(
        [b for b in stats.iter_batches(batch_format="pyarrow")])
    if stats_t.num_rows > broadcast_cap:
        raise ValueError(
            f"{stats_t.num_rows} groups exceed broadcast_cap="
            f"{broadcast_cap}; fold the stats in with a bucketed join")
    ref = _ray.put(stats_t)

    def scale(b: pa.Table) -> pa.Table:
        m = pl.from_arrow(_ray.get(ref))
        df = pl.from_arrow(b)
        j = df.join(m, on=keys, how="left")
        j = j.with_columns(
            pl.when(pl.col("__mad") > 0)
            .then((pl.col(col) - pl.col("__med")) / pl.col("__mad"))
            .otherwise(None)
            .alias(out_col)).drop(["__med", "__mad"])
        want = b.schema.append(pa.field(out_col, pa.float64()))
        return cast_like(j.to_arrow(), want)

    return ds.map_batches(scale, batch_format="pyarrow",
                          zero_copy_batch=True)


def grouped_mode(ds, keys: List[str], col: str, *, out_col: str = "mode",
                 with_count: bool = False, num_parts: int = 16):
    """Deterministic per-group MODE: the most frequent value of ``col``,
    ties broken by the SMALLEST value — a total order, so the result is
    partitioning-independent and SQL-expressible (row_number() OVER
    (ORDER BY count DESC, value ASC) = 1), unlike engines' unspecified
    native mode() tie behavior.

    Pure composition of existing exchanges: a two-level (keys, col)
    count (combiner shrinks the exchange to distinct pairs) followed by
    the grouped top-1 over the count table — cost scales with distinct
    (key, value) pairs, never row count.  NULL values count like any
    other group key per GROUP BY semantics; callers wanting SQL
    aggregate NULL-dropping should filter first."""
    from .agg import grouped_aggregate
    from .topk import grouped_top_k

    counts = grouped_aggregate(ds, keys + [col],
                               {"__cnt": ("count", None)},
                               num_parts=num_parts)
    top = grouped_top_k(counts, keys, "__cnt", 1, descending=True,
                        tie_break=[col], num_parts=num_parts)

    def finish(b: pa.Table) -> pa.Table:
        cols = {k: b.column(k) for k in keys}
        cols[out_col] = b.column(col)
        if with_count:
            cols["n"] = b.column("__cnt")
        return pa.table(cols)

    return top.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


def winsorize(ds, keys: List[str], col: str, lo_q: float = 0.05,
              hi_q: float = 0.95, *, out_col: str = None,
              num_parts: int = 16):
    """Per-group quantile clipping (winsorization) — the curation guard
    for heavy-tailed document statistics: clip ``col`` to its group's
    exact [lo_q, hi_q] quantile band so outliers (boilerplate megapages,
    truncated stubs) stop dominating downstream means/mixtures.

    Returns the input rows with ``out_col`` (default ``{col}_w``)
    appended: float64 ``min(max(col, lo), hi)`` — the same two-branch
    arithmetic as SQL ``least(greatest(...))``, so results hash-exact
    against an engine oracle.

    Scale shape: the quantile table is group-cardinality-sized
    (grouped_quantile_exact), attached with ONE bucketed hash join; the
    clip is a vectorized batch kernel.  The raw data is read twice
    (quantile pass + clip pass) — at 100 TB fuse the first pass onto the
    KLL sketch variant if a <1%-rank-error band is acceptable."""
    if not 0.0 <= lo_q <= hi_q <= 1.0:
        raise ValueError(f"need 0 <= lo_q <= hi_q <= 1: {lo_q}, {hi_q}")
    from .join import hash_join

    out_col = out_col or f"{col}_w"
    q = grouped_quantile_exact(ds, keys, col, [lo_q, hi_q],
                               ["__lo", "__hi"], num_parts=num_parts)
    joined = hash_join(ds, q, on=keys, num_parts=num_parts)

    def clip(b: pa.Table) -> pa.Table:
        v = b.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        lo = b.column("__lo").to_numpy(zero_copy_only=False)
        hi = b.column("__hi").to_numpy(zero_copy_only=False)
        return (b.drop_columns(["__lo", "__hi"])
                .append_column(out_col, pa.array(
                    np.minimum(np.maximum(v, lo), hi), type=pa.float64())))

    return joined.map_batches(clip, batch_format="pyarrow",
                              zero_copy_batch=True)


def roc_auc(ds, score_col: str, label_col: str) -> float:
    """Exact ROC-AUC (ties -> average rank; the Mann-Whitney U form):

        AUC = (sum of positive ranks - P(P+1)/2) / (P * N)

    Scale shape: one grouped exchange collapses the data to one row per
    DISTINCT SCORE (count, positives) — the only cardinality that
    matters for AUC — then a distributed sort of that grouped table and
    a constant-memory driver stream accumulates rank mass in score
    order.  Driver traffic is O(distinct scores), not O(rows); with a
    continuous model score at extreme scale, quantize the score column
    first (AUC is rank-based, so quantization error is explicit and
    bounded by the bin width).

    Labels must be 0/1; raises on degenerate input (no positives or no
    negatives, where AUC is undefined)."""
    from .agg import grouped_aggregate

    def prep(b: pa.Table) -> pa.Table:
        lab = b.column(label_col).to_numpy()
        if lab.size and not np.isin(np.unique(lab), (0, 1)).all():
            raise ValueError("labels must be 0/1")
        return pa.table({"score": b.column(score_col).cast(pa.float64()),
                         "lab": pa.array(lab.astype(np.int64))})

    g = grouped_aggregate(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["score"], {"cnt": ("count", None), "pos": ("sum", "lab")})
    gs = g.sort("score")
    P = 0.0
    Nn = 0.0
    rank_sum_pos = 0.0
    seen = 0.0
    for b in gs.iter_batches(batch_format="pyarrow"):
        cnt = b.column("cnt").to_numpy().astype(np.float64)
        pos = b.column("pos").to_numpy().astype(np.float64)
        # average rank of a tie group starting after `seen` rows:
        # (seen + 1 + seen + cnt) / 2
        before = seen + np.concatenate(([0.0], np.cumsum(cnt)[:-1]))
        avg_rank = before + (cnt + 1.0) / 2.0
        rank_sum_pos += float((avg_rank * pos).sum())
        P += float(pos.sum())
        Nn += float((cnt - pos).sum())
        seen += float(cnt.sum())
    if P == 0 or Nn == 0:
        raise ValueError("roc_auc undefined: need both classes present")
    return (rank_sum_pos - P * (P + 1) / 2.0) / (P * Nn)


def grouped_entropy(ds, keys, col, *, num_parts: int = 16,
                    round_to: int = 9):
    """Per-group Shannon entropy of a categorical column — the
    diversity diagnostic of a crawl (event-type mix per user, outlink-
    host spread per page, language mix per domain).

    H(g) = ln(n_g) - (sum over categories c of cnt_c * ln(cnt_c)) / n_g

    computed from EXACT int64 category counts (two grouped exchanges:
    one per (keys, col), one per keys), so the only float work is the
    closed-form finish — rounded to ``round_to`` dp for cross-engine
    hash parity (ln of exact ints; the category ln-sum is the one
    order-sensitive term, identical to last-ulp across engines in
    practice at 9 dp).  Returns (keys..., n:int64, n_distinct:int64,
    entropy:float64)."""
    from .agg import grouped_aggregate

    keys = [keys] if isinstance(keys, str) else list(keys)

    cnt = grouped_aggregate(ds.select_columns(keys + [col]), keys + [col],
                            {"cnt": ("count", None)}, num_parts=num_parts)

    def prep(b: pa.Table) -> pa.Table:
        c = b.column("cnt").to_numpy().astype(np.float64)
        cols = {k: b.column(k) for k in keys}
        cols["cnt"] = b.column("cnt")
        cols["clnc"] = pa.array(c * np.log(c), type=pa.float64())
        return pa.table(cols)

    g = grouped_aggregate(
        cnt.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        keys, {"n": ("sum", "cnt"), "n_distinct": ("count", None),
               "s": ("sum", "clnc")}, num_parts=num_parts)

    def fin(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy().astype(np.float64)
        s = b.column("s").to_numpy()
        h = np.round(np.log(n) - s / n, round_to)
        cols = {k: b.column(k) for k in keys}
        cols["n"] = b.column("n")
        cols["n_distinct"] = b.column("n_distinct")
        cols["entropy"] = pa.array(h, type=pa.float64())
        return pa.table(cols)

    return g.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


def chi2_independence(ds, col_a: str, col_b: str, *, num_parts: int = 16,
                      round_to: int = 9):
    """Pearson chi-square test of independence between two CATEGORICAL
    columns (language vs source, lang vs host bucket) + Cramer's V —
    the drift / association diagnostic a corpus-mixture audit reads.

    chi2 = sum over the FULL marginal grid (including zero-observed
    cells) of (o - e)^2 / e with e = row_total * col_total / n;
    dof = (R-1)(C-1); cramers_v = sqrt(chi2 / (n * min(R-1, C-1))).

    Scale shape: one grouped count exchange over (col_a, col_b); the
    closed-form finish runs on the contingency table, which is bounded
    by |A| x |B| CATEGORIES (the documented contract — pass bucketed
    columns for high-cardinality dimensions), not by row count.
    Returns a one-row Dataset (chi2, dof, cramers_v, n); cramers_v is
    NULL when either side has a single category.

    Reference anchor: the reference audits per-language corpus balance
    by eyeballing pandas value_counts (link_prediction_metadata.py:
    200-230); this is the inferential version of that check.
    """
    from .agg import grouped_aggregate

    # complete-cases contract: rows with a null category on either
    # side are excluded (the standard chi2 convention; the SQL oracle
    # filters the same way)
    ds = ds.select_columns([col_a, col_b]).map_batches(
        lambda t: t.filter(pc.and_(pc.is_valid(t[col_a]),
                                   pc.is_valid(t[col_b]))),
        batch_format="pyarrow", zero_copy_batch=True)
    cnt = grouped_aggregate(ds, [col_a, col_b],
                            {"cnt": ("count", None)},
                            num_parts=num_parts)
    pdf = cnt.to_pandas()  # post-reduction: |A| x |B| cells only
    import pandas as pd
    import ray.data as rd

    if len(pdf) == 0:
        return rd.from_pandas(pd.DataFrame(
            {"chi2": [None], "dof": pd.array([0], dtype="int64"),
             "cramers_v": [None], "n": pd.array([0], dtype="int64")}))
    pivot = pdf.pivot_table(index=col_a, columns=col_b, values="cnt",
                            fill_value=0, aggfunc="sum")
    o = pivot.to_numpy().astype(np.float64)
    n = o.sum()
    rt = o.sum(axis=1, keepdims=True)
    ct = o.sum(axis=0, keepdims=True)
    e = rt @ ct / n
    chi2 = float(((o - e) ** 2 / e).sum())
    r, c = o.shape
    dof = (r - 1) * (c - 1)
    denom = n * min(r - 1, c - 1)
    v = math.sqrt(chi2 / denom) if denom > 0 else None
    return rd.from_pandas(pd.DataFrame({
        "chi2": [round(chi2, round_to)],
        "dof": pd.array([dof], dtype="int64"),
        "cramers_v": [None if v is None else round(v, round_to)],
        "n": pd.array([int(n)], dtype="int64")}))


def ks_two_sample(ds, group_col: str, value_col: str, a, b, *,
                  num_parts: int = 16, round_to: int = 9):
    """Exact two-sample Kolmogorov-Smirnov statistic between the
    ``value_col`` distributions of groups ``a`` and ``b`` — the
    distribution-drift gate between two crawl snapshots / sources
    (doc-length drift, score drift after a pipeline change).

    D = max over x of |F_a(x) - F_b(x)|, evaluated at every distinct
    value.  Plan: grouped (value, group) counts -> (x, ca, cb) rows ->
    range-partition on x -> per-part sort + local cumsum -> tiny
    per-part totals to the driver -> prefix offsets broadcast back ->
    the CDF gap per distinct value.  Driver state is num_parts rows;
    the distinct-value table is never materialized whole.  Exact-int
    cumulative counts divided by exact totals give bitwise-identical
    doubles across engines, so ks_d at 9 dp is hash-stable.

    Returns a one-row Dataset (ks_d, x_at_max, n_a, n_b) with x_at_max
    the SMALLEST x attaining the max gap (deterministic tie-break).
    """
    import polars as pl

    from .agg import grouped_aggregate

    ds = ds.select_columns([group_col, value_col])
    ds = ds.map_batches(
        lambda t: t.filter(pc.is_in(t[group_col],
                                    value_set=pa.array([a, b]))),
        batch_format="pyarrow", zero_copy_batch=True)
    cnt = grouped_aggregate(ds, [value_col, group_col],
                            {"cnt": ("count", None)}, num_parts=num_parts)

    def split(t: pa.Table) -> pa.Table:
        g = t.column(group_col)
        c = t.column("cnt").to_numpy()
        isa = pc.equal(g, pa.scalar(a)).to_numpy(zero_copy_only=False)
        return pa.table({
            "x": t.column(value_col),
            "ca": pa.array(np.where(isa, c, 0), type=pa.int64()),
            "cb": pa.array(np.where(isa, 0, c), type=pa.int64())})

    xc = grouped_aggregate(
        cnt.map_batches(split, batch_format="pyarrow",
                        zero_copy_batch=True),
        ["x"], {"ca": ("sum", "ca"), "cb": ("sum", "cb")},
        num_parts=num_parts).materialize()  # referenced 3x below

    lo = xc.min("x")
    hi = xc.max("x")
    if lo is None:  # both groups empty
        import pandas as pd
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame(
            {"ks_d": [None], "x_at_max": [None],
             "n_a": pd.array([0], dtype="int64"),
             "n_b": pd.array([0], dtype="int64")}))
    width = (float(hi) - float(lo)) or 1.0

    def part_of(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy().astype(np.float64)
        p = np.minimum(((x - float(lo)) / width * num_parts).astype(np.int32),
                       num_parts - 1)
        return t.append_column("__ks_part", pa.array(p, type=pa.int32()))

    parted = xc.map_batches(part_of, batch_format="pyarrow",
                            zero_copy_batch=True)

    def local_cum(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g).sort("x")
        df = df.with_columns(pl.col("ca").cum_sum().alias("cum_a"),
                             pl.col("cb").cum_sum().alias("cum_b"))
        return df.to_arrow().cast(pa.schema(
            list(g.schema) + [pa.field("cum_a", pa.int64()),
                              pa.field("cum_b", pa.int64())]))

    cum = (parted.groupby("__ks_part")
           .map_groups(local_cum, batch_format="pyarrow",
                       retry_exceptions=True).materialize())

    # tiny per-part totals -> driver prefix offsets
    tot = grouped_aggregate(cum.select_columns(["__ks_part", "ca", "cb"]),
                            ["__ks_part"],
                            {"sa": ("sum", "ca"), "sb": ("sum", "cb")},
                            num_parts=4).to_pandas()
    off_a = np.zeros(num_parts + 1, dtype=np.int64)
    off_b = np.zeros(num_parts + 1, dtype=np.int64)
    sa = np.zeros(num_parts, dtype=np.int64)
    sb = np.zeros(num_parts, dtype=np.int64)
    if len(tot):
        idx = tot["__ks_part"].to_numpy()
        sa[idx] = tot["sa"].to_numpy()
        sb[idx] = tot["sb"].to_numpy()
    np.cumsum(sa, out=off_a[1:])
    np.cumsum(sb, out=off_b[1:])
    n_a, n_b = int(off_a[-1]), int(off_b[-1])
    if n_a == 0 or n_b == 0:
        import pandas as pd
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame(
            {"ks_d": [None], "x_at_max": [None],
             "n_a": pd.array([n_a], dtype="int64"),
             "n_b": pd.array([n_b], dtype="int64")}))

    def gap(t: pa.Table) -> pa.Table:
        p = t.column("__ks_part").to_numpy()
        f1 = (t.column("cum_a").to_numpy() + off_a[p]) / n_a
        f2 = (t.column("cum_b").to_numpy() + off_b[p]) / n_b
        return pa.table({"x": t.column("x"),
                         "d": pa.array(np.abs(f1 - f2),
                                       type=pa.float64())})

    gaps = cum.map_batches(gap, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    ks = gaps.max("d")
    x_star = gaps.map_batches(
        lambda t: t.filter(pc.equal(t["d"], pa.scalar(float(ks)))),
        batch_format="pyarrow", zero_copy_batch=True).min("x")
    import pandas as pd
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(
        {"ks_d": [round(float(ks), round_to)], "x_at_max": [x_star],
         "n_a": pd.array([n_a], dtype="int64"),
         "n_b": pd.array([n_b], dtype="int64")}))


def anova_oneway(ds, group_col: str, value_col: str, *,
                 num_parts: int = 16, round_to: int = 9):
    """One-way ANOVA F statistic of ``value_col`` across the groups of
    ``group_col`` — the k-sample companion to ks_two_sample (is the
    doc-length distribution's MEAN the same across sources?).

    F = (SSB / (k-1)) / (SSW / (N-k)) from exact integer sufficient
    statistics (count, sum, sum of squares) per group — one grouped
    exchange; the float finish runs on the k-row group table with the
    same literal expression order as the SQL oracle, rounded
    ``round_to`` dp.  Returns a one-row Dataset
    (f_stat, df_between, df_within, n); f_stat NULL when k < 2 or the
    within-group variance is zero.
    """
    from .agg import grouped_aggregate

    def prep(b: pa.Table) -> pa.Table:
        col = b.column(value_col)
        # integer-sufficient-statistics contract: fail fast on a
        # float / non-integer / null-bearing column instead of
        # silently truncating (or NaN-poisoning) the F statistic
        if not pa.types.is_integer(col.type):
            raise TypeError(
                f"anova_oneway requires an integer value column; "
                f"{value_col!r} is {col.type} (cast losslessly "
                f"upstream or bin the values first)")
        if col.null_count:
            raise ValueError(
                f"anova_oneway: {value_col!r} has {col.null_count} "
                f"nulls in a batch; drop or impute them upstream")
        v = col.to_numpy(zero_copy_only=False)
        return pa.table({group_col: b.column(group_col),
                         "v": pa.array(v.astype(np.int64)),
                         "sq": pa.array((v.astype(np.int64)
                                         * v.astype(np.int64)))})

    g = grouped_aggregate(
        ds.select_columns([group_col, value_col]).map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True),
        [group_col], {"n": ("count", None), "s": ("sum", "v"),
                      "ss": ("sum", "sq")},
        num_parts=num_parts).to_pandas()  # k rows, post-reduction

    import pandas as pd
    import ray.data as rd

    k = len(g)
    N = int(g["n"].sum())
    if k < 2 or N <= k:
        return rd.from_pandas(pd.DataFrame(
            {"f_stat": [None],
             "df_between": pd.array([max(k - 1, 0)], dtype="int64"),
             "df_within": pd.array([max(N - k, 0)], dtype="int64"),
             "n": pd.array([N], dtype="int64")}))
    n_g = g["n"].to_numpy().astype(np.float64)
    s_g = g["s"].to_numpy().astype(np.float64)
    ss_g = g["ss"].to_numpy().astype(np.float64)
    S = float(g["s"].sum())
    M = S / N
    ssw = float((ss_g - s_g * s_g / n_g).sum())
    m_g = s_g / n_g
    ssb = float((n_g * ((m_g - M) * (m_g - M))).sum())
    f = (ssb / (k - 1)) / (ssw / (N - k)) if ssw > 0 else None
    return rd.from_pandas(pd.DataFrame(
        {"f_stat": [None if f is None else round(f, round_to)],
         "df_between": pd.array([k - 1], dtype="int64"),
         "df_within": pd.array([N - k], dtype="int64"),
         "n": pd.array([N], dtype="int64")}))


def _avg_ranks(ds, col: str, *, num_parts: int = 16):
    """(value, avg_rank) over the non-null values of ``col``: the
    tie-averaged rank  n_less + (n_eq + 1) / 2  per DISTINCT value —
    the same range-partitioned prefix-sum plan as ks_two_sample.
    Returns (rank_ds, n_total)."""
    import polars as pl

    from .agg import grouped_aggregate

    cnt = grouped_aggregate(
        ds.select_columns([col]).map_batches(
            lambda t: t.filter(pc.is_valid(t[col])),
            batch_format="pyarrow", zero_copy_batch=True),
        [col], {"cnt": ("count", None)},
        num_parts=num_parts).materialize()
    lo = cnt.min(col)
    hi = cnt.max(col)
    if lo is None:
        return None, 0
    width = (float(hi) - float(lo)) or 1.0

    def part_of(t: pa.Table) -> pa.Table:
        x = t.column(col).to_numpy().astype(np.float64)
        p = np.minimum(((x - float(lo)) / width * num_parts).astype(
            np.int32), num_parts - 1)
        return t.append_column("__rk_part", pa.array(p, type=pa.int32()))

    def local_cum(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g).sort(col)
        df = df.with_columns(pl.col("cnt").cum_sum().alias("cum"))
        return df.to_arrow().cast(pa.schema(
            list(g.schema) + [pa.field("cum", pa.int64())]))

    cum = (cnt.map_batches(part_of, batch_format="pyarrow",
                           zero_copy_batch=True)
           .groupby("__rk_part")
           .map_groups(local_cum, batch_format="pyarrow",
                       retry_exceptions=True).materialize())
    tot = grouped_aggregate(cum.select_columns(["__rk_part", "cnt"]),
                            ["__rk_part"], {"s": ("sum", "cnt")},
                            num_parts=4).to_pandas()
    off = np.zeros(num_parts + 1, dtype=np.int64)
    sizes = np.zeros(num_parts, dtype=np.int64)
    if len(tot):
        sizes[tot["__rk_part"].to_numpy()] = tot["s"].to_numpy()
    np.cumsum(sizes, out=off[1:])
    n_total = int(off[-1])

    def fin(t: pa.Table) -> pa.Table:
        p = t.column("__rk_part").to_numpy()
        cum = t.column("cum").to_numpy() + off[p]
        c = t.column("cnt").to_numpy()
        n_less = (cum - c).astype(np.float64)
        avg = n_less + (c.astype(np.float64) + 1.0) / 2.0
        return pa.table({col: t.column(col),
                         "avg_rank": pa.array(avg, type=pa.float64())})

    return cum.map_batches(fin, batch_format="pyarrow",
                           zero_copy_batch=True), n_total


def spearman_corr(ds, x_col: str, y_col: str, *, num_parts: int = 16,
                  round_to: int = 9):
    """Spearman rank correlation of two numeric columns — the
    monotone-association statistic (robust to outliers and nonlinear
    scalings, the drift/association companion to Pearson corr):
    Pearson correlation of the tie-averaged ranks.

    Plan: one grouped count + prefix-sum pass per column for the
    distinct-value average ranks, two bucketed joins to decorate rows,
    then a 6-sum moment reduce (no exchange).  Rows with a null in
    EITHER column are excluded (complete-cases, matching SQL window
    behavior in the oracle).  Returns a one-row Dataset
    (spearman_rho, n); NULL rho when n < 2 or either side is constant.
    """
    from .join import hash_join

    ds = ds.select_columns([x_col, y_col]).map_batches(
        lambda t: t.filter(pc.and_(pc.is_valid(t[x_col]),
                                   pc.is_valid(t[y_col]))),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    rx, _n = _avg_ranks(ds, x_col, num_parts=num_parts)
    ry, _m = _avg_ranks(ds, y_col, num_parts=num_parts)
    import pandas as pd
    import ray.data as rd

    if rx is None or ry is None:
        return rd.from_pandas(pd.DataFrame(
            {"spearman_rho": [None],
             "n": pd.array([0], dtype="int64")}))

    base = ds.schema().base_schema
    xt = base.field(x_col).type
    yt = base.field(y_col).type
    d_schema = pa.schema([pa.field(x_col, xt), pa.field(y_col, yt)])
    rx_schema = pa.schema([pa.field(x_col, xt),
                           pa.field("avg_rank", pa.float64())])
    j = hash_join(ds, rx, on=x_col, right_on=x_col,
                  right_cols=["avg_rank"], num_parts=num_parts,
                  left_schema=d_schema, right_schema=rx_schema)
    j = j.map_batches(
        lambda t: t.rename_columns([x_col, y_col, "rx"]),
        batch_format="pyarrow", zero_copy_batch=True)
    j_schema = pa.schema([pa.field(x_col, xt), pa.field(y_col, yt),
                          pa.field("rx", pa.float64())])
    ry_schema = pa.schema([pa.field(y_col, yt),
                           pa.field("avg_rank", pa.float64())])
    j = hash_join(j, ry, on=y_col, right_on=y_col,
                  right_cols=["avg_rank"], num_parts=num_parts,
                  left_schema=j_schema, right_schema=ry_schema)

    def part(t: pa.Table) -> pa.Table:
        a = t.column("rx").to_numpy()
        b = t.column("avg_rank").to_numpy()
        return pa.table({
            "n": pa.array([len(a)], type=pa.int64()),
            "sa": pa.array([a.sum()]), "sb": pa.array([b.sum()]),
            "saa": pa.array([(a * a).sum()]),
            "sbb": pa.array([(b * b).sum()]),
            "sab": pa.array([(a * b).sum()])})

    p = j.map_batches(part, batch_format="pyarrow",
                      zero_copy_batch=True).to_pandas()
    n = int(p["n"].sum())
    if n < 2:
        return rd.from_pandas(pd.DataFrame(
            {"spearman_rho": [None],
             "n": pd.array([n], dtype="int64")}))
    sa, sb = float(p["sa"].sum()), float(p["sb"].sum())
    saa, sbb = float(p["saa"].sum()), float(p["sbb"].sum())
    sab = float(p["sab"].sum())
    ca = saa - sa * sa / n
    cb = sbb - sb * sb / n
    cab = sab - sa * sb / n
    rho = cab / math.sqrt(ca * cb) if ca > 0 and cb > 0 else None
    return rd.from_pandas(pd.DataFrame(
        {"spearman_rho": [None if rho is None else round(rho, round_to)],
         "n": pd.array([n], dtype="int64")}))


def psi_drift(ds, group_col: str, value_col: str, a, b,
              boundaries, *, num_parts: int = 16, round_to: int = 9):
    """Population Stability Index between the ``value_col``
    distributions of groups ``a`` (reference) and ``b`` (current) over
    EXPLICIT bin boundaries — the production-ML drift monitor
    (PSI < 0.1 stable, 0.1-0.25 moderate, > 0.25 major shift):

        PSI = sum over bins of (p_bin - q_bin) * ln(p_bin / q_bin)

    with p/q the reference/current bin fractions.  Bins where EITHER
    side is empty are skipped (documented convention — no epsilon
    fudge; the skipped-bin count is reported).  Boundaries are
    explicit lower-edge-inclusive width_bucket edges so the SQL oracle
    is exact; bin fractions are exact-int counts over exact totals.

    One grouped count exchange; the finish runs on the bin-bounded
    table.  Returns a one-row Dataset
    (psi, n_bins_used, n_bins_skipped, n_a, n_b).
    """
    import pandas as pd
    import ray.data as rd

    from .agg import grouped_aggregate
    from .bucketize import bucketize

    edges = np.asarray(boundaries, dtype=np.float64)
    if len(edges) < 2:
        raise ValueError("need >= 2 boundaries")

    ds = ds.select_columns([group_col, value_col]).map_batches(
        lambda t: t.filter(pc.is_in(t[group_col],
                                    value_set=pa.array([a, b]))),
        batch_format="pyarrow", zero_copy_batch=True)
    binned = bucketize(ds, value_col, boundaries=edges)
    cnt = grouped_aggregate(
        binned.select_columns([group_col, "bucket"]),
        [group_col, "bucket"], {"c": ("count", None)},
        num_parts=num_parts).to_pandas()  # bins x 2 rows

    ca = cnt[cnt[group_col] == a].set_index("bucket")["c"]
    cb = cnt[cnt[group_col] == b].set_index("bucket")["c"]
    n_a, n_b = int(ca.sum()), int(cb.sum())
    if n_a == 0 or n_b == 0:
        return rd.from_pandas(pd.DataFrame(
            {"psi": [None],
             "n_bins_used": pd.array([0], dtype="int64"),
             "n_bins_skipped": pd.array([0], dtype="int64"),
             "n_a": pd.array([n_a], dtype="int64"),
             "n_b": pd.array([n_b], dtype="int64")}))
    bins = sorted(set(ca.index) | set(cb.index))
    psi = 0.0
    used = skipped = 0
    for bin_ in bins:
        x = int(ca.get(bin_, 0))
        y = int(cb.get(bin_, 0))
        if x > 0 and y > 0:
            p = x / n_a
            q = y / n_b
            psi += (p - q) * math.log(p / q)
            used += 1
        else:
            skipped += 1
    return rd.from_pandas(pd.DataFrame(
        {"psi": [round(psi, round_to)],
         "n_bins_used": pd.array([used], dtype="int64"),
         "n_bins_skipped": pd.array([skipped], dtype="int64"),
         "n_a": pd.array([n_a], dtype="int64"),
         "n_b": pd.array([n_b], dtype="int64")}))
