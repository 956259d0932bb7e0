"""Deterministic distributed sampling (R3 of SURVEY.md section 2.7).

`seeded_sample` draws a uniform n-row sample that depends only on
(key column values, seed) — NOT on partitioning, block order, or
cluster size: every row gets the score stable_hash64(key XOR'd with the
seed), and the global n smallest scores win.  Per-batch pruning keeps
the exchange at <= n x blocks rows (a top-k, not a shuffle of the
input); ties (duplicate keys) are kept deterministically by score then
key order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import stable_hash64

_SCORE = "__sample_score"


def seeded_sample(ds, key, n: int, seed: int = 17):
    """Uniform deterministic sample of n rows keyed on `key` (a column
    name or list of names).

    DETERMINISM CONTRACT: the key (tuple) must uniquely identify a row —
    rows sharing a key value share a score, and score ties are broken by
    arbitrary block order.  Pass every identifying column for full
    partitioning-independence."""
    from ..functions.hashing import stable_hash_pair64

    keys = [key] if isinstance(key, str) else list(key)
    smix = np.int64(
        ((seed * 0x9E3779B97F4A7C15 + 1) & 0xFFFFFFFFFFFFFFFF) >> 1)

    def score(b: pa.Table) -> pa.Table:
        h = np.asarray(stable_hash64(b.column(keys[0])))
        for k in keys[1:]:
            h = np.asarray(stable_hash_pair64(pa.array(h), b.column(k)))
        s = np.bitwise_xor(h, smix)
        t = b.append_column(_SCORE, pa.array(s, type=pa.int64()))
        # local prune: only this batch's n best can make the global cut
        if t.num_rows > n:
            order = np.argsort(s, kind="stable")[:n]
            t = t.take(pa.array(np.sort(order)))
        return t

    out = (ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)
           .sort(_SCORE).limit(n))
    return out.drop_columns([_SCORE])


def stratified_sample(ds, strata, key, n_per_stratum: int, seed: int = 17,
                      num_parts: int = 16):
    """Deterministic uniform sample of n rows PER STRATUM (composition of
    the seeded score with ops.topk.grouped_top_k — per-batch candidate
    pruning keeps the exchange at <= n x strata x blocks rows).  Same
    key-uniqueness contract as seeded_sample."""
    from ..functions.hashing import stable_hash_pair64
    from .topk import grouped_top_k

    strata = [strata] if isinstance(strata, str) else list(strata)
    keys = [key] if isinstance(key, str) else list(key)
    smix = np.int64(
        ((seed * 0x9E3779B97F4A7C15 + 1) & 0xFFFFFFFFFFFFFFFF) >> 1)

    def score(b: pa.Table) -> pa.Table:
        h = np.asarray(stable_hash64(b.column(keys[0])))
        for k in keys[1:]:
            h = np.asarray(stable_hash_pair64(pa.array(h), b.column(k)))
        s = np.bitwise_xor(h, smix)
        return b.append_column(_SCORE, pa.array(s, type=pa.int64()))

    scored = ds.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True)
    out = grouped_top_k(scored, strata, _SCORE, n_per_stratum,
                        descending=False, tie_break=keys,
                        num_parts=num_parts, rank_col="__rnk")
    return out.drop_columns([_SCORE, "__rnk"])


def mixture_resample(ds, group_col: str, key, rates, seed: int = 17,
                     default_rate: float = 0.0):
    """Domain-mixture resampling — keep each row of group g with
    probability ``rates[g]`` (a Bernoulli hash-threshold per row): the
    training-data reweighting step that turns a raw crawl distribution
    into a target domain mixture (e.g. {'en': 1.0, 'web': 0.3,
    'forum': 0.05}).

    ONE stateless ``map_batches`` — no shuffle, no driver state; the
    decision is ``hash(key, seed) < rate * 2^63``, so the kept set is
    deterministic, partitioning-independent, and NESTED across rates
    (rate 0.1's sample is a subset of rate 0.3's with the same seed —
    lets mixtures be retuned without resampling churn).  Same
    key-uniqueness contract as seeded_sample.  Groups missing from
    ``rates`` use ``default_rate`` (0 = drop).

    Rates above 1.0 are capped at keep-all (upsampling needs row
    duplication — out of scope; emit the row count and repeat at the
    loader instead).
    """
    from ..functions.hashing import stable_hash_pair64

    keys = [key] if isinstance(key, str) else list(key)
    smix = np.int64(
        ((seed * 0x9E3779B97F4A7C15 + 1) & 0xFFFFFFFFFFFFFFFF) >> 1)
    max_score = float(1 << 63)
    rate_map = {k: min(max(float(v), 0.0), 1.0) for k, v in rates.items()}

    def keep(b: pa.Table) -> pa.Table:
        import pandas as pd

        h = np.asarray(stable_hash64(b.column(keys[0])))
        for k in keys[1:]:
            h = np.asarray(stable_hash_pair64(pa.array(h), b.column(k)))
        s = np.bitwise_xor(h, smix).astype(np.float64)
        # scores are uniform over [0, 2^63) (top bit cleared upstream)
        r = (pd.Series(b.column(group_col).to_pandas())
             .map(rate_map).fillna(default_rate).to_numpy(dtype=np.float64))
        return b.filter(pa.array(s < r * max_score))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def weighted_sample(ds, key, weight_col: str, n: int, seed: int = 17):
    """Weighted sample WITHOUT replacement of n rows, inclusion odds
    proportional to ``weight_col`` (Efraimidis-Spirakis A-ES: rank by
    u^(1/w) with u a deterministic hash uniform -> equivalently keep the
    n smallest -ln(u)/w exponential keys).

    Same determinism contract and scale shape as seeded_sample: hash
    uniforms derive from (key, seed) so the draw is partitioning-
    invariant; each batch locally prunes to its n best, then one bounded
    sort+limit picks the global winners.  Rows with weight <= 0 or null
    are never sampled."""
    from ..functions.hashing import stable_hash_pair64

    if n <= 0:
        raise ValueError("n must be positive")
    keys = [key] if isinstance(key, str) else list(key)
    smix = np.int64(
        ((seed * 0x9E3779B97F4A7C15 + 1) & 0xFFFFFFFFFFFFFFFF) >> 1)

    def score(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        h = np.asarray(stable_hash64(b.column(keys[0])))
        for k in keys[1:]:
            h = np.asarray(stable_hash_pair64(pa.array(h), b.column(k)))
        h = np.bitwise_xor(h, smix)
        # uniform in (0, 1): 53 mantissa bits of the 63-bit hash
        u = ((h.astype(np.uint64) >> np.uint64(10)).astype(np.float64)
             + 1.0) / float(1 << 53)
        w = pc.cast(b.column(weight_col), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            e = -np.log(u) / w
        e[~(w > 0)] = np.inf  # null/zero/negative weight: never sampled
        t = b.append_column(_SCORE, pa.array(e, type=pa.float64()))
        if t.num_rows > n:
            order = np.argsort(e, kind="stable")[:n]
            t = t.take(pa.array(np.sort(order)))
        return t.filter(pc.less(t.column(_SCORE), np.inf))

    out = (ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)
           .sort(_SCORE).limit(n))
    return out.drop_columns([_SCORE])


def split_by_group(ds, group_col: str, test_frac: float, seed: int = 17,
                   out_col: str = "split"):
    """Leakage-free train/test split: every row of a GROUP (a near-dup
    cluster, a host, a user) lands on the same side, decided by a
    deterministic hash threshold on the group id — the split a dedup
    pipeline must use, or near-duplicates of training docs leak into
    the held-out set and inflate eval (the failure mode the Lee 2022
    dedup study measures).  Stateless one-pass map (zero exchanges),
    partitioning-invariant, and NESTED in test_frac like
    mixture_resample (growing the test set keeps prior members)."""
    from ..functions.hashing import stable_hash64

    if not (0.0 <= test_frac <= 1.0):
        raise ValueError("test_frac must be in [0, 1]")
    thr = np.int64(int(test_frac * ((1 << 63) - 1)))

    def tag(b: pa.Table) -> pa.Table:
        h = stable_hash64(b.column(group_col), seed=seed)
        lab = np.where(h < thr, "test", "train")
        return b.append_column(out_col, pa.array(lab, type=pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow",
                          zero_copy_batch=True)


def token_budget_sample(ds, group_col: str, weight_col: str, budget, *,
                        order_by=None, key=None, seed: int = 17,
                        num_parts: int = 16):
    """Sample each group up to a WEIGHT BUDGET (token budget per
    domain/language — the data-mixing counterpart of the rate-based
    mixture_resample): rows are taken in a deterministic per-group
    order until the running weight sum would exceed the group's
    budget; a row is kept iff its INCLUSIVE running sum <= budget.

    ``order_by``: explicit priority column (SQL-reproducible); else
    pass ``key`` and rows are ordered by a seeded stable hash of it
    (uniform, partitioning-independent — retuning seed reshuffles).
    ``budget``: one number, or {group_value: number} (groups absent
    from the dict are dropped entirely).

    Scale shape: one key-partitioned exchange (ops/window.py::
    cumulative) + a stateless filter.  Same skew note as all window
    ops: one group's rows co-locate in one task.
    """
    import numpy as np
    import pyarrow as pa

    from ..functions.hashing import stable_hash64
    from .window import cumulative

    if (order_by is None) == (key is None):
        raise ValueError("pass exactly one of order_by / key")
    if order_by is None:
        def prio(b: pa.Table) -> pa.Table:
            h = stable_hash64(b.column(key), seed=seed)
            return b.append_column("__prio", pa.array(h))

        ds = ds.map_batches(prio, batch_format="pyarrow",
                            zero_copy_batch=True)
        order_col = "__prio"
    else:
        order_col = order_by
    run = cumulative(ds, group_col, order_col,
                     {"__run": (weight_col, "sum")},
                     num_parts=num_parts)

    def keep(b: pa.Table) -> pa.Table:
        r = b.column("__run").to_numpy().astype(np.float64)
        if isinstance(budget, dict):
            g = b.column(group_col).to_pylist()
            cap = np.array([float(budget.get(x, -1.0)) for x in g])
        else:
            cap = np.full(r.size, float(budget))
        out = b.filter(pa.array(r <= cap))
        drop = ["__run"] + (["__prio"] if order_by is None else [])
        return out.drop_columns(drop)

    return run.map_batches(keep, batch_format="pyarrow",
                           zero_copy_batch=True)
