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
