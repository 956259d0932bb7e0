"""Structural mirror detection: adjacency MinHash + banded LSH.

Two pages whose OUT-link sets are nearly identical — mirror copies,
scraped duplicates, template navigation hubs — have high Jaccard
similarity between their neighbor sets.  MinHash over the adjacency
list (Broder 1997; the mirror-detection setting of Bharat & Broder,
SIGIR 1999) finds candidate pairs WITHOUT the all-pairs product, then
an exact neighbor-intersection join verifies each candidate.  This is
the link-structure dual of the text near-dup pipeline
(functions/dedup.py): same banded-LSH shape, but the "document" is a
vertex and the "shingles" are its out-neighbors.

Beyond-reference operator (the reference has no structural-similarity
pass); built entirely from the engine's own primitives.

Execution shape (all stages stream; nothing lands on the driver):

1. per-batch partial: hash dst ids once, apply ``num_perm`` affine
   permutations (same (a*h+b) mod (2^61-1) family the text minhash
   certifies), segmented-min per src via np.minimum.reduceat —
   one (src, m_0..m_{P-1}) row per src per block;
2. one src-partitioned exchange merges partials by column-min: the
   per-vertex signature (V x P int64 — the same table a minhash text
   index stores);
3. band keys (FNV-1a over rows_per_band signature rows) explode to
   (band, key, vid) — P ints per vertex never travel with the bands;
4. bucket groupby emits candidate pairs (sorted within bucket,
   star-capped at ``bucket_cap`` around the min vid so a degenerate
   bucket — e.g. thousands of leaf pages with identical single
   out-link — costs O(cap), not O(n^2));
5. optional exact verify: two bucketed joins count
   |N(a) ^ N(b)| per pair, a degree lookup completes
   jaccard = common / (deg_a + deg_b - common).

Determinism: permutations/band keys are seeded; candidate pairs and
all scores are pure functions of (edges, hyperparameters) —
partitioning-invariant (min/seg-min/joins are order-free).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from ..functions.dedup import _MOD, _perm_params
from ..functions.hashing import stable_hash64, stable_hash_pair64
from ..ops._util import cast_like, pre_shuffle

_PART = "__mir_part"
_FNV_OFF = np.uint64(1469598103934665603)
_FNV_PRIME = np.uint64(1099511628211)
_MASK63 = np.uint64((1 << 63) - 1)


def _sig_cols(num_perm: int):
    return [f"m_{i}" for i in range(num_perm)]


def adjacency_minhash(edges, num_perm: int = 32, seed: int = 11,
                      src_col: str = "src", dst_col: str = "dst",
                      num_parts: int = 16):
    """Per-vertex MinHash signature over the out-neighbor set:
    (vid, m_0..m_{num_perm-1}).  Duplicate (src, dst) rows are
    harmless (min over a multiset equals min over its support).  One
    exchange of at most V x num_perm int64 partial rows per block."""
    import polars as pl

    if num_perm < 4:
        raise ValueError("num_perm >= 4 required")
    a_perm, b_perm = _perm_params(num_perm, seed)
    cols = _sig_cols(num_perm)

    def partial(b: pa.Table) -> pa.Table:
        src = b.column(src_col).to_numpy(zero_copy_only=False)
        h = np.asarray(stable_hash64(b.column(dst_col))).astype(np.uint64)
        if src.size == 0:
            return pa.table({"vid": pa.array([], pa.int64()),
                             **{c: pa.array([], pa.int64()) for c in cols},
                             _PART: pa.array([], pa.int32())})
        order = np.argsort(src, kind="stable")
        src, h = src[order], h[order]
        starts = np.flatnonzero(
            np.concatenate([[True], src[1:] != src[:-1]]))
        out = {"vid": pa.array(src[starts].astype(np.int64))}
        for i, c in enumerate(cols):
            prod = (np.uint64(a_perm[i]) * h + np.uint64(b_perm[i])) \
                % np.uint64(_MOD)
            out[c] = pa.array(
                np.minimum.reduceat(prod, starts).astype(np.int64))
        t = pa.table(out)
        part = np.asarray(stable_hash64(t.column("vid"))) % num_parts
        return t.append_column(_PART, pa.array(part, type=pa.int32()))

    def merge(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g.drop_columns([_PART]))
        out = df.group_by("vid").agg(
            [pl.col(c).min() for c in cols]).sort("vid")
        want = g.schema.remove(g.schema.get_field_index(_PART))
        return cast_like(out.to_arrow(), want)

    prepped = edges.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True)
    return (pre_shuffle(prepped).groupby(_PART)
            .map_groups(merge, batch_format="pyarrow",
                        retry_exceptions=True))


def _band_keys(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n, bands) FNV-1a keys over consecutive signature rows."""
    n, p = sig.shape
    rows = p // bands
    chunks = sig.astype(np.uint64).reshape(n, bands, rows)
    x = np.full((n, bands), _FNV_OFF, dtype=np.uint64)
    for r in range(rows):
        x = (x ^ chunks[:, :, r]) * _FNV_PRIME
    return (x & _MASK63).astype(np.int64)


def mirror_candidates(edges, num_perm: int = 32, bands: int = 8,
                      seed: int = 11, bucket_cap: int = 32,
                      min_jaccard: float = 0.5, verify: bool = True,
                      src_col: str = "src", dst_col: str = "dst",
                      num_parts: int = 16,
                      signatures=None):
    """Candidate mirror pairs (a < b) with estimated neighbor-set
    Jaccard, optionally exact-verified and filtered at
    ``min_jaccard`` (applied to the exact value when ``verify``, the
    signature estimate otherwise).  With LSH parameters (P=32, b=8)
    a true Jaccard-0.8 pair is caught by >= 1 band w.p. ~0.998.
    Pass ``signatures`` to reuse a precomputed adjacency_minhash
    Dataset (it is re-read twice below)."""
    import polars as pl

    if num_perm % bands:
        raise ValueError("bands must divide num_perm")
    if not 0.0 <= min_jaccard <= 1.0:
        raise ValueError("min_jaccard in [0, 1]")
    cols = _sig_cols(num_perm)
    sigs = signatures if signatures is not None else adjacency_minhash(
        edges, num_perm, seed, src_col, dst_col, num_parts)
    sigs = sigs.materialize()  # consumed by bands AND the estimate join

    def to_bands(b: pa.Table) -> pa.Table:
        vid = b.column("vid").to_numpy(zero_copy_only=False)
        sig = np.column_stack([
            b.column(c).to_numpy(zero_copy_only=False) for c in cols]) \
            if len(b) else np.empty((0, num_perm), np.int64)
        bk = _band_keys(sig, bands)
        n = vid.size
        band_idx = np.repeat(np.arange(bands, dtype=np.int64), n)
        t = pa.table({
            "band": pa.array(band_idx),
            "key": pa.array(bk.T.ravel()),
            "vid": pa.array(np.tile(vid, bands).astype(np.int64))})
        part = (np.asarray(stable_hash_pair64(t.column("band"),
                                              t.column("key")))
                % num_parts)
        return t.append_column(_PART, pa.array(part, type=pa.int32()))

    def bucket_pairs(g: pa.Table) -> pa.Table:
        df = (pl.from_arrow(g.drop_columns([_PART]))
              .sort(["band", "key", "vid"]))
        want = pa.schema([pa.field("a", pa.int64()),
                          pa.field("b", pa.int64())])
        if df.height == 0:
            return want.empty_table()
        band = df["band"].to_numpy()
        key = df["key"].to_numpy()
        vid = df["vid"].to_numpy()
        brk = np.concatenate(
            [[True], (band[1:] != band[:-1]) | (key[1:] != key[:-1])])
        starts = np.flatnonzero(brk)
        length = np.diff(np.append(starts, vid.size))
        aa, bb = [], []
        for s, ln in zip(starts, length):
            if ln < 2:
                continue
            v = np.unique(vid[s:s + ln])
            if v.size < 2:
                continue
            if v.size > bucket_cap:  # star cap around the min vid
                aa.append(np.full(v.size - 1, v[0]))
                bb.append(v[1:])
            else:  # all pairs
                iu = np.triu_indices(v.size, 1)
                aa.append(v[iu[0]])
                bb.append(v[iu[1]])
        if not aa:
            return want.empty_table()
        return pa.table({"a": pa.array(np.concatenate(aa)),
                         "b": pa.array(np.concatenate(bb))})

    banded = sigs.map_batches(to_bands, batch_format="pyarrow",
                              zero_copy_batch=True)
    pairs = (pre_shuffle(banded).groupby(_PART)
             .map_groups(bucket_pairs, batch_format="pyarrow",
                         retry_exceptions=True))
    from ..ops.dedup import distinct
    pairs = distinct(pairs, ["a", "b"], num_parts=num_parts)

    # signature-estimate join: matching-minhash fraction
    from ..ops.join import hash_join
    p_schema = pa.schema([pa.field("a", pa.int64()),
                          pa.field("b", pa.int64())])
    s_schema = pa.schema([pa.field("vid", pa.int64())] +
                         [pa.field(c, pa.int64()) for c in cols])
    withs = hash_join(pairs, sigs, on="a", right_on="vid",
                      num_parts=num_parts, left_schema=p_schema,
                      right_schema=s_schema)

    def _prefix_a(b: pa.Table) -> pa.Table:
        return b.rename_columns(
            [f"__a_{c}" if c in cols else c for c in b.column_names])

    withs = withs.map_batches(_prefix_a, batch_format="pyarrow",
                              zero_copy_batch=True)
    w_schema = pa.schema(
        [pa.field("a", pa.int64()), pa.field("b", pa.int64())] +
        [pa.field(f"__a_{c}", pa.int64()) for c in cols])
    withs = hash_join(withs, sigs, on="b", right_on="vid",
                      num_parts=num_parts, left_schema=w_schema,
                      right_schema=s_schema)

    def estimate(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "est_jaccard": pa.array([], pa.float64())})
        sa = np.column_stack([
            b.column(f"__a_{c}").to_numpy(zero_copy_only=False)
            for c in cols])
        sb = np.column_stack([
            b.column(c).to_numpy(zero_copy_only=False) for c in cols])
        est = (sa == sb).mean(axis=1)
        return pa.table({"a": b.column("a"), "b": b.column("b"),
                         "est_jaccard": pa.array(est,
                                                 type=pa.float64())})

    scored = withs.map_batches(estimate, batch_format="pyarrow",
                               zero_copy_batch=True)
    if not verify:
        return scored.filter(expr=f"est_jaccard >= {min_jaccard}")

    return _verify_exact(scored, edges, min_jaccard, src_col, dst_col,
                         num_parts)


def _verify_exact(scored, edges, min_jaccard: float, src_col: str,
                  dst_col: str, num_parts: int):
    """Exact neighbor-set Jaccard per candidate pair: two bucketed
    joins count |N(a) ^ N(b)|, one degree join completes the union."""
    import polars as pl

    from ..ops.agg import grouped_aggregate
    from ..ops.join import hash_join

    adj = edges.map_batches(
        lambda b: pa.table({
            "src": b.column(src_col).cast(pa.int64()),
            "dst": b.column(dst_col).cast(pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)
    from ..ops.dedup import distinct
    adj = distinct(adj, ["src", "dst"], num_parts=num_parts) \
        .materialize()  # read three times below

    deg = grouped_aggregate(adj, ["src"], {"deg": ("count", None)},
                            num_parts=num_parts)

    # common neighbors: pairs x N(a), semi-matched against N(b)
    sc_schema = pa.schema([pa.field("a", pa.int64()),
                           pa.field("b", pa.int64()),
                           pa.field("est_jaccard", pa.float64())])
    adj_schema = pa.schema([pa.field("src", pa.int64()),
                            pa.field("dst", pa.int64())])
    t1 = hash_join(scored, adj, on="a", right_on="src",
                   num_parts=num_parts, left_schema=sc_schema,
                   right_schema=adj_schema)      # (a, b, est, dst)
    t1_schema = pa.schema([pa.field("a", pa.int64()),
                           pa.field("b", pa.int64()),
                           pa.field("est_jaccard", pa.float64()),
                           pa.field("dst", pa.int64())])
    t2 = hash_join(t1, adj, on=["b", "dst"], right_on=["src", "dst"],
                   num_parts=num_parts, left_schema=t1_schema,
                   right_schema=adj_schema)      # rows = common nbrs
    common = grouped_aggregate(t2, ["a", "b"],
                               {"n_common": ("count", None),
                                "est_jaccard": ("max", "est_jaccard")},
                               num_parts=num_parts)
    def _ren(old: str, new: str):
        def fn(b: pa.Table) -> pa.Table:
            return b.rename_columns(
                [new if c == old else c for c in b.column_names])
        return fn

    c_schema = pa.schema([pa.field("a", pa.int64()),
                          pa.field("b", pa.int64()),
                          pa.field("n_common", pa.int64()),
                          pa.field("est_jaccard", pa.float64())])
    d_schema = pa.schema([pa.field("src", pa.int64()),
                          pa.field("deg", pa.int64())])
    j1 = hash_join(common, deg, on="a", right_on="src",
                   num_parts=num_parts, left_schema=c_schema,
                   right_schema=d_schema)
    j1 = j1.map_batches(_ren("deg", "deg_a"), batch_format="pyarrow",
                        zero_copy_batch=True)
    j1_schema = pa.schema([pa.field("a", pa.int64()),
                           pa.field("b", pa.int64()),
                           pa.field("n_common", pa.int64()),
                           pa.field("est_jaccard", pa.float64()),
                           pa.field("deg_a", pa.int64())])
    j2 = hash_join(j1, deg, on="b", right_on="src",
                   num_parts=num_parts, left_schema=j1_schema,
                   right_schema=d_schema)
    j2 = j2.map_batches(_ren("deg", "deg_b"), batch_format="pyarrow",
                        zero_copy_batch=True)

    def finish(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table(
                {"a": pa.array([], pa.int64()),
                 "b": pa.array([], pa.int64()),
                 "est_jaccard": pa.array([], pa.float64()),
                 "n_common": pa.array([], pa.int64()),
                 "deg_a": pa.array([], pa.int64()),
                 "deg_b": pa.array([], pa.int64()),
                 "jaccard": pa.array([], pa.float64())})
        nc = b.column("n_common").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        da = b.column("deg_a").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        db = b.column("deg_b").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        j = nc / (da + db - nc)
        return pa.table({
            "a": b.column("a").cast(pa.int64()),
            "b": b.column("b").cast(pa.int64()),
            "est_jaccard": b.column("est_jaccard").cast(pa.float64()),
            "n_common": b.column("n_common").cast(pa.int64()),
            "deg_a": b.column("deg_a").cast(pa.int64()),
            "deg_b": b.column("deg_b").cast(pa.int64()),
            "jaccard": pa.array(j, type=pa.float64())})

    out = j2.map_batches(finish, batch_format="pyarrow",
                         zero_copy_batch=True)
    return out.filter(expr=f"jaccard >= {min_jaccard}")
