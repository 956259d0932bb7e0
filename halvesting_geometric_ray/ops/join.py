"""Join helpers (SURVEY.md section 2.5).

Three regimes, chosen explicitly by the caller:

- broadcast lookup / semi: the reference's dimension joins (J1-J5:
  domains, authors, affiliations — small side) become a ``ray.put`` of
  the small table once + a vectorized per-batch lookup inside
  ``map_batches``.  No shuffle, no per-batch re-ship.
- bucketed hash join (default big-big): the citation-resolution join
  (J6/J7, reference link_prediction_metadata.py:321-331) as an explicit
  partitioned hash join — tag sides, union, hash-bucket the key,
  ``groupby(bucket).map_groups`` with a vectorized polars merge per
  bucket.  Runs on Ray's task-based shuffle, so it degrades gracefully
  at low CPU counts (Ray's actor-pool `Dataset.join` reserves aggregator
  CPUs up front and can starve a 4-CPU session).
- ``native_join``: Ray Data's built-in hash-shuffle ``Dataset.join`` —
  the streaming choice on real multi-node clusters with CPUs to reserve.

Skew note: bucket = stable_hash(key) % B spreads distinct keys; a single
hot key (hub url) still lands in one bucket.  ``hash_join(salt=k)``
splits each left key across k sub-buckets and replicates the right side
into them — the salted-key hub treatment of SURVEY.md section 7.4 (use
when a hub key's rows outgrow one bucket task; costs k x right-side
shuffle volume).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import pyarrow as pa

import ray

from ..functions.hashing import stable_hash64
from ._util import cast_like, pre_shuffle

_BUCKET = "__bucket"
_SIDE = "__side"


def native_join(left, right, on: Tuple[str, ...], right_on: Optional[Tuple[str, ...]] = None,
                join_type: str = "inner", num_parts: int = 16):
    return left.join(right, join_type=join_type, num_partitions=num_parts,
                     on=on, right_on=right_on)


def hash_join(left, right, on, right_on=None,
              join_type: str = "inner", num_parts: int = 16,
              left_cols: Optional[List[str]] = None,
              right_cols: Optional[List[str]] = None,
              left_schema: Optional[pa.Schema] = None,
              right_schema: Optional[pa.Schema] = None,
              salt: int = 1,
              bucket_post=None):
    """Bucketed big-big equi-join on one or more key columns.

    `on`/`right_on` are a column name or list of names (right keys are
    renamed to the left names and dropped from the output payload).
    Buckets are keyed on the FIRST key column only — rows with equal
    first key co-locate, the per-bucket merge applies all keys.  Output
    columns: keys + left payload cols + right payload cols.  Row order
    is arbitrary; the result set is deterministic.

    Skew: `salt > 1` splits each LEFT key across `salt` sub-buckets
    (per-row hash) and replicates every RIGHT row into all of them —
    the salted-key treatment for hub keys (a hub url whose outlink rows
    would otherwise pile into one bucket task, SURVEY.md section 7.4).
    Only for inner/semi/anti with a unique-keyed right side; costs
    salt x right-side shuffle volume.
    """
    keys = [on] if isinstance(on, str) else list(on)
    rkeys = keys if right_on is None else \
        ([right_on] if isinstance(right_on, str) else list(right_on))
    # .schema() on a non-trivial lazy pipeline EXECUTES part of it to
    # infer types — callers with map-derived inputs should pass schemas
    # explicitly to avoid running the upstream twice.
    l_schema: pa.Schema = left_schema or left.schema().base_schema
    r_schema: pa.Schema = right_schema or right.schema().base_schema
    l_payload = left_cols or [f.name for f in l_schema if f.name not in keys]
    r_payload = right_cols or [f.name for f in r_schema if f.name not in rkeys]
    overlap = set(l_payload) & set(r_payload)
    if overlap:
        raise ValueError(f"overlapping payload columns: {overlap}")

    key_types = [l_schema.field(k).type for k in keys]
    out_fields = list(zip(keys, key_types)) + \
        [(c, l_schema.field(c).type) for c in l_payload] + \
        [(c, r_schema.field(c).type) for c in r_payload]

    def tag(side: int, key_cols: List[str], payload: List[str]):
        def fn(b: pa.Table) -> pa.Table:
            import numpy as np

            n = b.num_rows
            cols = {}
            for name, typ, kc in zip(keys, key_types, key_cols):
                c = b.column(kc)
                cols[name] = c.cast(typ) if c.type != typ else c
            for name, typ in out_fields[len(keys):]:
                if name in payload:
                    c = b.column(name)
                    cols[name] = c.cast(typ) if c.type != typ else c
                else:
                    cols[name] = pa.nulls(n, type=typ)
            h = stable_hash64(cols[keys[0]]) % num_parts
            if salt > 1:
                if side == 0:
                    sub = np.arange(n, dtype=np.int64) % salt
                    cols[_SIDE] = pa.array([side] * n, type=pa.int8())
                    cols[_BUCKET] = pa.array(h * salt + sub, type=pa.int32())
                    return pa.table(cols)
                # replicate the right side into every sub-bucket
                outs = []
                for sb in range(salt):
                    c2 = dict(cols)
                    c2[_SIDE] = pa.array([side] * n, type=pa.int8())
                    c2[_BUCKET] = pa.array(h * salt + sb, type=pa.int32())
                    outs.append(pa.table(c2))
                return pa.concat_tables(outs)
            cols[_SIDE] = pa.array([side] * n, type=pa.int8())
            cols[_BUCKET] = pa.array(h, type=pa.int32())
            return pa.table(cols)

        return fn

    # validate HERE, not inside per_bucket — map_groups runs with
    # retry_exceptions=True, so a deterministic error in the group task
    # would retry until the session times out
    if join_type not in ("inner", "left", "semi", "anti", "full"):
        raise ValueError(f"unsupported join_type {join_type!r}")
    if salt > 1 and join_type not in ("inner", "semi", "anti"):
        raise ValueError("salt>1 requires inner/semi/anti join")
    if salt > 1 and bucket_post is not None:
        # bucket_post's contract is "all rows of a key in one bucket";
        # salting splits a key across sub-buckets, so per-bucket
        # post-processing (e.g. dedup) would silently stop being global
        raise ValueError("bucket_post cannot be combined with salt>1")

    tagged = left.map_batches(tag(0, keys, l_payload), batch_format="pyarrow",
                              zero_copy_batch=True).union(
        right.map_batches(tag(1, rkeys, r_payload), batch_format="pyarrow",
                          zero_copy_batch=True))

    out_schema = pa.schema([pa.field(n, t) for n, t in out_fields])

    def per_bucket(g: pa.Table) -> pa.Table:
        import polars as pl

        from ._util import compact_fsl

        df = pl.from_arrow(compact_fsl(g.drop_columns([_BUCKET])))
        lhs = df.filter(pl.col(_SIDE) == 0).select(keys + l_payload)
        rhs = df.filter(pl.col(_SIDE) == 1).select(keys + r_payload)
        how = {"inner": "inner", "left": "left", "semi": "semi",
               "anti": "anti", "full": "full"}[join_type]
        j = lhs.join(rhs, on=keys, how=how, coalesce=True) \
            if how == "full" else lhs.join(rhs, on=keys, how=how)
        out = cast_like(j.to_arrow(), out_schema)
        # bucket_post runs on the complete merged bucket (all rows of each
        # key co-located) — the hook for exactly-once per-key work like a
        # shuffle-free dedup of join-key-functional outputs.
        return bucket_post(out) if bucket_post is not None else out

    return (pre_shuffle(tagged).groupby(_BUCKET)
            .map_groups(per_bucket, batch_format="pyarrow",
                        retry_exceptions=True))


# Per-worker-process cache of broadcast small sides, keyed by ObjectRef.
# Broadcast stages run as PLAIN TASKS (not actor pools — Ray 2.49 actor
# pools can intermittently hang at startup after heavy sessions); Ray
# worker processes persist across tasks, so this cache gives actor-style
# amortization of the arrow->polars conversion without the pool.
_BCAST_CACHE: dict = {}
_BCAST_CACHE_MAX = 8  # bound per-worker heap: entries are converted
# dimension tables (KB-100MB); 8 x worst-case stays well under a worker
# heap while still amortizing the busy stages' conversions


def _bcast_get(ref, build):
    k = ref.hex()
    v = _BCAST_CACHE.get(k)
    if v is None:
        if len(_BCAST_CACHE) >= _BCAST_CACHE_MAX:
            _BCAST_CACHE.pop(next(iter(_BCAST_CACHE)))
        v = build(ray.get(ref))
        _BCAST_CACHE[k] = v
    return v


def broadcast_lookup(ds, key: str, mapping_table: pa.Table, map_key: str,
                     map_vals: List[str], how: str = "inner"):
    """Map-side join of `ds` against a small table via an object-store
    broadcast (ray.put once; workers read zero-copy and cache the
    converted frame per process)."""
    ref = ray.put(mapping_table)
    val_fields = [mapping_table.schema.field(v) for v in map_vals]

    def lookup(batch: pa.Table) -> pa.Table:
        import polars as pl

        small = _bcast_get(
            ref, lambda t: pl.from_arrow(t).select([map_key] + map_vals))
        b = pl.from_arrow(batch)
        out = b.join(small, left_on=key, right_on=map_key,
                     how=("inner" if how == "inner" else "left"))
        want = batch.schema
        for f in val_fields:
            want = want.append(f)
        return cast_like(out.to_arrow(), want)

    return ds.map_batches(lookup, batch_format="pyarrow", zero_copy_batch=True)


def broadcast_semi(ds, key: str, keys_table: pa.Table, key_col: str, anti: bool = False):
    """Semi/anti join against a broadcast key set (F1' of SURVEY 2.5)."""
    ref = ray.put(keys_table)

    def semi(batch: pa.Table) -> pa.Table:
        import polars as pl

        keys_df = _bcast_get(
            ref, lambda t: pl.from_arrow(t).select(key_col).unique())
        b = pl.from_arrow(batch)
        out = b.join(keys_df.rename({key_col: key}), on=key,
                     how=("anti" if anti else "semi"))
        return cast_like(out.to_arrow(), batch.schema)

    return ds.map_batches(semi, batch_format="pyarrow", zero_copy_batch=True)


def bloom_filtered_join(left, right, on, right_on=None, *,
                        num_parts: int = 16, num_bits: int = 1 << 22,
                        num_hashes: int = 5,
                        left_schema=None, right_schema=None,
                        left_cols=None, right_cols=None):
    """Inner ``hash_join`` with a Bloom pre-filter on the LEFT side:
    build a Bloom filter over the right keys (constant-size OR-merge,
    ops/sketch.py), broadcast it once, and drop left rows whose key
    cannot match BEFORE the all-to-all exchange.

    The classic selective-join optimization: when only a small fraction
    of left rows survive the join (a dimension subset, a delta batch,
    a candidate set), the shuffle ships that fraction (+ the Bloom
    FPR) instead of the whole left table.  False positives only — the
    inner join after the exchange discards them, so the result is
    EXACTLY hash_join's.  Wrong tool when most left rows match (the
    filter shrinks nothing and costs a pass)."""
    from .sketch import bloom_build, bloom_might_contain

    rk = right_on or on
    lk = on if isinstance(on, str) else on[0]
    rk0 = rk if isinstance(rk, str) else rk[0]
    bits = bloom_build(right, rk0, num_bits=num_bits,
                       num_hashes=num_hashes)
    ref = ray.put(bits)

    def prefilter(b: pa.Table) -> pa.Table:
        m = bloom_might_contain(ray.get(ref), b.column(lk),
                                num_hashes=num_hashes)
        return b.filter(pa.array(m))

    filtered = left.map_batches(prefilter, batch_format="pyarrow",
                                zero_copy_batch=True)
    return hash_join(filtered, right, on=on, right_on=right_on,
                     num_parts=num_parts, left_schema=left_schema,
                     right_schema=right_schema, left_cols=left_cols,
                     right_cols=right_cols)
