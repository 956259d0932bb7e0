"""Keyed upsert (MERGE) of a delta table into a base table.

The table-maintenance primitive of a recurring-crawl warehouse: rows
whose key appears in the delta are REPLACED by the delta row, all other
base rows pass through — the semantics of SQL MERGE / Delta-Lake
upsert, as one bucketed anti-join + a union (graph/incremental.py is
the graph-layer specialization of the same idea: reference
build_metadata.py re-runs replace prior outputs wholesale; this keeps
the unchanged ones).

Scale shape: the base never materializes anywhere — one anti-join
exchange bucketed on the key (ops/join.py machinery, key columns only
move for the bucket decision) and a streaming union.  Multi-column
keys supported; the delta must be key-unique (validated per bucket by
the anti-join's build side being a set — duplicate delta keys raise).
"""

from __future__ import annotations

from typing import List, Sequence, Union

import pyarrow as pa

from ..config import DEFAULT, EngineConfig
from .join import hash_join


def upsert(base, delta, on: Union[str, Sequence[str]], *,
           base_schema: pa.Schema = None,
           cfg: EngineConfig = DEFAULT):
    """Return base with delta applied: delta rows win on key collision,
    unmatched base rows pass through, delta-only keys insert.  `on`:
    key column name(s).  Schemas must match (validated via
    `base_schema` when given, else the first batch)."""
    keys: List[str] = [on] if isinstance(on, str) else list(on)
    if not keys:
        raise ValueError("need at least one key column")
    sch = base_schema or pa.schema(
        [(n, t) for n, t in zip(base.schema().names,
                                base.schema().types)])
    for k in keys:
        if k not in sch.names:
            raise ValueError(f"key column {k!r} not in schema")
    key_schema = pa.schema([(k, sch.field(k).type) for k in keys])
    delta_keys = delta.select_columns(keys)
    survivors = hash_join(base, delta_keys, on=keys, right_on=keys,
                          join_type="anti", num_parts=cfg.num_parts,
                          left_schema=sch, right_schema=key_schema)
    return survivors.union(delta)


def upsert_scd2(base, delta, on: Union[str, Sequence[str]], *,
                ts_col: str, valid_from: str = "valid_from",
                valid_to: str = "valid_to",
                base_schema: pa.Schema = None,
                cfg: EngineConfig = DEFAULT):
    """History-preserving upsert (slowly-changing-dimension type 2) —
    the recrawl-history table: base rows carry [valid_from, valid_to)
    intervals with valid_to NULL marking the current version; applying
    a delta (one observation per key, timestamped by ``ts_col``)
    CLOSES the matched current rows at the delta's timestamp and
    appends the delta as the new current version.  Expired base rows
    (valid_to already set) always pass through untouched.

    Returns the new history table (same schema as base:
    payload + valid_from + valid_to).  delta carries payload + ts_col.

    Scale shape: current/expired split is a stateless filter; matched-
    current closing is ONE bucketed inner join (delta side ships only
    key + ts), unmatched-current pass-through is the matching anti
    join — both on the same key bucketing.  Nothing materializes.
    """
    keys: List[str] = [on] if isinstance(on, str) else list(on)
    if not keys:
        raise ValueError("need at least one key column")
    sch = base_schema or pa.schema(
        [(n, t) for n, t in zip(base.schema().names,
                                base.schema().types)])
    for c in keys + [valid_from, valid_to]:
        if c not in sch.names:
            raise ValueError(f"column {c!r} not in base schema")

    import pyarrow.compute as pc

    def _split(null_side: bool):
        def f(b: pa.Table) -> pa.Table:
            m = pc.is_null(b.column(valid_to))
            return b.filter(m if null_side else pc.invert(m))

        return f

    expired = base.map_batches(_split(False), batch_format="pyarrow",
                               zero_copy_batch=True)
    current = base.map_batches(_split(True), batch_format="pyarrow",
                               zero_copy_batch=True)

    dsch = pa.schema([(k, sch.field(k).type) for k in keys]
                     + [(ts_col, sch.field(valid_from).type)])
    dkeys = delta.select_columns(keys + [ts_col])
    # unmatched current rows stay open
    untouched = hash_join(current, dkeys, on=keys, right_on=keys,
                          join_type="anti", num_parts=cfg.num_parts,
                          left_schema=sch, right_schema=dsch)
    # matched current rows close at the delta timestamp
    closed = hash_join(current, dkeys, on=keys, right_on=keys,
                       num_parts=cfg.num_parts,
                       left_schema=sch, right_schema=dsch)

    def close(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index(valid_to)
        return b.set_column(i, valid_to,
                            b.column(ts_col).cast(sch.field(valid_to)
                                                  .type)) \
            .drop_columns([ts_col])

    closed = closed.map_batches(close, batch_format="pyarrow",
                                zero_copy_batch=True)

    def open_rows(b: pa.Table) -> pa.Table:
        cols = {}
        for f in sch:
            if f.name == valid_from:
                cols[f.name] = b.column(ts_col).cast(f.type)
            elif f.name == valid_to:
                cols[f.name] = pa.nulls(b.num_rows, f.type)
            else:
                cols[f.name] = b.column(f.name).cast(f.type)
        return pa.table(cols)

    fresh = delta.map_batches(open_rows, batch_format="pyarrow",
                              zero_copy_batch=True)
    return expired.union(untouched).union(closed).union(fresh)


def snapshot_diff(base, delta, on: Union[str, Sequence[str]], *,
                  cmp_cols: Sequence[str],
                  base_schema: pa.Schema = None,
                  delta_schema: pa.Schema = None,
                  cfg: EngineConfig = DEFAULT):
    """Classify every key across two crawl snapshots:

    - ``added``     key only in the new snapshot (delta),
    - ``removed``   key only in the old snapshot (base),
    - ``changed``   key in both but any ``cmp_cols`` value differs,
    - ``unchanged`` key in both, all compared values equal
      (null == null counts as equal — absence of a field is a stable
      observation, not a change).

    Returns ds(keys..., status).  The recrawl-report primitive next to
    ``upsert`` (apply) and ``upsert_scd2`` (history): one bucketed
    full-outer exchange on the key; only keys + compared columns move.
    Presence is tracked with explicit int8 indicator columns, so null
    VALUES in ``cmp_cols`` never masquerade as a missing row.
    """
    import numpy as np
    import pyarrow.compute as pc

    keys: List[str] = [on] if isinstance(on, str) else list(on)
    cmp_list = list(cmp_cols)
    if not keys or not cmp_list:
        raise ValueError("need key and cmp columns")
    overlap = set(keys) & set(cmp_list)
    if overlap:
        raise ValueError(f"cmp_cols overlap keys: {overlap}")

    def tag(prefix: str):
        def fn(b: pa.Table) -> pa.Table:
            cols = {k: b.column(k) for k in keys}
            for c in cmp_list:
                cols[f"{prefix}_{c}"] = b.column(c)
            cols[f"{prefix}_present"] = pa.array(
                np.ones(b.num_rows, dtype=np.int8))
            return pa.table(cols)

        return fn

    def side_schema(src_schema, prefix):
        if src_schema is None:
            return None
        fields = [(k, src_schema.field(k).type) for k in keys]
        fields += [(f"{prefix}_{c}", src_schema.field(c).type)
                   for c in cmp_list]
        fields += [(f"{prefix}_present", pa.int8())]
        return pa.schema(fields)

    b_tag = base.map_batches(tag("b"), batch_format="pyarrow",
                             zero_copy_batch=True)
    d_tag = delta.map_batches(tag("d"), batch_format="pyarrow",
                              zero_copy_batch=True)
    joined = hash_join(b_tag, d_tag, on=keys, join_type="full",
                       num_parts=cfg.num_parts,
                       left_schema=side_schema(base_schema, "b"),
                       right_schema=side_schema(delta_schema, "d"))

    def classify(t: pa.Table) -> pa.Table:
        n = t.num_rows
        in_b = pc.fill_null(t.column("b_present"), 0).to_numpy(
            zero_copy_only=False).astype(bool)
        in_d = pc.fill_null(t.column("d_present"), 0).to_numpy(
            zero_copy_only=False).astype(bool)
        same = np.ones(n, dtype=bool)
        for c in cmp_list:
            lb = t.column(f"b_{c}")
            ld = t.column(f"d_{c}")
            eq = pc.fill_null(pc.equal(lb, ld), False).to_numpy(
                zero_copy_only=False)
            both_null = pc.and_(pc.is_null(lb), pc.is_null(ld)).to_numpy(
                zero_copy_only=False)
            same &= (eq | both_null)
        status = np.where(~in_b, "added",
                          np.where(~in_d, "removed",
                                   np.where(same, "unchanged", "changed")))
        cols = {k: t.column(k) for k in keys}
        cols["status"] = pa.array(status.tolist(), type=pa.string())
        return pa.table(cols)

    return joined.map_batches(classify, batch_format="pyarrow",
                              zero_copy_batch=True)
