"""As-of join — the extension operator the reference lacks (SURVEY.md
section 2.9): for each left row, the latest right row with
``r.time <= l.time`` within the same by-key (direction="backward").

Two regimes, mirroring ops/join.py's broadcast vs bucketed split:

- ``broadcast_asof``: right side is dimension-small — ``ray.put`` once,
  per-batch ``pandas.merge_asof`` in an actor pool.  No shuffle; right
  side must fit in one worker's heap.
- ``asof_join`` (big-big default): hash-bucket BOTH sides on the by-key,
  one task-based exchange (the hash_join skeleton), then one
  ``merge_asof`` per bucket.  Partitioning assumption (documented per
  SURVEY section 7.4): all rows of a single by-key fit one bucket task.
  Key salting is NOT applicable here — as-of is order-dependent within
  a key, so a hot key cannot be split without a second merge pass.
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa

from ..functions.hashing import stable_hash64
from ._util import cast_like, pre_shuffle

_BUCKET = "__bucket"
_SIDE = "__side"
_RT = "__rt"


def asof_join(left, right, *, on: str, right_on: str,
              by: str, right_by: str,
              left_cols: List[str], right_cols: List[str],
              num_parts: int = 16,
              left_schema: Optional[pa.Schema] = None,
              right_schema: Optional[pa.Schema] = None,
              allow_exact_matches: bool = True):
    """Bucketed big-big as-of join (inner, direction='backward').

    Output columns: ``by`` + `left_cols` + `right_cols` (right columns
    carry the matched row's values); left rows with no match are dropped.
    `on`/`right_on` are the ordering (time) columns; include them in the
    payload lists if they are wanted in the output.
    """
    l_schema: pa.Schema = left_schema or left.schema().base_schema
    r_schema: pa.Schema = right_schema or right.schema().base_schema
    by_type = l_schema.field(by).type
    t_type = l_schema.field(on).type

    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"overlapping payload columns: {overlap}")

    rt_type = r_schema.field(right_on).type
    if rt_type != t_type:
        # Normalize the right ordering column to the left's type (e.g.
        # us-vs-ns timestamp units across sources) — merge_asof inside
        # the bucket task raises an opaque MergeError otherwise.  Fail
        # fast here if the types aren't castable at all.
        import pyarrow.compute as _pc
        try:
            _pc.cast(pa.nulls(0, type=rt_type), t_type)
        except pa.lib.ArrowException as e:
            raise TypeError(
                f"asof_join ordering columns have incompatible types: "
                f"left {on}={t_type}, right {right_on}={rt_type}") from e

    out_fields = ([(by, by_type)]
                  + [(c, l_schema.field(c).type) for c in left_cols]
                  + [(c, r_schema.field(c).type) for c in right_cols]
                  + [(_RT, t_type)])

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            n = b.num_rows
            cols = {}
            key = b.column(by if side == 0 else right_by)
            cols[by] = key.cast(by_type) if key.type != by_type else key
            for name, typ in out_fields[1:]:
                src = None
                if side == 0 and name in left_cols:
                    src = b.column(name)
                elif side == 1 and name in right_cols:
                    src = b.column(name)
                elif side == 1 and name == _RT:
                    src = b.column(right_on)
                if src is None:
                    cols[name] = pa.nulls(n, type=typ)
                else:
                    cols[name] = src.cast(typ) if src.type != typ else src
            # left ordering column travels as __lt for the bucket sort
            lt = b.column(on) if side == 0 else None
            cols["__lt"] = (lt.cast(t_type) if lt is not None and
                            lt.type != t_type else lt) if lt is not None \
                else pa.nulls(n, type=t_type)
            cols[_SIDE] = pa.array([side] * n, type=pa.int8())
            cols[_BUCKET] = pa.array(stable_hash64(cols[by]) % num_parts,
                                     type=pa.int32())
            return pa.table(cols)

        return fn

    tagged = left.map_batches(tag(0), batch_format="pyarrow",
                              zero_copy_batch=True).union(
        right.map_batches(tag(1), batch_format="pyarrow",
                          zero_copy_batch=True))

    out_schema = pa.schema(
        [pa.field(by, by_type)]
        + [pa.field(c, l_schema.field(c).type) for c in left_cols]
        + [pa.field(c, r_schema.field(c).type) for c in right_cols])

    def per_bucket(g: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd
        import pyarrow.compute as pc

        # split sides in ARROW first: the union table pads each side's
        # missing columns with nulls, and a whole-table to_pandas() would
        # coerce null-padded int64 columns to float64 (corrupting ids
        # beyond 2^53); per-side slices are null-free and keep int64
        side = g.column(_SIDE)
        lhs = (g.filter(pc.equal(side, 0))
               .select([by, "__lt"] + left_cols).to_pandas()
               .sort_values("__lt", kind="mergesort"))
        rhs = (g.filter(pc.equal(side, 1))
               .select([by, _RT] + right_cols).to_pandas()
               .sort_values(_RT, kind="mergesort").reset_index(drop=True))
        # merge only a positional index into the right side: merge_asof
        # coerces matched columns to float64 when any left row is
        # unmatched (NaN), silently corrupting int64 payloads > 2^53 —
        # gathering payload rows by position afterwards avoids that
        rix = rhs[[by, _RT]].copy()
        rix["__ri"] = np.arange(len(rix), dtype=np.int64)
        m = pd.merge_asof(lhs, rix, left_on="__lt", right_on=_RT,
                          by=by, direction="backward",
                          allow_exact_matches=allow_exact_matches)
        m = m.dropna(subset=["__ri"])
        ri = m["__ri"].to_numpy().astype(np.int64)
        out = m[[by] + left_cols].reset_index(drop=True)
        picked = rhs.iloc[ri][right_cols].reset_index(drop=True)
        out = pd.concat([out, picked], axis=1)
        return cast_like(pa.Table.from_pandas(out, preserve_index=False),
                         out_schema)

    return (pre_shuffle(tagged).groupby(_BUCKET)
            .map_groups(per_bucket, batch_format="pyarrow",
                        retry_exceptions=True))


def broadcast_asof(left, right_table: pa.Table, *, on: str, right_on: str,
                   by: str, right_by: str,
                   left_cols: List[str], right_cols: List[str],
                   allow_exact_matches: bool = True):
    """Small-right as-of: broadcast the right table, merge per batch.
    Same output contract as asof_join."""
    import ray

    from .join import _bcast_get

    ref = ray.put(right_table)
    r_fields = [right_table.schema.field(c) for c in right_cols]

    def asof(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        right = _bcast_get(
            ref, lambda t: t.to_pandas().sort_values(
                right_on, kind="mergesort").reset_index(drop=True))
        b = batch.to_pandas().sort_values(on, kind="mergesort")
        # positional-index merge (see asof_join.per_bucket): avoids the
        # NaN-driven float64 coercion of int64 right payloads
        rix = right[[right_by, right_on]].copy()
        rix["__ri"] = np.arange(len(rix), dtype=np.int64)
        if rix[right_on].dtype != b[on].dtype:
            # e.g. timestamp unit mismatch (ns vs us) across sources
            rix[right_on] = rix[right_on].astype(b[on].dtype)
        m = pd.merge_asof(b, rix, left_on=on, right_on=right_on,
                          left_by=by, right_by=right_by,
                          direction="backward",
                          allow_exact_matches=allow_exact_matches)
        m = m.dropna(subset=["__ri"])
        ri = m["__ri"].to_numpy().astype(np.int64)
        out = pd.concat([m[[by] + left_cols].reset_index(drop=True),
                         right.iloc[ri][right_cols].reset_index(drop=True)],
                        axis=1)
        want = pa.schema([batch.schema.field(by)]
                         + [batch.schema.field(c) for c in left_cols]
                         + r_fields)
        return cast_like(pa.Table.from_pandas(out, preserve_index=False),
                         want)

    return left.map_batches(asof, batch_format="pyarrow",
                            zero_copy_batch=True)
