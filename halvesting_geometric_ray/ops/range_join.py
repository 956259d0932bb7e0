"""Range join: equi-key join + interval containment predicate.

``left.ts BETWEEN right.start AND right.end`` within an equi-key match
— the point-in-validity-window join (events against offer windows,
crawls against site ownership periods).  The named sibling of
ops/asof.py's as-of join.

Scale shape: rides the bucketed hash_join exchange on the equi key; the
range predicate applies INSIDE each bucket task via ``bucket_post``
(all rows of a key co-locate, so filtering the in-bucket join product
adds zero exchanges).  The intermediate product within one bucket is
keys x matching-rows — bound it by keeping the equi key selective; a
degenerate equi key (everything in one bucket) needs interval
partitioning, which this operator deliberately does not do (document
the assumption at the caller, SURVEY 7.4 skew guidance).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .join import hash_join


def range_join(left, right, on, left_ts: str, right_start: str,
               right_end: str, right_on=None,
               inclusive: str = "both", num_parts: int = 16,
               left_cols=None, right_cols=None,
               left_schema=None, right_schema=None):
    """Inner join on the equi key(s) with ``left_ts`` inside
    [right_start, right_end]; ``inclusive`` in {"both", "left",
    "right", "neither"} picks boundary closedness (SQL BETWEEN =
    "both")."""
    lo_ops = {"both": pc.greater_equal, "left": pc.greater_equal,
              "right": pc.greater, "neither": pc.greater}
    hi_ops = {"both": pc.less_equal, "left": pc.less,
              "right": pc.less_equal, "neither": pc.less}
    if inclusive not in lo_ops:
        raise ValueError(f"bad inclusive {inclusive!r}")
    lo, hi = lo_ops[inclusive], hi_ops[inclusive]

    def in_range(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        ts = t.column(left_ts)
        m = pc.and_kleene(lo(ts, t.column(right_start)),
                          hi(ts, t.column(right_end)))
        return t.filter(pc.fill_null(m, False))

    return hash_join(left, right, on=on, right_on=right_on,
                     join_type="inner", num_parts=num_parts,
                     left_cols=left_cols, right_cols=right_cols,
                     left_schema=left_schema, right_schema=right_schema,
                     bucket_post=in_range)
