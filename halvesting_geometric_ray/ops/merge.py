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
