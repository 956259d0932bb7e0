"""Small Arrow utilities shared by ops."""

from __future__ import annotations

import pyarrow as pa


def cast_like(tbl: pa.Table, ref_schema: pa.Schema) -> pa.Table:
    """Cast columns of `tbl` back to the types of `ref_schema` (matched by
    name).  Needed because polars round-trips utf8 as large_utf8, which
    breaks join-key type equality downstream."""
    cols = []
    names = []
    for f in tbl.schema:
        col = tbl.column(f.name)
        idx = ref_schema.get_field_index(f.name)
        if idx >= 0:
            want = ref_schema.field(idx).type
            if want != f.type:
                col = col.cast(want)
        names.append(f.name)
        cols.append(col)
    return pa.table(dict(zip(names, cols)))


def tune_block_sizing():
    """Clamp Ray Data's read-split floor to the session's CPU count.

    Ray's default ``read_op_min_num_blocks`` is 200: every read is
    split into >=200 blocks regardless of size, so a 600k-row corpus
    becomes 200 x ~350 KB blocks and the fused read->map chain turns
    into 200 tiny tasks whose scheduling overhead dwarfs the UDF work
    (measured: curation chain at 8 CPUs 3.04 s -> 1.22 s from this
    knob alone).  At 100 TB the knob is inert — file count >> CPUs and
    blocks land near ``target_max_block_size`` — so this only changes
    the small-input regime, where the floor should track the actual
    execution slots, not a 100-node default.  min(200, ...) keeps the
    stock behavior whenever it would have been reached anyway.

    Idempotent; call after ray.init (falls back to os.cpu_count when
    no session is up).  Returns the chosen floor.
    """
    import os

    import ray
    import ray.data as rd

    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 0)) or 1
    else:
        cpus = os.cpu_count() or 1
    floor = min(200, max(8, 2 * cpus))
    rd.DataContext.get_current().read_op_min_num_blocks = floor
    return floor


def pre_shuffle(ds, num_blocks: int = None):
    """Coalesce block count before a sort-based groupby (see
    config.default_shuffle_blocks — sort cost scales with input blocks
    squared, not rows)."""
    from ..config import DEFAULT

    return ds.repartition(num_blocks or DEFAULT.shuffle_blocks)


def arrow_schema_of(ds) -> pa.Schema:
    """Best-effort Arrow schema WITHOUT executing the plan.  Parquet
    reads expose a true pa.Schema from file metadata; pandas-backed
    datasets (rd.from_pandas, common in tests) expose a
    PandasBlockSchema whose numpy dtypes we map across (object ->
    utf8, the pandas string convention)."""
    import numpy as np

    sch = ds.schema().base_schema
    if isinstance(sch, pa.Schema):
        return sch
    fields = []
    for n, t in zip(sch.names, sch.types):
        if isinstance(t, pa.DataType):
            fields.append(pa.field(n, t))
        elif t == np.dtype("O"):
            fields.append(pa.field(n, pa.string()))
        else:
            fields.append(pa.field(n, pa.from_numpy_dtype(t)))
    return pa.schema(fields)


def compact_fsl(t: pa.Table) -> pa.Table:
    """Compact a table containing fixed_size_list columns before handing
    it to polars: a zero-copy SLICE of a fixed_size_list block (which is
    exactly what a map_groups task receives from a sorted shuffle) trips
    a polars from_arrow bug ("validity mask length must be equal to the
    number of values divided by size") — and with retry_exceptions=True
    the group task would retry forever.  ``take`` materializes fresh
    offset-free arrays; no-op for tables without fixed_size_list."""
    if not any(pa.types.is_fixed_size_list(f.type) for f in t.schema):
        return t
    import numpy as np

    return t.combine_chunks().take(np.arange(t.num_rows))
