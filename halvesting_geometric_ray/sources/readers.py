"""Source/sink surface (S1-S7, K1-K4 of SURVEY.md section 2).

Thin, opinionated wrappers over Ray Data's parallel readers/writers —
the engine standardizes on Parquet+zstd (the reference's single-file
TSV + external zip compression, link_prediction_metadata.py:379-422 and
helpers.py:252-287, are anti-scale artifacts deliberately dropped;
sharded parquet with deterministic part files is what makes reruns
resumable).  Column pruning at the read is mandatory at 100 TB: pass
`columns` always.
"""

from __future__ import annotations

from typing import List, Optional

import ray.data as rd


def read_parquet(path: str, columns: Optional[List[str]] = None, **kw):
    """S1/S5 analogue: parallel parquet with column pruning (+ optional
    pyarrow `filter=` expression for row-group pushdown)."""
    return rd.read_parquet(path, columns=columns, **kw)


def read_jsonl(path: str, **kw):
    """S2/S3 analogue (pd_read_jsons/dd_read_jsons, helpers.py:306-359):
    parallel JSON-lines with nested struct/list inference."""
    return rd.read_json(path, **kw)


def read_csv(path: str, **kw):
    """S5 analogue: the reference's chunked TSV reads become parallel
    blocks for free (chunksize=1e6, link_prediction_metadata.py:206-218)."""
    return rd.read_csv(path, **kw)


def write_parquet(ds, path: str, compression: str = "zstd", **kw):
    """K1/K2: sharded parquet, zstd (native codec replaces the
    reference's post-hoc zip/gzip compress, helpers.py:252-287)."""
    # Ray 2.49 forwards extra kwargs to pyarrow's ParquetWriter directly
    # (collected via **arrow_parquet_args), so pass compression bare.
    return ds.write_parquet(path, compression=compression, **kw)


def write_jsonl(ds, path: str, **kw):
    """K4 analogue (jsons_to_jsonls, helpers.py:290-303)."""
    return ds.write_json(path, **kw)


def write_single_tsv(ds, path: str, sep: str = "\t",
                     compression: Optional[str] = None) -> int:
    """Compatibility sink for the reference's single-file TSV node/edge
    layout (link_prediction_metadata.py:230-231,381-422; optional gzip per
    helpers.py:252-287).  ANTI-SCALE by design — one file, written by the
    driver — but it STREAMS batch-by-batch (iter_batches) so only one
    batch is ever in driver memory.  Returns the row count.  Use
    write_parquet for anything that matters."""
    import gzip
    import os

    tmp = f"{path}.tmp{os.getpid()}"
    opener = gzip.open if compression == "gzip" else open
    n = 0
    with opener(tmp, "wt", newline="") as f:
        first = True
        for b in ds.iter_batches(batch_format="pandas"):
            b.to_csv(f, sep=sep, header=first, index=False)
            first = False
            n += len(b)
    os.replace(tmp, path)
    return n


def write_partitioned_parquet(ds, path: str, partition_cols: List[str],
                              compression: str = "zstd", **kw):
    """K1 resumable-output variant: hive-partitioned parquet (one
    directory per partition value) — a failed run's consumer can list
    finished partition dirs and skip them, and downstream reads prune
    by partition predicate without touching data files.  Keep the
    partition column low-cardinality (shard id, date, lang, key-range
    bucket), never a raw key.  Thin wrapper over Ray's native
    ``write_parquet(partition_cols=...)``."""
    return ds.write_parquet(path, partition_cols=partition_cols,
                            compression=compression, **kw)


def read_partitioned_parquet(path: str,
                             columns: Optional[List[str]] = None, **kw):
    """Read a hive-partitioned layout back (partition columns are
    reconstructed from directory names)."""
    return rd.read_parquet(path, columns=columns, **kw)


def resumable_partitioned_write(ds, path: str, partition_col: str,
                                compression: str = "zstd") -> dict:
    """WRITER-side resumable hive-partitioned sink: partitions whose
    directory carries a ``_SUCCESS`` marker are skipped (their rows are
    filtered out BEFORE the write, so a rerun never recomputes or
    rewrites finished work); everything else writes in ONE streaming
    pass (``write_parquet(partition_cols=...)``), then each newly
    finished partition dir is stamped.  A job killed mid-write leaves
    unstamped dirs, and the next run redoes exactly those — the
    restart-over-100TB contract: progress is partition-granular, the
    marker write is the atomic commit point.

    Keep ``partition_col`` low-cardinality (shard id, date, lang,
    key-range bucket): the distinct-value scan is one column-projected
    pass, and the skip set broadcasts inside the filter.
    Returns {"written": [...], "skipped": [...]}.
    """
    import os

    import pyarrow as pa
    import pyarrow.compute as pc

    def _dirname(v) -> str:
        return f"{partition_col}={v}"

    done = set()
    if os.path.isdir(path):
        for d in os.listdir(path):
            if d.startswith(partition_col + "=") and os.path.exists(
                    os.path.join(path, d, "_SUCCESS")):
                done.add(d.split("=", 1)[1])
    vals = {str(v) for v in ds.unique(partition_col)}
    missing = sorted(vals - done)
    if missing:
        mset = set(missing)

        def keep_missing(b: pa.Table) -> pa.Table:
            col = b.column(partition_col)
            m = pc.is_in(pc.cast(col, pa.string()),
                         value_set=pa.array(sorted(mset)))
            return b.filter(m)

        (ds.map_batches(keep_missing, batch_format="pyarrow",
                        zero_copy_batch=True)
         .write_parquet(path, partition_cols=[partition_col],
                        compression=compression))
        for v in missing:
            d = os.path.join(path, _dirname(v))
            if os.path.isdir(d):
                with open(os.path.join(d, "_SUCCESS"), "w") as f:
                    f.write("ok")
    return {"written": missing, "skipped": sorted(vals & done)}


def compact_parquet(in_path: str, out_path: str,
                    target_mb: int = 128,
                    columns: Optional[List[str]] = None,
                    compression: str = "zstd") -> dict:
    """Rewrite a many-small-files parquet layer into ~target_mb files —
    the standard compaction pass after a high-parallelism write (the
    small-files problem: a 10^5-file layer costs a metadata round-trip
    per file on every downstream read).

    Block count is computed from the ON-DISK byte size (compressed), so
    output files land near target_mb compressed; the rewrite streams
    (read -> repartition -> write), never materializing the layer in
    one place.  Returns {"files_in", "bytes_in", "files_out"}.
    """
    import os

    import ray.data as rd

    files = []
    for root, _dirs, names in os.walk(in_path):
        files.extend(os.path.join(root, n) for n in names
                     if n.endswith(".parquet"))
    if not files:
        raise ValueError(f"no parquet files under {in_path}")
    bytes_in = sum(os.path.getsize(f) for f in files)
    n_out = max(1, round(bytes_in / (target_mb * (1 << 20))))
    ds = rd.read_parquet(in_path, columns=columns)
    ds.repartition(n_out).write_parquet(out_path,
                                        compression=compression)
    n_files_out = sum(1 for n in os.listdir(out_path)
                      if n.endswith(".parquet"))
    return {"files_in": len(files), "bytes_in": int(bytes_in),
            "files_out": n_files_out}
