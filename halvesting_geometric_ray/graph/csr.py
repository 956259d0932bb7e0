"""Per-partition CSR shard build — the analogue of the reference's
`coalesce` + tensor-graph materialization
(reference link_prediction_dataset.py:208-256: sort edge pairs, dedup,
num_nodes = max+1), re-expressed as a ``groupby(part).map_groups`` over
the edge table.

Shard p covers the contiguous vid range [offsets[p], offsets[p+1]) that
the dense-id assigner gave partition p (ops/ids.py), so vertex ownership
is a searchsorted — no lookup table.  Each shard row stores:

- indptr/indices: CSR over the local sources (sorted by (src,dst));
- udsts/uinv: pre-factored unique destinations + inverse index, so each
  PageRank/LP round aggregates per-destination contributions with one
  ``np.bincount(uinv, weights=...)`` instead of re-sorting E values;
- udst_part: owning partition of each unique destination (precomputed
  scatter routing).

Shards are written one parquet file per partition (from inside the group
task, atomic rename) plus a tiny descriptor table — the driver never
materializes edge data, and iteration workers open only their own shard
file (cached per actor).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from ..ops.ids import owner_of

SHARD_SCHEMA = pa.schema([
    pa.field("part", pa.int32()),
    pa.field("vid_lo", pa.int64()),
    pa.field("vid_hi", pa.int64()),
    pa.field("n_edges", pa.int64()),
    pa.field("indptr", pa.large_list(pa.int64())),
    pa.field("indices", pa.large_list(pa.int64())),
    pa.field("udsts", pa.large_list(pa.int64())),
    pa.field("uinv", pa.large_list(pa.int64())),
    pa.field("udst_part", pa.large_list(pa.int32())),
])


def _shard_table(p: int, lo: int, hi: int, src: np.ndarray, dst: np.ndarray,
                 offsets: np.ndarray,
                 w: Optional[np.ndarray] = None) -> pa.Table:
    order = np.lexsort((dst, src))
    src = src[order]
    dst = dst[order]
    if w is not None:
        if (np.asarray(w) <= 0).any():
            raise ValueError("edge weights must be > 0")
        w = np.asarray(w, dtype=np.float64)[order]
    if src.size:
        # exact (src, dst) dedup INSIDE the shard: all copies of a pair
        # land in the same shard group, so this enforces the simple-graph
        # invariant without any upstream global distinct — callers may
        # feed symmetrize(distinct=False) output (saves a 2E shuffle).
        # In WEIGHTED mode duplicate pairs SUM their weights
        # (multiplicity folds into the weight).
        keep = np.r_[True, (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])]
        if w is not None:
            grp = np.cumsum(keep) - 1
            w = np.bincount(grp, weights=w, minlength=int(keep.sum()))
        src, dst = src[keep], dst[keep]
    elif w is not None:
        w = np.empty(0, dtype=np.float64)
    size = hi - lo
    counts = np.bincount((src - lo).astype(np.int64), minlength=size)
    indptr = np.zeros(size + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    udsts, uinv = np.unique(dst, return_inverse=True)
    udst_part = owner_of(udsts, offsets)
    cols = {
        "part": pa.array([p], type=pa.int32()),
        "vid_lo": pa.array([lo], type=pa.int64()),
        "vid_hi": pa.array([hi], type=pa.int64()),
        "n_edges": pa.array([len(src)], type=pa.int64()),
        "indptr": pa.array([indptr], type=pa.large_list(pa.int64())),
        "indices": pa.array([dst], type=pa.large_list(pa.int64())),
        "udsts": pa.array([udsts], type=pa.large_list(pa.int64())),
        "uinv": pa.array([uinv.astype(np.int64)], type=pa.large_list(pa.int64())),
        "udst_part": pa.array([udst_part], type=pa.large_list(pa.int32())),
    }
    if w is not None:
        cols["weights"] = pa.array([w], type=pa.large_list(pa.float64()))
    return pa.table(cols)


def build_csr_shards(edges, offsets: np.ndarray, out_dir: str,
                     force: bool = False,
                     lineage: Optional[Dict] = None,
                     weight_col: Optional[str] = None) -> List[Dict]:
    """edges(src,dst[,weight]) -> one CSR shard parquet per partition +
    descriptors.

    Returns the descriptor list [{part, path, vid_lo, vid_hi, n_edges}].
    Partitions with no out-edges get an empty shard (their vertices are
    dangling) so every vid range is covered.

    SIMPLE-GRAPH CONTRACT: duplicate (src, dst) rows are dropped inside
    each shard (the engine's edge tables are exact-deduped per the north
    rule; this also lets symmetrize(dedup=False) skip its shuffle).
    With `weight_col` set (WEIGHTED mode), duplicate pairs instead SUM
    their weights — multigraph multiplicity folds into the weight; the
    shard files gain a `weights` column aligned with `indices`, and the
    done-marker stamp includes the weight column so weighted and
    unweighted builds never adopt each other's shards.

    `lineage` (edge-set provenance: self-loop flag, vertex count, ...) is
    stored in the done-marker; a marker written under a DIFFERENT lineage
    forces a rebuild instead of silently reusing foreign shards.
    """
    import json

    num_parts = len(offsets) - 1
    stamp = {"lineage": lineage or {}, "num_parts": num_parts,
             "n": int(offsets[-1])}
    if weight_col is not None:
        stamp["weight_col"] = weight_col
    done = os.path.join(out_dir, "_SHARDS_DONE")
    if os.path.exists(done) and not force:
        try:
            with open(done) as f:
                prev = json.load(f)
        except (json.JSONDecodeError, OSError):
            prev = None
        if prev == stamp:
            return shard_descriptors(out_dir, offsets)
        # lineage mismatch: drop the stale marker BEFORE rebuilding — a
        # crash mid-rebuild must not leave the old stamp next to a mix of
        # old and new shard files
        os.remove(done)
    os.makedirs(out_dir, exist_ok=True)
    off = offsets

    def add_part(b: pa.Table) -> pa.Table:
        if weight_col is not None:
            # validate HERE, not in the group task: the shard build runs
            # with retry_exceptions=True (transient-I/O robustness), so a
            # deterministic input error raised there would retry forever
            wv = b.column(weight_col).to_numpy()
            if (wv <= 0).any() or np.isnan(wv.astype(np.float64)).any():
                raise ValueError("edge weights must be > 0")
        part = owner_of(b.column("src").to_numpy(), off)
        return b.append_column("part", pa.array(part, type=pa.int32()))

    def build(g: pa.Table) -> pa.Table:
        p = int(g.column("part")[0].as_py())
        src = g.column("src").to_numpy()
        dst = g.column("dst").to_numpy()
        w = (g.column(weight_col).to_numpy().astype(np.float64)
             if weight_col is not None else None)
        t = _shard_table(p, int(off[p]), int(off[p + 1]), src, dst, off, w)
        path = os.path.join(out_dir, f"shard-{p:05d}.parquet")
        tmp = f"{path}.tmp{os.getpid()}"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        return pa.table({"part": pa.array([p], type=pa.int32()),
                         "n_edges": pa.array([len(src)], type=pa.int64())})

    from ..ops._util import pre_shuffle

    built = (
        pre_shuffle(edges.map_batches(add_part, batch_format="pyarrow",
                                      zero_copy_batch=True))
        .groupby("part")
        .map_groups(build, batch_format="pyarrow", retry_exceptions=True)
        .to_pandas()
    )
    present = set(built["part"].tolist()) if "part" in built.columns else set()
    # empty shards for partitions with no out-edges
    for p in range(num_parts):
        if p not in present:
            t = _shard_table(p, int(off[p]), int(off[p + 1]),
                             np.empty(0, dtype=np.int64),
                             np.empty(0, dtype=np.int64), off,
                             np.empty(0, dtype=np.float64)
                             if weight_col is not None else None)
            path = os.path.join(out_dir, f"shard-{p:05d}.parquet")
            pq.write_table(t, path)
    with open(done, "w") as f:
        json.dump(stamp, f)
    return shard_descriptors(out_dir, offsets)


def shard_descriptors(out_dir: str, offsets: np.ndarray) -> List[Dict]:
    descs = []
    for p in range(len(offsets) - 1):
        path = os.path.join(out_dir, f"shard-{p:05d}.parquet")
        md = pq.read_metadata(path)
        descs.append({"part": p, "path": path, "vid_lo": int(offsets[p]),
                      "vid_hi": int(offsets[p + 1])})
    return descs


_PROCESS_CACHE: Dict[str, Dict] = {}


def load_shard(path: str) -> Dict:
    """Process-global lazy shard loader.

    Ray worker processes persist across tasks, so a module-level cache
    gives actor-style state amortization to map_groups stages (which
    cannot take callable-class actor pools in Ray 2.49): each worker
    reads a given shard file once per process, not once per round."""
    s = _PROCESS_CACHE.get(path)
    if s is None:
        t = pq.read_table(path)
        row = {k: t.column(k)[0] for k in t.column_names}
        s = {
            "vid_lo": row["vid_lo"].as_py(),
            "vid_hi": row["vid_hi"].as_py(),
            "indptr": np.asarray(row["indptr"].values),
            "indices": np.asarray(row["indices"].values),
            "udsts": np.asarray(row["udsts"].values),
            "uinv": np.asarray(row["uinv"].values),
            "udst_part": np.asarray(row["udst_part"].values),
        }
        s["outdeg"] = np.diff(s["indptr"])
        if "weights" in t.column_names:
            w = np.asarray(row["weights"].values, dtype=np.float64)
            s["weights"] = w
            # per-source total out-weight, aligned with the local vid
            # range (the weighted analogue of outdeg; outdeg==0 <=>
            # wout==0 since the build enforces w > 0)
            size = len(s["outdeg"])
            s["wout"] = np.bincount(
                np.repeat(np.arange(size), s["outdeg"]), weights=w,
                minlength=size)
        _PROCESS_CACHE[path] = s
    return s


class ShardCache:
    """Lazy loader of CSR shards keyed by partition (delegates to the
    process-global cache)."""

    def __init__(self, paths: Dict[int, str]) -> None:
        self.paths = paths

    def get(self, p: int) -> Dict:
        return load_shard(self.paths[p])
