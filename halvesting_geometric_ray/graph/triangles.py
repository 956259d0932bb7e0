"""Exact triangle counting: degree orientation -> wedge join -> semi close.

One-shot Dataset pipeline (no iteration), SURVEY.md section 2.8:

1. canonicalize to (min, max) pairs + self-loop drop + distinct at E
   volume (triangles_edges; the sym-input entrypoint filters src<dst) —
   no 2E symmetrize shuffle;
2. undirected degrees by exploding both endpoints; each canonical edge
   is then SWAPPED to point from the lower (degree, vid) rank.
   Orientation bounds every vertex's oriented out-degree by O(sqrt(E))
   amortized, which is the skew guard that makes wedge generation
   tractable on power-law graphs;
3. wedges per source: all rank-ordered pairs of oriented neighbors,
   generated per hash-partition of sources (vectorized pair expansion);
4. semi-join wedges against the oriented edge set on (a, b): a surviving
   wedge (a, b) centered at u is exactly one triangle {u, a, b},
   counted once;
5. per-vertex counts = union of the three corner projections ->
   groupby-count; global count = number of surviving wedges.

Every triangle is found exactly once, so counts are exact and
partitioning-independent (matching the brute-force oracle).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..config import DEFAULT, EngineConfig
from ..functions.hashing import stable_hash64
from ..ops.join import hash_join


def _degrees_canonical(und):
    """Undirected degree from the canonical (src<dst, each edge once)
    table: explode both endpoints, count."""
    from ..ops.agg import grouped_aggregate

    def both(b: pa.Table) -> pa.Table:
        vid = np.concatenate([b.column("src").to_numpy(),
                              b.column("dst").to_numpy()])
        return pa.table({"vid": pa.array(vid, type=pa.int64())})

    return grouped_aggregate(
        und.map_batches(both, batch_format="pyarrow", zero_copy_batch=True),
        ["vid"], {"deg": ("count", None)})


def orient(und, cfg: EngineConfig = DEFAULT):
    """canonical und (src<dst, each undirected edge ONCE) -> oriented
    (src, dst, deg_dst) pointing from the lower (degree, vid) rank.

    Working on the canonical table halves the degree-attach join volume
    vs the symmetrized 2E form, and orientation becomes a swap instead
    of a half-discarding filter."""
    deg = _degrees_canonical(und)
    edge_schema = pa.schema([pa.field("src", pa.int64()),
                             pa.field("dst", pa.int64())])
    deg_schema = pa.schema([pa.field("vid", pa.int64()),
                            pa.field("deg", pa.int64())])
    j = hash_join(und, deg, on="src", right_on="vid", num_parts=cfg.num_parts,
                  right_cols=["deg"], left_schema=edge_schema,
                  right_schema=deg_schema)
    j = j.map_batches(lambda b: b.rename_columns(["src", "dst", "deg_src"]),
                      batch_format="pyarrow", zero_copy_batch=True)
    j1_schema = pa.schema([pa.field("src", pa.int64()),
                           pa.field("dst", pa.int64()),
                           pa.field("deg_src", pa.int64())])
    j = hash_join(j, deg, on="dst", right_on="vid", num_parts=cfg.num_parts,
                  right_cols=["deg"], left_schema=j1_schema,
                  right_schema=deg_schema)
    j = j.map_batches(lambda b: b.rename_columns(["dst", "src", "deg_src", "deg_dst"]),
                      batch_format="pyarrow", zero_copy_batch=True)

    def swap_forward(b: pa.Table) -> pa.Table:
        s, d = b.column("src").to_numpy(), b.column("dst").to_numpy()
        ds_, dd = b.column("deg_src").to_numpy(), b.column("deg_dst").to_numpy()
        m = (ds_ < dd) | ((ds_ == dd) & (s < d))
        return pa.table({
            "src": pa.array(np.where(m, s, d)),
            "dst": pa.array(np.where(m, d, s)),
            "deg_dst": pa.array(np.where(m, dd, ds_)),
        })

    return j.map_batches(swap_forward, batch_format="pyarrow",
                         zero_copy_batch=True)


def _wedges(oriented, cfg: EngineConfig):
    def bucket(b: pa.Table) -> pa.Table:
        h = stable_hash64(b.column("src")) % cfg.num_parts
        return b.append_column("__b", pa.array(h, type=pa.int32()))

    def gen(g: pa.Table) -> pa.Table:
        import numpy as np

        src = g.column("src").to_numpy()
        dst = g.column("dst").to_numpy()
        degd = g.column("deg_dst").to_numpy()
        # per-src neighbor lists ordered by rank (deg, vid)
        order = np.lexsort((dst, degd, src))
        src, dst = src[order], dst[order]
        bounds = np.flatnonzero(np.r_[True, src[1:] != src[:-1], True])
        starts, ends = bounds[:-1], bounds[1:]
        counts = ends - starts
        outs_a, outs_b, outs_u = [], [], []
        # vectorize per distinct neighbor-count: all srcs with k neighbors
        # form an (m, k) matrix -> one triu expansion per k, not per src
        for k in np.unique(counts):
            if k < 2:
                continue
            sel = counts == k
            mat = dst[starts[sel][:, None] + np.arange(k)[None, :]]
            ii, jj = np.triu_indices(int(k), 1)
            outs_a.append(mat[:, ii].ravel())
            outs_b.append(mat[:, jj].ravel())
            outs_u.append(np.repeat(src[starts[sel]], len(ii)))
        if not outs_a:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64()),
                             "u": pa.array([], type=pa.int64())})
        return pa.table({"a": pa.array(np.concatenate(outs_a)),
                         "b": pa.array(np.concatenate(outs_b)),
                         "u": pa.array(np.concatenate(outs_u))})

    from ..ops._util import pre_shuffle

    return (pre_shuffle(oriented.map_batches(bucket, batch_format="pyarrow",
                                             zero_copy_batch=True))
            .groupby("__b").map_groups(gen, batch_format="pyarrow",
                                       retry_exceptions=True))


def triangles(sym_simple, cfg: EngineConfig = DEFAULT) -> Tuple["rd.Dataset", int]:
    """Input: symmetrized SELF-LOOP-FREE edge table (graph.build.symmetrize
    with drop_self_loops=True).  Returns (per_vertex_ds(vid, triangles),
    global_count) — vertices in no triangle are absent (count 0)."""

    def canon(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.less(b["src"], b["dst"]))

    return triangles_canonical(
        sym_simple.map_batches(canon, batch_format="pyarrow",
                               zero_copy_batch=True), cfg)


def canonical_undirected(edges, cfg: EngineConfig = DEFAULT):
    """DIRECTED edge table -> canonical undirected simple graph:
    self-loops dropped, (min, max) pairs, each undirected edge exactly
    once (distinct at E volume — no 2E symmetrize shuffle)."""
    from ..ops.dedup import distinct

    def canon(b: pa.Table) -> pa.Table:
        s, d = b.column("src").to_numpy(), b.column("dst").to_numpy()
        m = s != d
        s, d = s[m], d[m]
        return pa.table({"src": pa.array(np.minimum(s, d)),
                         "dst": pa.array(np.maximum(s, d))})

    return distinct(edges.map_batches(canon, batch_format="pyarrow",
                                      zero_copy_batch=True),
                    ["src", "dst"], num_parts=cfg.num_parts)


def triangles_edges(edges, cfg: EngineConfig = DEFAULT) -> Tuple["rd.Dataset", int]:
    """Triangle count straight from the DIRECTED deduped edge table —
    canonicalizes (min, max) pairs + distinct at E volume, skipping the
    2E symmetrize shuffle entirely."""
    return triangles_canonical(canonical_undirected(edges, cfg), cfg)


def triangles_canonical(und, cfg: EngineConfig = DEFAULT) -> Tuple["rd.Dataset", int]:
    """Core: canonical undirected table (src<dst, each edge once)."""
    # und feeds both the degree aggregate and the orientation join left
    # side — materialize once or the upstream runs twice
    und = und.materialize()
    oriented = orient(und, cfg).materialize()
    o = oriented.select_columns(["src", "dst"])
    w = _wedges(oriented, cfg)
    w_schema = pa.schema([pa.field("a", pa.int64()), pa.field("b", pa.int64()),
                          pa.field("u", pa.int64())])
    o_schema = pa.schema([pa.field("src", pa.int64()),
                          pa.field("dst", pa.int64())])
    tri = hash_join(w, o, on=["a", "b"], right_on=["src", "dst"],
                    join_type="semi", num_parts=cfg.num_parts,
                    left_schema=w_schema, right_schema=o_schema)
    tri = tri.materialize()
    total = tri.count()

    def corners(b: pa.Table) -> pa.Table:
        vid = np.concatenate([b.column("a").to_numpy(),
                              b.column("b").to_numpy(),
                              b.column("u").to_numpy()])
        return pa.table({"vid": pa.array(vid, type=pa.int64())})

    from ..ops.agg import grouped_aggregate

    per_vertex = grouped_aggregate(
        tri.map_batches(corners, batch_format="pyarrow", zero_copy_batch=True),
        ["vid"], {"triangles": ("count", None)})
    return per_vertex, int(total)
