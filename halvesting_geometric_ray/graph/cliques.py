"""Exact 4-clique counting: orientation DAG -> triangle close -> apex join.

Extends the triangle pipeline (graph/triangles.py) one motif deeper —
the next clique statistic after q_triangles_urls for dense-community /
spam-farm detection on link graphs (the reference stops at the node/
edge-count conformance of its citation graph,
halvesting_geometric/utils/data/link_prediction_dataset.py:50-75; clique
motifs are engine-added analytics).

Counting scheme: rank vertices by (degree, vid) and orient every edge
low -> high (graph/triangles.py::orient).  In the orientation DAG each
4-clique {p<q<r<s} (rank order) is found EXACTLY once as its unique
bottom triangle (p, q, r) plus its top-ranked apex s, where s is an
out-neighbor of all three corners.  So:

1. triangles (u, a, b) from the certified wedge semi-join
   (ranks u < a < b);
2. apex candidates: join triangles with oriented edges on b = src —
   the TOP-ranked corner, whose out-list is shortest under degree
   orientation (out-degree is O(sqrt E) amortized for every vertex,
   the same skew bound that makes wedges tractable);
3. two semi-joins keep candidates x also in N+(u) and N+(a); each
   survivor (u, a, b, x) is one distinct 4-clique.

Counts are exact and partitioning-independent; per-vertex counts are
the union of the four corner projections.  All exchanges are bucketed
hash_joins — no stage materializes more than the candidate stream,
whose volume is sum over triangles of outdeg(top corner).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..config import DEFAULT, EngineConfig
from ..ops.join import hash_join
from .triangles import _wedges, canonical_undirected, orient

_I64 = pa.int64()


def cliques4_canonical(und, cfg: EngineConfig = DEFAULT
                       ) -> Tuple["rd.Dataset", int]:
    """Core: canonical undirected table (src<dst, each edge once) ->
    (per_vertex_ds(vid, cliques4), global count).  Vertices in no
    4-clique are absent (count 0)."""
    und = und.materialize()
    oriented = orient(und, cfg).materialize()
    o = oriented.select_columns(["src", "dst"]).materialize()
    w = _wedges(oriented, cfg)
    w_schema = pa.schema([("a", _I64), ("b", _I64), ("u", _I64)])
    o_schema = pa.schema([("src", _I64), ("dst", _I64)])
    tri = hash_join(w, o, on=["a", "b"], right_on=["src", "dst"],
                    join_type="semi", num_parts=cfg.num_parts,
                    left_schema=w_schema, right_schema=o_schema)
    # apex candidates x in N+(b): the top-ranked corner's out-list
    cand = hash_join(tri, o, on="b", right_on="src", right_cols=["dst"],
                     num_parts=cfg.num_parts, left_schema=w_schema,
                     right_schema=o_schema)

    def rename_x(b: pa.Table) -> pa.Table:
        cols = {n: b.column(n) for n in ("a", "b", "u")}
        cols["x"] = b.column("dst")
        return pa.table(cols)

    cand = cand.map_batches(rename_x, batch_format="pyarrow",
                            zero_copy_batch=True)
    c_schema = pa.schema([("a", _I64), ("b", _I64), ("u", _I64),
                          ("x", _I64)])
    s1 = hash_join(cand, o, on=["u", "x"], right_on=["src", "dst"],
                   join_type="semi", num_parts=cfg.num_parts,
                   left_schema=c_schema, right_schema=o_schema)
    quads = hash_join(s1, o, on=["a", "x"], right_on=["src", "dst"],
                      join_type="semi", num_parts=cfg.num_parts,
                      left_schema=c_schema, right_schema=o_schema)
    quads = quads.materialize()
    total = quads.count()

    def corners(b: pa.Table) -> pa.Table:
        vid = np.concatenate([b.column(c).to_numpy()
                              for c in ("u", "a", "b", "x")])
        return pa.table({"vid": pa.array(vid, type=_I64)})

    from ..ops.agg import grouped_aggregate

    per_vertex = grouped_aggregate(
        quads.map_batches(corners, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["vid"], {"cliques4": ("count", None)})
    return per_vertex, int(total)


def cliques4_edges(edges, cfg: EngineConfig = DEFAULT
                   ) -> Tuple["rd.Dataset", int]:
    """4-clique counts straight from a DIRECTED edge table: self-loops
    dropped, (min, max)-canonicalized, distinct at E volume."""
    return cliques4_canonical(canonical_undirected(edges, cfg), cfg)
