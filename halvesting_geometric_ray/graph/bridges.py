"""Bridges and 2-edge-connected components of the undirected link
graph — the cut-edge census: a bridge is an edge whose removal
disconnects its component (the single points of failure of a crawl
frontier / host backbone).

Algorithm (the parallel XOR-tag formulation of the spanning-tree
coverage test — Tarjan's low-link is inherently sequential):

1. BFS spanning forest from every component root (min-vid labels from
   the certified CC pass feed the multi-source BFS); parent(v) = the
   min-vid neighbor one hop closer to the root.
2. Every NON-tree edge {u, v} gets a 63-bit stable tag; each tree edge
   (c, parent(c)) is covered by exactly the non-tree edges with ONE
   endpoint in subtree(c).  XOR kills both-endpoints-inside pairs, so
   subtree_xor(c) = XOR of endpoint-tags over subtree(c) equals the
   XOR of covering non-tree edges — ZERO iff no non-tree edge covers
   the tree edge, i.e. iff (c, parent(c)) is a bridge (exact up to a
   2^-63-per-edge tag-collision probability, the standard w.h.p.
   guarantee of sketch-based graph algorithms; non-tree edges are
   NEVER bridges).
3. subtree_xor by a depth-descending sweep: vertices at BFS depth d
   XOR-push their accumulator into their parent (depth d-1) — one
   grouped XOR-merge exchange per BFS level, ``max_depth`` rounds
   total (web-graph BFS depths are tens, not thousands).
4. 2ECC labels = connected components after deleting the bridges.

Scale shape: two certified CC runs + one multi-source BFS (all reuse
the CSR shard engine) + one parent join + max_depth grouped merges.
The root set (O(#components) — billions of singletons on a real
crawl) never lands on the driver: it stays a Dataset and seeds the
BFS via the sources_ds block-split path (graph/bfs.py).

Reference anchor: the reference's graph diagnostics stop at component
counts (link_prediction_dataset.py:50-75); bridges/2ECC are the next
structural refinement of exactly that census.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT, EngineConfig
from ..functions.hashing import stable_hash64, stable_hash_pair64
from ..ops._util import pre_shuffle
from ..ops.join import hash_join
from .build import symmetrize
from .triangles import canonical_undirected


def _grouped_merge(ds, num_parts: int):
    """By-vid merge: acc -> XOR, parent -> max, dist -> max.  Two-level
    (per-batch partial, then per-part final) like grouped_aggregate."""
    import polars as pl

    def level(b: pa.Table, add_part: bool) -> pa.Table:
        vid = b.column("vid").to_numpy()
        if len(vid) == 0:  # reduceat rejects empty inputs
            out = b.select(["vid", "parent", "dist", "acc"])
            if add_part:
                out = out.append_column("__p", pa.array(
                    np.array([], dtype=np.int32)))
            return out
        order = np.argsort(vid, kind="stable")
        vid_s = vid[order]
        bounds = np.flatnonzero(np.r_[True, vid_s[1:] != vid_s[:-1]])
        acc = b.column("acc").to_numpy()[order]
        par = b.column("parent").to_numpy()[order]
        dst = b.column("dist").to_numpy()[order]
        x = np.bitwise_xor.reduceat(acc, bounds)
        p = np.maximum.reduceat(par, bounds)
        d = np.maximum.reduceat(dst, bounds)
        out = pa.table({"vid": pa.array(vid_s[bounds]),
                        "parent": pa.array(p),
                        "dist": pa.array(d),
                        "acc": pa.array(x)})
        if add_part:
            h = (stable_hash64(out.column("vid")) % num_parts).astype(
                np.int32)
            out = out.append_column("__p", pa.array(h))
        return out

    partial = ds.map_batches(lambda b: level(b, True),
                             batch_format="pyarrow",
                             zero_copy_batch=True)
    return (pre_shuffle(partial).groupby("__p")
            .map_groups(lambda g: level(g.drop_columns(["__p"]), False),
                        batch_format="pyarrow", retry_exceptions=True))


def bridges(edges, offsets: np.ndarray, workdir: str,
            cfg: EngineConfig = DEFAULT, *,
            seed: int = 17) -> Tuple["object", "object", Dict]:
    """Returns (bridges_ds(u, v), labels2ecc_ds(vid, label), info):
    bridges with u < v; labels2ecc = min-vid label of each vertex's
    2-edge-connected component (bridge-free CC)."""
    import ray.data as rd

    from .bfs import bfs
    from .components import connected_components

    und = canonical_undirected(edges, cfg).materialize()
    sym = symmetrize(und, dedup=False).materialize()

    labels, _ = connected_components(sym, offsets, workdir,
                                     job="cc_bridges")
    # component roots = {v : label(v) == v} (labels are min-vid
    # canonical, so the root vertex always exists).  The root SET is
    # O(#components) — billions on a real crawl — so it never lands on
    # the driver: the filtered Dataset seeds the multi-source BFS
    # block-by-block (bfs sources_ds path splits each seed block into
    # per-actor round-0 messages inside Ray tasks).
    roots_ds = labels.map_batches(
        lambda b: pa.table({"vid": b.filter(
            pc.equal(b["vid"], b["label"])).column("vid")}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    n_roots = int(roots_ds.count())
    dist, _ = bfs(sym, offsets, workdir, sources_ds=roots_ds)
    dist = dist.select_columns(["vid", "dist"]).materialize()

    # parent(v) = min neighbor u with dist(u) = dist(v) - 1
    d_schema = pa.schema([pa.field("vid", pa.int64()),
                          pa.field("dist", pa.int64())])
    e_schema = pa.schema([pa.field("x", pa.int64()),
                          pa.field("y", pa.int64())])
    dirs = sym.map_batches(
        lambda b: pa.table({"x": b.column("src"), "y": b.column("dst")}),
        batch_format="pyarrow", zero_copy_batch=True)
    j1 = hash_join(dirs, dist, on="x", right_on="vid",
                   right_cols=["dist"], num_parts=cfg.num_parts,
                   left_schema=e_schema, right_schema=d_schema)
    j1 = j1.map_batches(lambda b: b.rename_columns(["x", "y", "dx"]),
                        batch_format="pyarrow", zero_copy_batch=True)
    j1_schema = pa.schema([pa.field("x", pa.int64()),
                           pa.field("y", pa.int64()),
                           pa.field("dx", pa.int64())])
    j2 = hash_join(j1, dist, on="y", right_on="vid",
                   right_cols=["dist"], num_parts=cfg.num_parts,
                   left_schema=j1_schema, right_schema=d_schema)
    j2 = j2.map_batches(
        lambda b: b.rename_columns(["y", "x", "dx", "dy"]),
        batch_format="pyarrow", zero_copy_batch=True)

    from ..ops.agg import grouped_aggregate

    cand = j2.map_batches(
        lambda b: b.filter(pc.equal(b["dy"],
                                    pc.add(b["dx"], pa.scalar(-1))))
        .select(["x", "y"]),
        batch_format="pyarrow", zero_copy_batch=True)
    parents = grouped_aggregate(cand, ["x"], {"parent": ("min", "y")},
                                num_parts=cfg.num_parts).materialize()

    # non-tree edges: canonical und minus canonical tree pairs
    tree_canon = parents.map_batches(
        lambda b: pa.table({
            "src": pa.array(np.minimum(b.column("x").to_numpy(),
                                       b.column("parent").to_numpy())),
            "dst": pa.array(np.maximum(b.column("x").to_numpy(),
                                       b.column("parent").to_numpy()))}),
        batch_format="pyarrow", zero_copy_batch=True)
    ee_schema = pa.schema([pa.field("src", pa.int64()),
                           pa.field("dst", pa.int64())])
    nontree = hash_join(und, tree_canon, on=["src", "dst"],
                        join_type="anti", num_parts=cfg.num_parts,
                        left_schema=ee_schema, right_schema=ee_schema)

    # state rows: dist rows + parent rows + endpoint-tag rows
    def tag_rows(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy()
        d = b.column("dst").to_numpy()
        t = stable_hash_pair64(s, d, seed=seed)
        t = t | 1  # never zero
        return pa.table({
            "vid": pa.array(np.concatenate([s, d])),
            "parent": pa.array(np.full(2 * len(s), -2, dtype=np.int64)),
            "dist": pa.array(np.full(2 * len(s), -1, dtype=np.int64)),
            "acc": pa.array(np.concatenate([t, t]))})

    tag_ds = nontree.map_batches(tag_rows, batch_format="pyarrow",
                                 zero_copy_batch=True)
    dist_rows = dist.map_batches(
        lambda b: pa.table({"vid": b.column("vid"),
                            "parent": pa.array(np.full(b.num_rows, -2,
                                                       dtype=np.int64)),
                            "dist": b.column("dist"),
                            "acc": pa.array(np.zeros(b.num_rows,
                                                     dtype=np.int64))}),
        batch_format="pyarrow", zero_copy_batch=True)
    parent_rows = parents.map_batches(
        lambda b: pa.table({"vid": b.column("x"),
                            "parent": b.column("parent"),
                            "dist": pa.array(np.full(b.num_rows, -1,
                                                     dtype=np.int64)),
                            "acc": pa.array(np.zeros(b.num_rows,
                                                     dtype=np.int64))}),
        batch_format="pyarrow", zero_copy_batch=True)
    state = _grouped_merge(
        dist_rows.union(parent_rows).union(tag_ds),
        cfg.num_parts).materialize()

    max_depth = int(state.max("dist") or 0)
    info: Dict = {"max_depth": max_depth, "n_roots": n_roots}

    for d in range(max_depth, 0, -1):
        push = state.map_batches(
            lambda b, dd=d: (lambda t: pa.table({
                "vid": t.column("parent"),
                "parent": pa.array(np.full(t.num_rows, -2,
                                           dtype=np.int64)),
                "dist": pa.array(np.full(t.num_rows, -1,
                                         dtype=np.int64)),
                "acc": t.column("acc")}))(
                b.filter(pc.and_(
                    pc.equal(b["dist"], pa.scalar(dd)),
                    pc.greater_equal(b["parent"], pa.scalar(0))))),
            batch_format="pyarrow", zero_copy_batch=True)
        state = _grouped_merge(state.union(push),
                               cfg.num_parts).materialize()

    bridge_ds = state.map_batches(
        lambda b: (lambda t: pa.table({
            "u": pa.array(np.minimum(t.column("vid").to_numpy(),
                                     t.column("parent").to_numpy())),
            "v": pa.array(np.maximum(t.column("vid").to_numpy(),
                                     t.column("parent").to_numpy()))}))(
            b.filter(pc.and_(pc.greater_equal(b["parent"],
                                              pa.scalar(0)),
                             pc.equal(b["acc"], pa.scalar(0))))),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    info["n_bridges"] = int(bridge_ds.count())

    # 2ECC = CC after deleting bridges
    b_schema = pa.schema([pa.field("u", pa.int64()),
                          pa.field("v", pa.int64())])
    kept = hash_join(und, bridge_ds, on=["src", "dst"],
                     right_on=["u", "v"], join_type="anti",
                     num_parts=cfg.num_parts, left_schema=ee_schema,
                     right_schema=b_schema)
    # own shards dir: the default {workdir}/csr_sym is the FULL graph's
    # lineage-cached shards — the bridge-free subgraph must not reuse it
    labels2, _ = connected_components(symmetrize(kept, dedup=False),
                                      offsets, workdir, job="cc_2ecc",
                                      shards_dir=f"{workdir}/csr_2ecc")
    return bridge_ds, labels2.select_columns(["vid", "label"]), info
