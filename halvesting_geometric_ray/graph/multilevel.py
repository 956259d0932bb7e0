"""Multilevel balanced graph partitioning — match, contract, LDG,
project back.

The METIS recipe (Karypis & Kumar 1998) recomposed from the engine's
own primitives: ``levels`` rounds of maximal matching
(graph/matching.py) + pair contraction (graph/coarsen.py) shrink the
graph ~2x per level; the coarsest graph is partitioned by the
streaming LDG partitioner (graph/partition.py) running in WEIGHTED
mode — a supervertex weighs the number of fine vertices it contains,
so the (1+eps) balance guarantee holds at the FINE level, not just on
supervertex counts; the assignment then projects back down through
the per-level mappings and a gain-based move refinement
(partition.py::refine_partition, the KL/FM-lite uncoarsening pass)
polishes the fine-level boundary under the same (1+eps) cap, guarded
by a measured-cut comparison so refinement can never make the
assignment worse than the raw projection.

Why it helps: LDG scores a vertex by already-placed neighbors, so on
the fine graph early vertices are placed nearly blind.  Contraction
concentrates connectivity — a coarse vertex's neighborhood summarizes
whole fine clusters — which is the standard way to cut the edge-cut
further at the same balance (measured on the sf0.1 link graph in
BASELINE.md).

Determinism: every stage is deterministic in (edge set, seed,
hyperparameters); the coarse id space comes from
assign_dense_ids_hash, so ``levels``, ``seed`` and the per-level part
count are HYPERPARAMETERS of the assignment (the SGNS-shard-count
convention), while the actor layout is not.

Scale shape: each level is one matching (CSR rounds), one contraction
(grouped sum), one dense re-id (grouped rank exchange) and three
bucketed joins; the driver holds only the k-vector of block sizes and
per-level scalar stats.
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..config import DEFAULT, EngineConfig
from ..ops.agg import grouped_aggregate
from ..ops.ids import assign_dense_ids_hash
from ..ops.join import hash_join
from .coarsen import coarsen_by_matching
from .matching import maximal_matching
from .partition import ldg_partition, partition_cut, refine_partition

_I64 = pa.int64()


def multilevel_partition(sym_edges, offsets: np.ndarray, workdir: str,
                         cfg: EngineConfig = DEFAULT, *, k: int = 8,
                         eps: float = 0.1, chunk: int = 4096,
                         levels: int = 1, seed: int = 42,
                         num_actors: int = 0, refine_sweeps: int = 3
                         ) -> Tuple["rd.Dataset", Dict]:
    """Multilevel LDG over a SYMMETRIZED self-loop-free edge table.
    Returns (ds(vid, block) in the FINE id space, info) with
    info = {levels: [...], ldg: {...}, refine: {...}, k, cap}.
    levels=0 degrades to plain (unweighted) ldg_partition;
    refine_sweeps=0 skips the uncoarsening refinement (the raw
    projected V-cycle)."""
    off = np.asarray(offsets, dtype=np.int64)
    num_parts = len(off) - 1
    t0 = time.time()
    info: Dict = {"k": k, "levels": []}

    fine_edges = sym_edges.select_columns(["src", "dst"])
    cur_edges = fine_edges
    cur_off = off
    cur_w: Optional["rd.Dataset"] = None  # None = all-ones (fine level)
    mappings = []  # per level: (vid_fine_of_level, cid) Dataset

    # level-0 fine sym CSR is shared with the refinement pass below
    fine_shards = f"{workdir}/csr_sym"
    for L in range(levels):
        wd = f"{workdir}/ml_l{L}"
        mt, mi = maximal_matching(cur_edges.select_columns(["src", "dst"]),
                                  cur_off, wd, cfg,
                                  seed=seed + L, num_actors=num_actors,
                                  shards_dir=fine_shards if L == 0
                                  else None)
        coarse_raw, mapping, ci = coarsen_by_matching(
            cur_edges, mt, cfg,
            weight_col="w" if "w" in cur_edges.columns() else None)
        # dense coarse id space (hash mode: deterministic in the super
        # id SET; part count = the level's own — a hyperparameter)
        ids, off2 = assign_dense_ids_hash(
            mapping.select_columns(["super"]), "super",
            max(1, num_parts))
        ids = ids.map_batches(
            lambda b: pa.table({"cid": b.column("vid"),
                                "super": b.column("super")}),
            batch_format="pyarrow", zero_copy_batch=True).materialize()
        m_schema = pa.schema([("vid", _I64), ("super", _I64)])
        i_schema = pa.schema([("cid", _I64), ("super", _I64)])
        map_l = hash_join(mapping, ids, on="super", right_on="super",
                          right_cols=["cid"], num_parts=num_parts,
                          left_schema=m_schema, right_schema=i_schema
                          ).select_columns(["vid", "cid"]).materialize()
        mappings.append(map_l)

        # coarse edges into the dense space; self-loops dropped (their
        # mass is internal to a supervertex — irrelevant to the cut)
        ce_schema = pa.schema([("src", _I64), ("dst", _I64),
                               ("w", pa.float64())])
        e2 = hash_join(coarse_raw, ids, on="src", right_on="super",
                       right_cols=["cid"], num_parts=num_parts,
                       left_schema=ce_schema, right_schema=i_schema)
        e2 = e2.map_batches(
            lambda b: pa.table({"src": b.column("cid"),
                                "dst": b.column("dst"),
                                "w": b.column("w")}),
            batch_format="pyarrow", zero_copy_batch=True)
        e2 = hash_join(e2, ids, on="dst", right_on="super",
                       right_cols=["cid"], num_parts=num_parts,
                       left_schema=ce_schema, right_schema=i_schema)
        def _drop_self(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            t = pa.table({"src": b.column("src"),
                          "dst": b.column("cid"),
                          "w": b.column("w")})
            return t.filter(pc.invert(pc.equal(t.column("src"),
                                               t.column("dst"))))

        e2 = e2.map_batches(_drop_self, batch_format="pyarrow",
                            zero_copy_batch=True)

        # coarse vertex weights = fine vertices per supervertex
        if cur_w is None:
            w2 = grouped_aggregate(
                map_l.map_batches(
                    lambda b: pa.table({"vid": b.column("cid")}),
                    batch_format="pyarrow", zero_copy_batch=True),
                ["vid"], {"w": ("count", None)}, num_parts=num_parts)
        else:
            w_schema = pa.schema([("vid", _I64), ("w", _I64)])
            ml_schema = pa.schema([("vid", _I64), ("cid", _I64)])
            jw = hash_join(cur_w, map_l, on="vid", right_on="vid",
                           right_cols=["cid"], num_parts=num_parts,
                           left_schema=w_schema, right_schema=ml_schema)
            w2 = grouped_aggregate(
                jw.map_batches(
                    lambda b: pa.table({"vid": b.column("cid"),
                                        "w": b.column("w")}),
                    batch_format="pyarrow", zero_copy_batch=True),
                ["vid"], {"w": ("sum", "w")}, num_parts=num_parts)
        info["levels"].append({
            "level": L, "n_fine": ci["n_fine"],
            "n_coarse": ci["n_coarse"],
            "matched_pairs": ci["n_matched_pairs"],
            "matching_rounds": mi["num_rounds"]})
        cur_edges = e2.materialize()
        cur_off = off2
        cur_w = w2.materialize()

    blocks, li = ldg_partition(
        cur_edges.select_columns(["src", "dst"]), cur_off,
        f"{workdir}/ml_top", cfg, k=k, eps=eps, chunk=chunk,
        num_actors=num_actors, vertex_weights=cur_w)
    info["ldg"] = {kk: li[kk] for kk in
                   ("k", "cap", "sizes", "W", "overflow", "n_chunks")}
    info["cap"] = li["cap"]

    # project the coarse assignment back to the fine id space
    b_schema = pa.schema([("vid", _I64), ("block", pa.int32())])
    ml_schema = pa.schema([("vid", _I64), ("cid", _I64)])
    for map_l in reversed(mappings):
        blocks = hash_join(map_l, blocks, on="cid", right_on="vid",
                           right_cols=["block"],
                           num_parts=num_parts,
                           left_schema=ml_schema,
                           right_schema=pa.schema(
                               [("vid", _I64), ("block", pa.int32())]))
        blocks = blocks.select_columns(["vid", "block"])

    # uncoarsening refinement at the fine level (gain-based moves
    # under the same fine cap) — the half of the V-cycle projection
    # alone lacks; a sweep that increases the measured cut is
    # discarded (the guard costs two linear passes over the edges)
    if refine_sweeps and mappings:
        blocks = blocks.materialize()
        cut0 = partition_cut(fine_edges, blocks, num_parts=num_parts)
        refined, ri = refine_partition(
            fine_edges, off, blocks, f"{workdir}/ml_refine", cfg,
            k=k, eps=eps, chunk=chunk, sweeps=refine_sweeps,
            num_actors=num_actors,
            shards_dir=fine_shards if levels > 0 else None)
        refined = refined.materialize()
        cut1 = partition_cut(fine_edges, refined, num_parts=num_parts)
        ri["cut_before"] = cut0["cut_fraction"]
        ri["cut_after"] = cut1["cut_fraction"]
        ri["kept"] = cut1["cut_fraction"] <= cut0["cut_fraction"]
        info["refine"] = ri
        if ri["kept"]:
            blocks = refined
    info["wall_sec"] = round(time.time() - t0, 4)
    return blocks, info
