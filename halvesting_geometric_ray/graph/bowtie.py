"""Bow-tie decomposition of a directed graph (Broder et al. 2000,
"Graph structure in the Web") on the BFS shard engine.

THE structural census of a web crawl: pick a pivot inside the giant
strongly-connected component, then classify every vertex by directed
reachability —

- ``SCC``      reaches the pivot AND is reached by it (the core);
- ``IN``       reaches the pivot but is not reached (upstream);
- ``OUT``      is reached by the pivot but does not reach it
               (downstream);
- ``TENDRIL``  in the weakly-connected component of the pivot but on
               no directed path through the core (tendrils + tubes);
- ``DISC``     a different weak component entirely.

Exact (set algebra over three BFS fixpoints — no approximation), and
cheap: two directed frontier BFS runs (forward CSR + reversed-edge CSR,
each edge relaxed once, graph/bfs.py) plus one undirected BFS for the
weak component.  The reversed CSR shards are built once under their own
lineage stamp and cached like every other shard set.

Scale shape: the three reach sets are never materialized on the driver —
each BFS output contributes (vid, flag-bit) rows, the vertex universe
contributes flag 0, and one grouped bit-OR-via-sum exchange (flags are
disjoint powers of two, so sum == OR) yields the class per vertex; class
sizes are a second tiny grouped count.  Driver state is O(blocks).

Pivot: caller-supplied vid, or AUTO = max out-degree vertex that also
has in-degree >= 1 (the standard cheap heuristic for landing in the
giant SCC), computed with one grouped aggregate + per-block partial
top-1.  If the pivot's SCC is trivial the labels are still exact (just
not the census Broder intended) — callers wanting the giant core can
pass the top PageRank vid.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..config import DEFAULT, EngineConfig
from .bfs import bfs
from .build import symmetrize

CLASSES = ["SCC", "IN", "OUT", "TENDRIL", "DISC"]


def _swap(edges):
    def swap(b: pa.Table) -> pa.Table:
        return pa.table({"src": b.column("dst"), "dst": b.column("src")})

    return edges.map_batches(swap, batch_format="pyarrow",
                             zero_copy_batch=True)


def _auto_pivot(edges, num_parts: int) -> int:
    """Max out-degree vertex with in-degree >= 1: one grouped
    {outd: sum, has_in: max} exchange, then per-block partial top-1
    candidates reduced on the driver (<= num_blocks rows)."""
    from ..ops.agg import grouped_aggregate

    def tag(b: pa.Table) -> pa.Table:
        src = b.column("src").to_numpy()
        dst = b.column("dst").to_numpy()
        sv, sc = np.unique(src, return_counts=True)
        dv = np.unique(dst)
        return pa.table({
            "vid": pa.array(np.concatenate([sv, dv])),
            "outd": pa.array(np.concatenate([sc, np.zeros(dv.size,
                                                          dtype=np.int64)])),
            "has_in": pa.array(np.concatenate([np.zeros(sv.size,
                                                        dtype=np.int64),
                                               np.ones(dv.size,
                                                       dtype=np.int64)])),
        })

    deg = grouped_aggregate(
        edges.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True),
        ["vid"], {"outd": ("sum", "outd"), "has_in": ("max", "has_in")},
        num_parts=num_parts)

    def top1(b: pa.Table) -> pa.Table:
        vid = b.column("vid").to_numpy()
        outd = b.column("outd").to_numpy()
        ok = b.column("has_in").to_numpy() > 0
        if not ok.any():
            return pa.table({"vid": pa.array([], type=pa.int64()),
                             "outd": pa.array([], type=pa.int64())})
        vid, outd = vid[ok], outd[ok]
        peak = outd.max()
        return pa.table({"vid": pa.array([int(vid[outd == peak].min())]),
                         "outd": pa.array([int(peak)])})

    cand = deg.map_batches(top1, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if len(cand) == 0:
        return 0
    peak = cand.outd.max()
    return int(cand[cand.outd == peak].vid.min())


def bowtie(edges, offsets: np.ndarray, workdir: str,
           cfg: EngineConfig = DEFAULT, *, pivot: Optional[int] = None,
           num_actors: int = 0) -> Tuple["rd.Dataset", Dict]:
    """Classify every vertex of the directed edge table into the Broder
    bow-tie classes relative to ``pivot`` (default: auto heuristic).
    Returns (ds(vid, cls), info) with info["sizes"] per class and
    info["pivot"]; the vertex universe is [0, offsets[-1]) — vids with
    no edges are DISC and present in the output."""
    from ..ops.agg import grouped_aggregate

    N = int(offsets[-1])
    if pivot is None:
        pivot = _auto_pivot(edges, cfg.num_parts)
    if not 0 <= pivot < N:
        raise ValueError(f"pivot out of range [0, {N})")
    src = np.array([pivot], dtype=np.int64)

    fwd_ds, _ = bfs(edges, offsets, workdir, src, cfg,
                    shards_dir=f"{workdir}/csr_fwd", num_actors=num_actors)
    bwd_ds, _ = bfs(_swap(edges), offsets, workdir, src, cfg,
                    shards_dir=f"{workdir}/csr_bwd", num_actors=num_actors)
    weak_ds, _ = bfs(symmetrize(edges, cfg, dedup=False), offsets, workdir,
                     src, cfg, shards_dir=f"{workdir}/csr_weak",
                     num_actors=num_actors)

    def flagged(flag: int):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({
                "vid": b.column("vid"),
                "flag": pa.array(np.full(b.num_rows, flag, dtype=np.int64)),
            })

        return fn

    universe = rd.range(N).map_batches(
        lambda b: pa.table({"vid": b.column("id"),
                            "flag": pa.array(np.zeros(b.num_rows,
                                                      dtype=np.int64))}),
        batch_format="pyarrow", zero_copy_batch=True)
    tagged = (universe
              .union(fwd_ds.map_batches(flagged(1), batch_format="pyarrow",
                                        zero_copy_batch=True))
              .union(bwd_ds.map_batches(flagged(2), batch_format="pyarrow",
                                        zero_copy_batch=True))
              .union(weak_ds.map_batches(flagged(4), batch_format="pyarrow",
                                         zero_copy_batch=True)))
    # flags are disjoint powers of two per source dataset and each BFS
    # emits a vid at most once -> sum == bitwise OR
    merged = grouped_aggregate(tagged, ["vid"], {"flags": ("sum", "flag")},
                               num_parts=cfg.num_parts)

    lut = np.full(8, -1, dtype=np.int8)
    lut[0] = 4                      # no reach, not even weak: DISC
    lut[4] = 3                      # weak only: TENDRIL
    lut[1 | 4] = 2                  # fwd (+weak): OUT
    lut[2 | 4] = 1                  # bwd (+weak): IN
    lut[1 | 2 | 4] = 0              # both: SCC
    names = np.array(CLASSES)

    def classify(b: pa.Table) -> pa.Table:
        f = b.column("flags").to_numpy()
        c = lut[f]
        if (c < 0).any():
            bad = np.unique(f[c < 0])
            raise AssertionError(
                f"impossible flag combos {bad}: directed reach outside "
                "the weak component")
        return pa.table({"vid": b.column("vid"), "cls": pa.array(names[c])})

    out = merged.map_batches(classify, batch_format="pyarrow",
                             zero_copy_batch=True)

    # class sizes: per-block partial bincount -> <= num_blocks tiny
    # tables summed on the driver (no second shuffle; note this executes
    # the pipeline once for the census — callers wanting the labels too
    # should consume/write `out`, whose blocks re-derive from the
    # already-materialized BFS tables)
    def part_sizes(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vc = b.column("cls").value_counts()
        return pa.table({"cls": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    sizes_pdf = out.map_batches(part_sizes, batch_format="pyarrow",
                                zero_copy_batch=True).to_pandas()
    sizes = {c: 0 for c in CLASSES}
    for r in sizes_pdf.groupby("cls")["n"].sum().items():
        sizes[r[0]] = int(r[1])
    info = {"pivot": int(pivot), "sizes": sizes, "n": N}
    return out, info


def giant_scc_pivot(edges, offsets: np.ndarray, workdir: str,
                    cfg: EngineConfig = DEFAULT) -> int:
    """EXACT pivot for the census: the min-vid member of the LARGEST
    strongly connected component (graph/scc.py), replacing the
    max-out-degree heuristic when the extra SCC pass is affordable.
    One grouped size count + per-block partial top-1 — the labels
    never land on the driver."""
    from ..ops.agg import grouped_aggregate
    from .scc import strongly_connected_components

    labels, _ = strongly_connected_components(edges, offsets, workdir, cfg)
    sizes = grouped_aggregate(labels.select_columns(["scc"]), ["scc"],
                              {"n": ("count", None)},
                              num_parts=cfg.num_parts)

    def top1(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"scc": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        s = b.column("scc").to_numpy()
        n = b.column("n").to_numpy()
        peak = n.max()
        sel = n == peak
        return pa.table({"scc": pa.array([int(s[sel].min())]),
                         "n": pa.array([int(peak)])})

    cand = sizes.map_batches(top1, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    peak = cand.n.max()
    label = int(cand.loc[cand.n == peak, "scc"].min())
    # min vid of the winning SCC: per-block partial min over members
    def minmem(b: pa.Table) -> pa.Table:
        s = b.column("scc").to_numpy()
        v = b.column("vid").to_numpy()
        m = s == label
        if not m.any():
            return pa.table({"vid": pa.array([], type=pa.int64())})
        return pa.table({"vid": pa.array([int(v[m].min())])})

    mm = labels.map_batches(minmem, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
    return int(mm.vid.min())
