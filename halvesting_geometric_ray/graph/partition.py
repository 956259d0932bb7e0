"""Streaming balanced graph partitioning — batch-synchronous LDG.

Linear Deterministic Greedy (Stanton & Kliot, KDD 2012; the Fennel
family, Tsourakakis et al. WSDM 2014) is THE practical one-pass web
partitioner: stream vertices, place each on the block holding most of
its already-placed neighbors, damped by a balance penalty.  The output
feeds everything downstream that says "pick ONE partitioning key and
reuse it": a low-cut balanced block assignment cuts every iterative
round's exchange volume (PageRank/CC/Louvain messages cross blocks)
on a multi-node cluster.

Batch-synchronous spec (exactly what the oracle replays):

- vertices are processed in DENSE-VID ORDER in chunks of ``chunk``
  (CSR partitions in order, each partition's local vids chunked);
- a chunk is scored against a FROZEN snapshot: block assignments of
  strictly-earlier chunks and block sizes at chunk start;
- score_i(u) = n_i(u) * (1 - size_i / cap) with n_i(u) = u's
  already-assigned neighbors on block i, cap = ceil((1+eps) * N / k);
- assignment resolves by priority waterfilling: every vertex claims
  its best block (ties: smaller frozen size, then lower block id);
  an over-cap block keeps its claimants with the highest
  (score, lower vid) priority and spills the rest to their next
  choice — at most k passes, each permanently filling a block.  The
  hard cap ``size_i <= cap`` can therefore never be violated.

The sequence of (chunk, frozen state) pairs is fully determined by
(offsets, chunk, k, eps), so the assignment is bitwise deterministic
and independent of the actor layout — only WHERE the arithmetic runs
changes with num_actors (pinned in tests/test_partition.py).

Scale shape: assignment state is sharded across the same actors that
hold the CSR shards (block_of int32 per owned vertex — the "shared
mutable index" case the Dataset API cannot express); a chunk costs
one neighbor-lookup fan-out (vids routed to owner actors, block ids
routed back) + one owner-side vectorized waterfill; the driver holds
only the k-vector of block sizes and streams chunk deltas.  ``chunk``
trades staleness for round trips — a hyperparameter like the SGNS
shard count, NOT a layout knob.

Reference anchor: the reference partitions per-institution by
construction (halvesting_geometric/link_prediction_datamodule.py's
per-file loaders); this is the general-graph replacement.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..config import DEFAULT, EngineConfig
from .csr import build_csr_shards, load_shard
from .engine import part_to_actor_map, plan_actors


def waterfill_assign(scores: np.ndarray, vids: np.ndarray,
                     frozen_sizes: np.ndarray, cap: int,
                     weights: Optional[np.ndarray] = None) -> np.ndarray:
    """Resolve one chunk's claims against per-block remaining capacity.

    scores: (m, k) float64; vids: (m,) int64 (priority tie-break);
    frozen_sizes: (k,) int64.  Returns (m,) int32 chosen blocks.
    Deterministic: preference order per vertex is (score desc,
    frozen_size asc, block id asc); keep-priority inside an over-full
    block is (score desc, vid asc).

    weights (optional, (m,) int64, default all-ones): vertex weights
    for the multilevel coarse level — sizes/cap are then in weight
    units and an over-claimed block keeps the longest priority PREFIX
    whose total weight fits (a mid-prefix heavy vertex spills
    everything behind it — simpler than best-fit and still
    deterministic).  Unweighted behavior is bitwise unchanged.  With
    weights > 1 a vertex can exhaust all k blocks (every remainder
    smaller than its weight); it then soft-overflows onto the block
    with the largest remainder (ties: lower id), exceeding cap by at
    most max_weight - 1 — the caller reports the excess in
    info["overflow"].
    """
    m, k = scores.shape
    w = weights if weights is not None else None
    # preference matrix per row: (-score, frozen_size, block id) — one
    # flat lexsort over all m*k cells, row as the primary key
    blk = np.tile(np.arange(k, dtype=np.int64), m)
    fs = np.tile(frozen_sizes, m)
    rows_flat = np.repeat(np.arange(m, dtype=np.int64), k)
    flat = np.lexsort((blk, fs, -scores.ravel(), rows_flat))
    pref = (flat % k).reshape(m, k)
    choice_idx = np.zeros(m, dtype=np.int64)  # current preference rank
    assigned = np.full(m, -1, dtype=np.int32)
    remaining = (cap - frozen_sizes).astype(np.int64)
    live = np.arange(m)
    for _ in range(k):
        if live.size == 0:
            break
        claims = pref[live, choice_idx[live]]
        placed_mask = np.zeros(live.size, dtype=bool)
        for b in np.unique(claims):
            members = np.flatnonzero(claims == b)
            if remaining[b] <= 0:
                choice_idx[live[members]] += 1
                continue
            mw = (int(members.size) if w is None
                  else int(w[live[members]].sum()))
            if mw <= remaining[b]:
                assigned[live[members]] = b
                remaining[b] -= mw
                placed_mask[members] = True
                continue
            rows = live[members]
            prio = np.lexsort((vids[rows], -scores[rows, b]))
            if w is None:
                cut = int(remaining[b])
            else:
                cw = np.cumsum(w[rows[prio]])
                cut = int(np.searchsorted(cw, remaining[b],
                                          side="right"))
            keep = members[prio[:cut]]
            spill = members[prio[cut:]]
            assigned[live[keep]] = b
            remaining[b] -= (cut if w is None
                             else int(w[live[keep]].sum()))
            placed_mask[keep] = True
            choice_idx[live[spill]] += 1
        live = live[~placed_mask]
    if live.size:
        if w is None:  # cap * k >= (1+eps) * N > N: impossible
            raise RuntimeError("waterfill: unplaceable vertices remain")
        # weighted soft overflow: vid order, largest remainder first
        for i in live[np.argsort(vids[live], kind="stable")]:
            b = int(np.argmax(remaining))
            assigned[i] = b
            remaining[b] -= int(w[i])
    return assigned


@ray.remote(num_cpus=0)
class _LdgShardActor:
    def __init__(self, actor_idx: int, owned: List[int],
                 paths: Dict[int, str], offsets: np.ndarray,
                 part2actor: np.ndarray, num_actors: int,
                 wpaths: Optional[Dict[int, str]] = None,
                 bpaths: Optional[Dict[int, str]] = None):
        import pyarrow.parquet as pq

        self.idx = actor_idx
        self.owned = owned
        self.off = offsets
        self.p2a = part2actor
        self.A = num_actors
        self.shards = {p: load_shard(paths[p]) for p in owned}
        self.block: Dict[int, np.ndarray] = {
            p: np.full(self.shards[p]["indptr"].size - 1, -1,
                       dtype=np.int32) for p in owned}
        # warm-start assignment (refinement mode): per-part parquet of
        # (vid, rank=block) — same routing shape as the weights
        if bpaths:
            for p in owned:
                if p in bpaths:
                    t = pq.read_table(bpaths[p], columns=["vid", "rank"])
                    vid = t.column("vid").to_numpy()
                    self.block[p][vid - self.shards[p]["vid_lo"]] = \
                        t.column("rank").to_numpy().astype(np.int32)
        # per-part vertex weights (multilevel coarse levels); parts
        # absent from wpaths keep implicit all-ones
        self.w: Dict[int, np.ndarray] = {}
        if wpaths:
            for p in owned:
                if p in wpaths:
                    t = pq.read_table(wpaths[p], columns=["vid", "rank"])
                    arr = np.ones(self.shards[p]["indptr"].size - 1,
                                  dtype=np.int64)
                    vid = t.column("vid").to_numpy()
                    arr[vid - self.shards[p]["vid_lo"]] = \
                        t.column("rank").to_numpy().astype(np.int64)
                    self.w[p] = arr
        self._pending = None  # (part, lo, hi, rows per neighbor)

    def chunk_queries(self, p: int, lo: int, hi: int):
        """Extract the chunk's adjacency, remember the row layout and
        return per-actor neighbor vid arrays (None when empty)."""
        s = self.shards[p]
        indptr, indices = s["indptr"], s["indices"]
        starts, ends = indptr[lo:hi], indptr[lo + 1:hi + 1]
        cnt = ends - starts
        total = int(cnt.sum())
        if total == 0:
            self._pending = (p, lo, hi, np.empty(0, np.int64),
                             np.empty(0, np.int64), None)
            return [None] * self.A
        csum = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        pos = np.repeat(starts - csum, cnt) + np.arange(total)
        nbr = indices[pos]
        row = np.repeat(np.arange(hi - lo, dtype=np.int64), cnt)
        part = np.searchsorted(self.off, nbr, side="right") - 1
        dest = self.p2a[part]
        order = np.argsort(dest, kind="stable")
        b = np.searchsorted(dest[order], np.arange(self.A + 1))
        self._pending = (p, lo, hi, row, order, b)
        n = nbr[order]
        return [n[b[j]:b[j + 1]] if b[j + 1] > b[j] else None
                for j in range(self.A)]

    def lookup(self, vids) -> Optional[np.ndarray]:
        """Block ids of the given vids (all owned by this actor)."""
        if isinstance(vids, list):  # A == 1: whole list as one object
            vids = vids[0]
        if vids is None:
            return None
        part = np.searchsorted(self.off, vids, side="right") - 1
        out = np.empty(vids.size, dtype=np.int32)
        for p in self.owned:
            m = part == p
            if m.any():
                out[m] = self.block[p][vids[m] - self.shards[p]["vid_lo"]]
        return out

    def assign_chunk(self, k: int, cap: int, frozen_sizes: np.ndarray,
                     *lookups) -> np.ndarray:
        """Score the pending chunk against the looked-up neighbor
        blocks, waterfill, store assignments; return per-block delta."""
        p, lo, hi, row, order, b = self._pending
        self._pending = None
        m = hi - lo
        counts = np.zeros((m, k), dtype=np.int64)
        if b is not None and order.size:
            nblk_sorted = np.empty(order.size, dtype=np.int32)
            for j, lk in enumerate(lookups):
                if lk is not None:
                    nblk_sorted[b[j]:b[j + 1]] = lk
            # sorted position j holds original position order[j]
            nblk = np.empty(order.size, dtype=np.int32)
            nblk[order] = nblk_sorted
            keep = nblk >= 0
            if keep.any():
                np.add.at(counts, (row[keep], nblk[keep]), 1)
        scores = counts * (1.0 - frozen_sizes / float(cap))
        vids = np.arange(lo, hi, dtype=np.int64) + \
            self.shards[p]["vid_lo"]
        wc = self.w[p][lo:hi] if p in self.w else None
        chosen = waterfill_assign(scores, vids, frozen_sizes, cap,
                                  weights=wc)
        self.block[p][lo:hi] = chosen
        return np.bincount(chosen, weights=wc,
                           minlength=k).astype(np.int64)

    def init_sizes(self, k: int) -> np.ndarray:
        """Weighted per-block sizes of the warm-start assignment over
        this actor's owned parts (refinement bookkeeping seed)."""
        out = np.zeros(k, dtype=np.int64)
        for p in self.owned:
            blk = self.block[p]
            valid = blk >= 0
            wp = self.w.get(p)
            out += np.bincount(
                blk[valid], minlength=k,
                weights=None if wp is None else wp[valid]
            ).astype(np.int64)
        return out

    def refine_chunk(self, k: int, cap: int, frozen_sizes: np.ndarray,
                     *lookups) -> Tuple[np.ndarray, int]:
        """Uncoarsening refinement step (the KL/FM-lite move pass of
        the METIS V-cycle, batch-synchronous): every chunk vertex
        counts its neighbors' CURRENT blocks, proposes a move to the
        majority block when the gain (neighbor-count delta) is
        strictly positive, and moves land in deterministic priority
        order (gain desc, vid asc) against the frozen capacity
        snapshot — inflow is capped at cap - frozen_size, outflow is
        credited at the next chunk, so sizes never rise above cap (an
        over-cap warm start can only drain).  Returns (per-block
        weighted size delta, n_moves)."""
        p, lo, hi, row, order, b = self._pending
        self._pending = None
        m = hi - lo
        counts = np.zeros((m, k), dtype=np.int64)
        if b is not None and order.size:
            nblk_sorted = np.empty(order.size, dtype=np.int32)
            for j, lk in enumerate(lookups):
                if lk is not None:
                    nblk_sorted[b[j]:b[j + 1]] = lk
            nblk = np.empty(order.size, dtype=np.int32)
            nblk[order] = nblk_sorted
            keep = nblk >= 0
            if keep.any():
                np.add.at(counts, (row[keep], nblk[keep]), 1)
        cur = self.block[p][lo:hi].astype(np.int64)
        rows_idx = np.arange(m)
        best = np.argmax(counts, axis=1)  # ties: lowest block id
        gain = counts[rows_idx, best] - counts[rows_idx, cur]
        wc = (self.w[p][lo:hi] if p in self.w
              else np.ones(m, dtype=np.int64))
        vids = np.arange(lo, hi, dtype=np.int64) + \
            self.shards[p]["vid_lo"]
        cand = np.flatnonzero((gain > 0) & (best != cur))
        delta = np.zeros(k, dtype=np.int64)
        n_moves = 0
        if cand.size:
            remaining = (cap - frozen_sizes).astype(np.int64)
            for tb in np.unique(best[cand]):
                mem = cand[best[cand] == tb]
                if remaining[tb] <= 0:
                    continue
                prio = mem[np.lexsort((vids[mem], -gain[mem]))]
                cw = np.cumsum(wc[prio])
                cut = int(np.searchsorted(cw, remaining[tb],
                                          side="right"))
                movers = prio[:cut]
                if movers.size == 0:
                    continue
                self.block[p][lo + movers] = np.int32(tb)
                mw = int(wc[movers].sum())
                delta[tb] += mw
                np.subtract.at(delta, cur[movers], wc[movers])
                n_moves += int(movers.size)
        return delta, n_moves

    def result_tables(self):
        out = []
        for p in self.owned:
            lo = self.shards[p]["vid_lo"]
            blk = self.block[p]
            out.append(pa.table({
                "vid": pa.array(np.arange(lo, lo + blk.size,
                                          dtype=np.int64)),
                "block": pa.array(blk.astype(np.int32)),
            }))
        return out


def ldg_partition(sym_edges, offsets: np.ndarray, workdir: str,
                  cfg: EngineConfig = DEFAULT, *, k: int = 8,
                  eps: float = 0.1, chunk: int = 4096,
                  num_actors: int = 0,
                  shards_dir: Optional[str] = None,
                  vertex_weights=None
                  ) -> Tuple["rd.Dataset", Dict]:
    """Batch-synchronous LDG over a SYMMETRIZED edge table.

    Returns (ds(vid, block), info) with info = {k, cap, sizes,
    n_chunks, wall_sec}.  ``chunk`` is a HYPERPARAMETER of the
    assignment (staleness window), not a layout knob; results are
    bitwise layout-independent for fixed (offsets, chunk, k, eps).

    vertex_weights (optional): a (vid, w:int) Dataset — sizes and cap
    switch to weight units (cap = ceil((1+eps) * W / k)), the
    multilevel coarse-level contract where a supervertex carries the
    number of fine vertices it contains.  Weights route to the owner
    actors as per-part parquet (pagerank's _write_ranks_by_part — the
    driver never holds the weight vector); vertices missing from the
    dataset weigh 1.  info gains "W" and "overflow" (total weight
    above cap from the waterfill's soft-overflow fallback, 0 in the
    unweighted mode).
    """
    off = np.asarray(offsets, dtype=np.int64)
    N = int(off[-1])
    num_parts = len(off) - 1
    if k < 1:
        raise ValueError("ldg_partition: k must be >= 1")
    wpaths = None
    W = N
    if vertex_weights is not None and N:
        from .pagerank import _write_ranks_by_part

        vw = vertex_weights.map_batches(
            lambda b: pa.table({"vid": b.column("vid"),
                                "rank": b.column("w").cast(pa.float64())}),
            batch_format="pyarrow", zero_copy_batch=True)
        wpaths = _write_ranks_by_part(vw, off, f"{workdir}/ldg_vw")
        W = int(vertex_weights.sum("w"))
    cap = int(np.ceil((1.0 + eps) * W / k)) if N else 0
    descs = build_csr_shards(sym_edges, off,
                             shards_dir or f"{workdir}/csr_sym",
                             lineage={"kind": "sym"})
    paths = {dd["part"]: dd["path"] for dd in descs}
    owned = plan_actors(num_parts, num_actors)
    A = len(owned)
    p2a = part_to_actor_map(owned, num_parts)
    actors = [_LdgShardActor.remote(i, owned[i], paths, off, p2a, A,
                                    wpaths)
              for i in range(A)]
    sizes = np.zeros(k, dtype=np.int64)
    n_chunks = 0
    t0 = time.time()
    try:
        for p in range(num_parts):
            owner = actors[p2a[p]]
            n_local = int(off[p + 1] - off[p])
            for lo in range(0, n_local, chunk):
                hi = min(lo + chunk, n_local)
                if A > 1:
                    qrefs = list(owner.chunk_queries.options(
                        num_returns=A).remote(p, lo, hi))
                else:  # single return IS the 1-element list
                    qrefs = [owner.chunk_queries.remote(p, lo, hi)]
                lrefs = [actors[j].lookup.remote(qrefs[j])
                         for j in range(A)]
                sizes += ray.get(owner.assign_chunk.remote(
                    k, cap, sizes, *lrefs))
                n_chunks += 1
        tables = [t for ref in [a.result_tables.remote() for a in actors]
                  for t in ray.get(ref)]
    finally:
        for a in actors:
            ray.kill(a)
    info = {"k": k, "cap": cap, "sizes": sizes.tolist(),
            "n_chunks": n_chunks, "n": N, "W": W,
            "overflow": int(np.maximum(sizes - cap, 0).sum()),
            "wall_sec": round(time.time() - t0, 4)}
    tables = [t for t in tables if t.num_rows] or [pa.schema(
        [pa.field("vid", pa.int64()),
         pa.field("block", pa.int32())]).empty_table()]
    return rd.from_arrow(tables), info


def refine_partition(sym_edges, offsets: np.ndarray, blocks,
                     workdir: str, cfg: EngineConfig = DEFAULT, *,
                     k: int = 8, eps: float = 0.1, cap: int = 0,
                     chunk: int = 4096, sweeps: int = 3,
                     num_actors: int = 0,
                     shards_dir: Optional[str] = None,
                     vertex_weights=None) -> Tuple["rd.Dataset", Dict]:
    """Gain-based move refinement of an existing (vid, block)
    assignment — the uncoarsening half of the METIS V-cycle (Karypis &
    Kumar 1998), batch-synchronous on the LDG shard actors: up to
    ``sweeps`` full passes in dense-vid chunk order; a vertex moves to
    its neighbor-majority block when that strictly reduces its cut
    edges and the target block has capacity under cap =
    ceil((1+eps) * W / k).  Early-exits when a sweep makes no moves.
    Deterministic and actor-layout independent for fixed (offsets,
    chunk, k, cap, sweeps) — same argument as ldg_partition.

    Returns (ds(vid, block), info) with info = {cap, sizes, sweeps_run,
    moves_per_sweep, n_moves, wall_sec}.
    """
    off = np.asarray(offsets, dtype=np.int64)
    N = int(off[-1])
    num_parts = len(off) - 1
    from .pagerank import _write_ranks_by_part

    wpaths = None
    W = N
    if vertex_weights is not None and N:
        vw = vertex_weights.map_batches(
            lambda b: pa.table({"vid": b.column("vid"),
                                "rank": b.column("w").cast(pa.float64())}),
            batch_format="pyarrow", zero_copy_batch=True)
        wpaths = _write_ranks_by_part(vw, off, f"{workdir}/ref_vw")
        W = int(vertex_weights.sum("w"))
    if not cap:
        cap = int(np.ceil((1.0 + eps) * W / k)) if N else 0
    descs = build_csr_shards(sym_edges, off,
                             shards_dir or f"{workdir}/csr_sym",
                             lineage={"kind": "sym"})
    paths = {dd["part"]: dd["path"] for dd in descs}
    bds = blocks.map_batches(
        lambda b: pa.table({"vid": b.column("vid"),
                            "rank": b.column("block").cast(pa.float64())}),
        batch_format="pyarrow", zero_copy_batch=True)
    bpaths = _write_ranks_by_part(bds, off, f"{workdir}/ref_b0")
    owned = plan_actors(num_parts, num_actors)
    A = len(owned)
    p2a = part_to_actor_map(owned, num_parts)
    actors = [_LdgShardActor.remote(i, owned[i], paths, off, p2a, A,
                                    wpaths, bpaths)
              for i in range(A)]
    t0 = time.time()
    moves_per_sweep: List[int] = []
    try:
        sizes = np.sum(ray.get([a.init_sizes.remote(k) for a in actors]),
                       axis=0).astype(np.int64)
        for _ in range(sweeps):
            moves = 0
            for p in range(num_parts):
                owner = actors[p2a[p]]
                n_local = int(off[p + 1] - off[p])
                for lo in range(0, n_local, chunk):
                    hi = min(lo + chunk, n_local)
                    if A > 1:
                        qrefs = list(owner.chunk_queries.options(
                            num_returns=A).remote(p, lo, hi))
                    else:
                        qrefs = [owner.chunk_queries.remote(p, lo, hi)]
                    lrefs = [actors[j].lookup.remote(qrefs[j])
                             for j in range(A)]
                    delta, n = ray.get(owner.refine_chunk.remote(
                        k, cap, sizes, *lrefs))
                    sizes += delta
                    moves += n
            moves_per_sweep.append(moves)
            if moves == 0:
                break
        tables = [t for ref in [a.result_tables.remote() for a in actors]
                  for t in ray.get(ref)]
    finally:
        for a in actors:
            ray.kill(a)
    info = {"cap": cap, "sizes": sizes.tolist(),
            "sweeps_run": len(moves_per_sweep),
            "moves_per_sweep": moves_per_sweep,
            "n_moves": int(sum(moves_per_sweep)),
            "wall_sec": round(time.time() - t0, 4)}
    tables = [t for t in tables if t.num_rows] or [pa.schema(
        [pa.field("vid", pa.int64()),
         pa.field("block", pa.int32())]).empty_table()]
    return rd.from_arrow(tables), info


def partition_cut(edges, blocks, num_parts: int = 16) -> Dict:
    """Edge-cut of a (vid, block) assignment over an edge table: two
    bucketed joins attach endpoint blocks, per-batch partials reduce
    to two scalars.  Returns {n_edges, n_cut, cut_fraction}."""
    from ..ops.join import hash_join

    b_schema = pa.schema([pa.field("vid", pa.int64()),
                          pa.field("block", pa.int32())])
    e_schema = pa.schema([pa.field("src", pa.int64()),
                          pa.field("dst", pa.int64())])
    j = hash_join(edges.select_columns(["src", "dst"]), blocks,
                  on="src", right_on="vid", num_parts=num_parts,
                  left_schema=e_schema, right_schema=b_schema)
    j = j.map_batches(lambda b: b.rename_columns(
        ["src_block" if c == "block" else c for c in b.column_names]),
        batch_format="pyarrow", zero_copy_batch=True)
    j = hash_join(j, blocks, on="dst", right_on="vid",
                  num_parts=num_parts,
                  left_schema=e_schema.append(
                      pa.field("src_block", pa.int32())),
                  right_schema=b_schema)

    def partial(b: pa.Table) -> pa.Table:
        sb = b.column("src_block").to_numpy(zero_copy_only=False)
        db = b.column("block").to_numpy(zero_copy_only=False)
        return pa.table({"cut": pa.array([int((sb != db).sum())]),
                         "tot": pa.array([b.num_rows])})

    parts = j.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
    n_cut = int(parts.sum("cut") or 0)
    n_tot = int(parts.sum("tot") or 0)
    return {"n_edges": n_tot, "n_cut": n_cut,
            "cut_fraction": (n_cut / n_tot) if n_tot else 0.0}


def relabel_by_blocks(vertices, edges, blocks, k: int,
                      num_parts: int = 16
                      ) -> Tuple["rd.Dataset", "rd.Dataset", np.ndarray]:
    """Re-id the graph block-major so the LDG assignment becomes the
    physical CSR layout: new vid = block_base[block] + rank of the old
    vid within its block; new offsets = the k block boundaries.  After
    this, every iterative round's exchange volume IS the LDG cut —
    the partitioner's quality turns into wall-clock.

    One grouped count (k tiny rows), one key-partitioned ranking
    exchange (ops/window.row_number), and three bucketed joins remap
    vertices and both edge endpoints.  Returns (vertices(url,vid),
    edges(src,dst), offsets) in the new id space.
    """
    from ..ops.agg import grouped_aggregate
    from ..ops.join import hash_join
    from ..ops.window import row_number

    sizes_pd = (grouped_aggregate(blocks.select_columns(["block"]),
                                  ["block"], {"n": ("count", None)},
                                  num_parts=num_parts)
                .to_pandas().sort_values("block"))
    sizes = np.zeros(k, dtype=np.int64)
    sizes[sizes_pd["block"].to_numpy()] = sizes_pd["n"].to_numpy()
    offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)
    base = {int(b): int(offsets[int(b)]) for b in range(k)}

    ranked = row_number(blocks, ["block"], ["vid"], out_col="rn",
                        num_parts=num_parts)

    def to_new(b: pa.Table) -> pa.Table:
        blk = b.column("block").to_numpy(zero_copy_only=False)
        rn = b.column("rn").to_numpy(zero_copy_only=False)
        lut = np.zeros(k, dtype=np.int64)
        for x in range(k):
            lut[x] = base[x]
        return pa.table({"vid": b.column("vid"),
                         "new_vid": pa.array(lut[blk] + rn - 1)})

    mapping = ranked.map_batches(to_new, batch_format="pyarrow",
                                 zero_copy_batch=True).materialize()
    m_schema = pa.schema([pa.field("vid", pa.int64()),
                          pa.field("new_vid", pa.int64())])

    v_new = hash_join(vertices.select_columns(["url", "vid"]), mapping,
                      on="vid", right_on="vid", num_parts=num_parts,
                      left_schema=pa.schema([pa.field("url", pa.string()),
                                             pa.field("vid", pa.int64())]),
                      right_schema=m_schema)
    v_new = v_new.map_batches(
        lambda b: pa.table({"url": b.column("url"),
                            "vid": b.column("new_vid")}),
        batch_format="pyarrow", zero_copy_batch=True)

    e_schema = pa.schema([pa.field("src", pa.int64()),
                          pa.field("dst", pa.int64())])
    e1 = hash_join(edges.select_columns(["src", "dst"]), mapping,
                   on="src", right_on="vid", num_parts=num_parts,
                   left_schema=e_schema, right_schema=m_schema)
    e1 = e1.map_batches(
        lambda b: pa.table({"src": b.column("new_vid"),
                            "dst": b.column("dst")}),
        batch_format="pyarrow", zero_copy_batch=True)
    e2 = hash_join(e1, mapping, on="dst", right_on="vid",
                   num_parts=num_parts, left_schema=e_schema,
                   right_schema=m_schema)
    e2 = e2.map_batches(
        lambda b: pa.table({"src": b.column("src"),
                            "dst": b.column("new_vid")}),
        batch_format="pyarrow", zero_copy_batch=True)
    return v_new, e2, offsets
