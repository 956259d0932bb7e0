"""Streaming vertex-cut edge partitioning — batch-synchronous HDRF.

Vertex partitioning (graph/partition.py's LDG) minimizes cut EDGES;
for power-law web graphs the PowerGraph line of work showed the dual —
assign EDGES to blocks and replicate vertices — bounds communication
better because hub vertices are split instead of overloading one
block.  HDRF (High-Degree Replicated First; Petroni et al., CIKM
2015) is the streaming state of the art: an edge goes to the block
already holding its endpoints' replicas, preferring to re-replicate
the HIGHER-degree endpoint (hubs get cut, tails stay whole), damped
by a load-balance term.

Batch-synchronous spec (what the sequential oracle replays):

- edges stream in DETERMINISTIC CSR order (directed shards: partition
  by partition, source vids ascending, each source's out-neighbors in
  CSR index order) in chunks of ``chunk`` edges, aligned to source-vid
  boundaries within a partition;
- a chunk is scored against a FROZEN snapshot: replica masks A(.) and
  partial degrees d(.) as of chunk start, block sizes at chunk start;
- per edge (u, v): theta_u = d(u) / (d(u) + d(v)) (0.5 when both 0),
  g(u, b) = [b in A(u)] * (2 - theta_u), likewise g(v, b) with
  theta_v = 1 - theta_u;
  bal(b)  = lam * (maxsize - size_b) / (1 + maxsize - minsize);
  the chunk resolves by priority WATERFILLING (partition.py::
  waterfill_assign) on the score matrix g(u,.) + g(v,.) + bal(.)
  under the running hard cap ceil((1+eps) * (assigned + m) / k) —
  the sequential HDRF self-corrects balance per edge; the batch
  variant needs the cap or a hub's whole chunk lands on one block;
- after the chunk: A(u) |= {b}, A(v) |= {b}, d(u) += 1, d(v) += 1 for
  every edge, sizes += per-block counts.

The chunk sequence is fully determined by (offsets, chunk, k, lam,
eps), so the assignment is bitwise deterministic and actor-layout
independent; ``chunk`` is the staleness HYPERPARAMETER (the LDG
convention), and max block size never exceeds the final cap, so
max_over_avg <= (1 + eps) + rounding at every chunk boundary.

Scale shape: per-vertex state is one uint64 replica bitmask (k <= 64)
plus one int64 partial degree, sharded across the CSR shard actors
(the "shared mutable index" case); a chunk costs one state-lookup
fan-out for the dst endpoints, one vectorized owner-side score+argmax
(numpy (m, k) — no Python per-edge loop), and one scatter of (vid,
block) replica updates back to the dst owners.  The driver holds only
the k-vector of block sizes.  The quality metric is the replication
factor RF = sum_v |A(v)| / |V| — what a random edge-hash layout makes
~k*(1-(1-1/k)^deg) and HDRF pushes toward 1 on low-degree vertices.

Reference anchor: the reference hands each institution's subgraph to
one worker (halvesting_geometric/link_prediction_datamodule.py); this
is the general web-graph replacement for skewed degree distributions.
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


def hdrf_scores(mu: np.ndarray, mv: np.ndarray, du: np.ndarray,
                dv: np.ndarray, sizes: np.ndarray, k: int,
                lam: float) -> np.ndarray:
    """Vectorized HDRF score matrix for one chunk.

    mu/mv: (m,) uint64 replica bitmasks; du/dv: (m,) int64 partial
    degrees; sizes: (k,) int64.  Returns (m, k) float64.
    """
    bits = np.arange(k, dtype=np.uint64)
    pu = ((mu[:, None] >> bits) & np.uint64(1)).astype(np.float64)
    pv = ((mv[:, None] >> bits) & np.uint64(1)).astype(np.float64)
    tot = (du + dv).astype(np.float64)
    theta_u = np.where(tot > 0, du / np.maximum(tot, 1.0), 0.5)
    g = pu * (2.0 - theta_u)[:, None] + pv * (1.0 + theta_u)[:, None]
    mx, mn = sizes.max(), sizes.min()
    bal = lam * (mx - sizes).astype(np.float64) / (1.0 + mx - mn)
    return g + bal[None, :]


@ray.remote(num_cpus=0)
class _HdrfShardActor:
    def __init__(self, actor_idx: int, owned: List[int],
                 paths: Dict[int, str], offsets: np.ndarray,
                 part2actor: np.ndarray, num_actors: int):
        self.idx = actor_idx
        self.owned = owned
        self.off = offsets
        self.p2a = part2actor
        self.A = num_actors
        self.shards = {p: load_shard(paths[p]) for p in owned}
        # per-part vertex state: replica bitmask + partial degree
        self.mask: Dict[int, np.ndarray] = {
            p: np.zeros(self.shards[p]["indptr"].size - 1,
                        dtype=np.uint64) for p in owned}
        self.deg: Dict[int, np.ndarray] = {
            p: np.zeros(self.shards[p]["indptr"].size - 1,
                        dtype=np.int64) for p in owned}
        # per-part per-edge block assignment, CSR index order
        self.eblock: Dict[int, np.ndarray] = {
            p: np.full(self.shards[p]["indices"].size, -1,
                       dtype=np.int32) for p in owned}
        self._pending = None

    def chunk_splits(self, p: int, chunk: int) -> np.ndarray:
        """Vid-aligned chunk boundaries targeting ~chunk edges each
        (a hub with degree > chunk gets its own chunk).  Deterministic
        in (indptr, chunk) — i.e. in the edge set + offsets."""
        indptr = self.shards[p]["indptr"]
        n_local = indptr.size - 1
        total = int(indptr[-1])
        if n_local == 0 or total == 0:
            return np.array([0, n_local], dtype=np.int64)
        targets = np.arange(chunk, total, chunk, dtype=np.int64)
        cuts = np.searchsorted(indptr, targets, side="left")
        return np.unique(np.concatenate(
            [[0], cuts, [n_local]])).astype(np.int64)

    def chunk_edges(self, p: int, lo: int, hi: int):
        """Extract out-edges of local vids [lo, hi); remember layout;
        return per-actor dst vid arrays for the state lookup."""
        s = self.shards[p]
        indptr, indices = s["indptr"], s["indices"]
        e_lo, e_hi = int(indptr[lo]), int(indptr[hi])
        if e_hi == e_lo:
            self._pending = (p, lo, hi, e_lo,
                             np.empty(0, np.int64), None, None)
            return [None] * self.A
        dst = indices[e_lo:e_hi].astype(np.int64)
        cnt = indptr[lo + 1:hi + 1] - indptr[lo:hi]
        srow = np.repeat(np.arange(hi - lo, dtype=np.int64), cnt)
        part = np.searchsorted(self.off, dst, side="right") - 1
        dest = self.p2a[part]
        order = np.argsort(dest, kind="stable")
        b = np.searchsorted(dest[order], np.arange(self.A + 1))
        self._pending = (p, lo, hi, e_lo, srow, order, b)
        d = dst[order]
        return [d[b[j]:b[j + 1]] if b[j + 1] > b[j] else None
                for j in range(self.A)]

    def state_lookup(self, vids) -> Optional[np.ndarray]:
        """(mask, deg) rows for the given vids (owned here).  Returned
        as a (2, n) int64-compatible array (mask bit-cast)."""
        if isinstance(vids, list):  # A == 1: one-element list
            vids = vids[0]
        if vids is None:
            return None
        part = np.searchsorted(self.off, vids, side="right") - 1
        mask = np.empty(vids.size, dtype=np.uint64)
        deg = np.empty(vids.size, dtype=np.int64)
        for p in self.owned:
            m = part == p
            if m.any():
                loc = vids[m] - self.shards[p]["vid_lo"]
                mask[m] = self.mask[p][loc]
                deg[m] = self.deg[p][loc]
        return np.stack([mask.view(np.int64), deg])

    def assign_chunk(self, k: int, lam: float, eps: float,
                     sizes: np.ndarray, *lookups):
        """Score pending edges against frozen state, resolve by
        priority waterfilling under the running hard cap
        ceil((1+eps) * (assigned + m) / k) — the sequential HDRF
        self-corrects balance per edge; the batch variant needs the
        cap or a hub's whole chunk lands on one block — apply local
        (src) replica/degree updates, and return (per-block size
        delta, *per-actor dst update arrays) where each update array
        is a (2, n) [vid, block] stack."""
        p, lo, hi, e_lo, srow, order, b = self._pending
        self._pending = None
        if srow.size == 0:
            return (np.zeros(k, dtype=np.int64), *([None] * self.A))
        m = srow.size
        dmask = np.empty(m, dtype=np.uint64)
        ddeg = np.empty(m, dtype=np.int64)
        dsorted_mask = np.empty(m, dtype=np.int64)
        dsorted_deg = np.empty(m, dtype=np.int64)
        for j, lk in enumerate(lookups):
            if lk is not None:
                dsorted_mask[b[j]:b[j + 1]] = lk[0]
                dsorted_deg[b[j]:b[j + 1]] = lk[1]
        dmask[order] = dsorted_mask.view(np.uint64)
        ddeg[order] = dsorted_deg
        s = self.shards[p]
        umask = self.mask[p][lo:hi][srow]
        udeg = self.deg[p][lo:hi][srow]
        scores = hdrf_scores(umask, dmask, udeg, ddeg, sizes, k, lam)
        from .partition import waterfill_assign

        cap = int(np.ceil((1.0 + eps) * (int(sizes.sum()) + m) / k))
        evids = e_lo + np.arange(m, dtype=np.int64)  # edge priority
        chosen = waterfill_assign(scores, evids,
                                  sizes.astype(np.int64), cap)
        self.eblock[p][e_lo:e_lo + m] = chosen
        # local src updates: OR chosen bit into mask, bump degree
        one = np.uint64(1)
        np.bitwise_or.at(self.mask[p], lo + srow,
                         one << chosen.astype(np.uint64))
        np.add.at(self.deg[p], lo + srow, 1)
        # dst updates route back to their owners (same order split)
        dst = s["indices"][e_lo:e_lo + m].astype(np.int64)
        upd_v = dst[order]
        upd_b = chosen[order].astype(np.int64)
        updates = [np.stack([upd_v[b[j]:b[j + 1]], upd_b[b[j]:b[j + 1]]])
                   if b[j + 1] > b[j] else None for j in range(self.A)]
        return (np.bincount(chosen, minlength=k).astype(np.int64),
                *updates)

    def apply_updates(self, upd) -> int:
        """OR replica bits / bump degrees for dst endpoints owned
        here.  upd: (2, n) [vid, block]."""
        if isinstance(upd, list):
            upd = upd[0]
        if upd is None:
            return 0
        vids, blocks = upd[0], upd[1]
        part = np.searchsorted(self.off, vids, side="right") - 1
        one = np.uint64(1)
        for p in self.owned:
            m = part == p
            if m.any():
                loc = vids[m] - self.shards[p]["vid_lo"]
                np.bitwise_or.at(self.mask[p], loc,
                                 one << blocks[m].astype(np.uint64))
                np.add.at(self.deg[p], loc, 1)
        return 0

    def replica_stats(self) -> np.ndarray:
        """[sum of replica counts, vertices with >= 1 replica]."""
        tot = 0
        nv = 0
        for p in self.owned:
            c = np.zeros(self.mask[p].size, dtype=np.int64)
            mm = self.mask[p].copy()
            while mm.any():
                c += (mm & np.uint64(1)).astype(np.int64)
                mm >>= np.uint64(1)
            tot += int(c.sum())
            nv += int((c > 0).sum())
        return np.array([tot, nv], dtype=np.int64)

    def result_tables(self):
        out = []
        for p in self.owned:
            s = self.shards[p]
            indptr, indices = s["indptr"], s["indices"]
            n_local = indptr.size - 1
            cnt = indptr[1:] - indptr[:-1]
            src = np.repeat(
                np.arange(n_local, dtype=np.int64) + s["vid_lo"], cnt)
            out.append(pa.table({
                "src": pa.array(src),
                "dst": pa.array(indices.astype(np.int64)),
                "block": pa.array(self.eblock[p]),
            }))
        return out


def hdrf_partition(edges, offsets: np.ndarray, workdir: str,
                   cfg: EngineConfig = DEFAULT, *, k: int = 8,
                   lam: float = 1.1, eps: float = 0.1,
                   chunk: int = 8192,
                   num_actors: int = 0,
                   shards_dir: Optional[str] = None
                   ) -> Tuple["rd.Dataset", Dict]:
    """Batch-synchronous HDRF over a DIRECTED (src, dst) edge table
    (the CSR build dedups pairs — simple-graph contract).

    Returns (ds(src, dst, block), info) with info = {k, lam, sizes,
    replication_factor, n_replicated_vertices, n_edges, max_over_avg,
    n_chunks, wall_sec}.  k must be <= 64 (uint64 replica bitmask).
    ``chunk`` counts EDGES and aligns to source-vid boundaries.
    """
    if not 1 <= k <= 64:
        raise ValueError("hdrf_partition: k must be in [1, 64]")
    off = np.asarray(offsets, dtype=np.int64)
    num_parts = len(off) - 1
    descs = build_csr_shards(edges, off,
                             shards_dir or f"{workdir}/csr",
                             lineage={"kind": "directed"})
    paths = {dd["part"]: dd["path"] for dd in descs}
    owned = plan_actors(num_parts, num_actors)
    A = len(owned)
    p2a = part_to_actor_map(owned, num_parts)
    actors = [_HdrfShardActor.remote(i, owned[i], paths, off, p2a, A)
              for i in range(A)]
    sizes = np.zeros(k, dtype=np.int64)
    n_chunks = 0
    t0 = time.time()
    try:
        for p in range(num_parts):
            owner = actors[p2a[p]]
            n_local = int(off[p + 1] - off[p])
            if n_local == 0:
                continue
            # vid-aligned chunk boundaries targeting ~chunk edges
            # (indptr-guided; deterministic in the edge set + offsets)
            splits = ray.get(owner.chunk_splits.remote(p, chunk))
            for i in range(len(splits) - 1):
                lo, hi = int(splits[i]), int(splits[i + 1])
                if A > 1:
                    qrefs = list(owner.chunk_edges.options(
                        num_returns=A).remote(p, lo, hi))
                    lrefs = [actors[j].state_lookup.remote(qrefs[j])
                             for j in range(A)]
                    arefs = list(owner.assign_chunk.options(
                        num_returns=A + 1).remote(k, lam, eps, sizes,
                                                  *lrefs))
                    urefs = [actors[j].apply_updates.remote(
                        arefs[1 + j]) for j in range(A)]
                    delta = ray.get(arefs[0])
                else:
                    qref = owner.chunk_edges.remote(p, lo, hi)
                    lref = actors[0].state_lookup.remote(qref)
                    delta, upd = ray.get(owner.assign_chunk.remote(
                        k, lam, eps, sizes, lref))
                    urefs = [actors[0].apply_updates.remote(upd)]
                ray.get(urefs)
                sizes += delta
                n_chunks += 1
        rep = np.sum(ray.get([a.replica_stats.remote()
                              for a in actors]), axis=0)
        tables = [t for ref in [a.result_tables.remote() for a in actors]
                  for t in ray.get(ref)]
    finally:
        for a in actors:
            ray.kill(a)
    n_edges = int(sizes.sum())
    nv = int(rep[1])
    info = {"k": k, "lam": lam, "sizes": sizes.tolist(),
            "replication_factor": (float(rep[0]) / nv) if nv else 0.0,
            "n_replicated_vertices": nv, "n_edges": n_edges,
            "max_over_avg": (float(sizes.max()) * k / n_edges)
            if n_edges else 0.0,
            "n_chunks": n_chunks,
            "wall_sec": round(time.time() - t0, 4)}
    tables = [t for t in tables if t.num_rows] or [pa.schema(
        [pa.field("src", pa.int64()), pa.field("dst", pa.int64()),
         pa.field("block", pa.int32())]).empty_table()]
    return rd.from_arrow(tables), info
