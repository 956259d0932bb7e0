"""Distributed greedy graph coloring (Jones-Plassmann) on the CSR
shard engine.

Jones & Plassmann 1993 ("A parallel graph coloring heuristic"): give
every vertex one STATELESS random priority; a vertex colors itself the
round after all its higher-priority neighbors are colored, taking the
smallest color none of them used.  Validity is structural — a vertex
only ever decides strictly after every higher-priority neighbor, and
lower-priority neighbors decide strictly after it — so adjacent
vertices can never pick the same color.  Rounds are bounded by the
longest decreasing-priority path (O(log n / log log n) expected on
bounded-degree graphs; small in practice on web graphs).

The finer-grained sibling of graph/mis.py (color class 0 of JP with
the same priorities IS a maximal independent set): where MIS yields one
conflict-free batch, coloring partitions ALL vertices into conflict
groups — the schedule for mutating every page exactly once with no
adjacent pair in the same wave.

Engine shape: priorities are hash(vid, seed) computed locally on any
actor (no exchange); each shard keeps a per-edge neighbor-color cache
and a per-vertex count of UNCOLORED higher-priority neighbors; a round
is one fused actor call (apply incoming (neighbor, vid, color)
announcements -> decrement waits, color every vertex whose wait hit
zero with a segmented vectorized mex, announce).  Deterministic in
(edge set, seed) — tests/test_coloring.py pins a sequential replay and
the validity/greedy invariants.

Input contract: SYMMETRIZED self-loop-free edge table.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..config import DEFAULT, EngineConfig
from .csr import load_shard
from .engine import part_to_actor_map, plan_actors, transpose_refs
from .mis import round_priority

_UNSET = np.int64(-1)


def jp_priority(vids: np.ndarray, seed: int) -> np.ndarray:
    """The single static JP priority (reuses the MIS splitmix mix at
    round 0)."""
    return round_priority(vids, 0, seed)


def _segment_mex(colors: np.ndarray, row: np.ndarray,
                 n_rows: int) -> np.ndarray:
    """Per-row mex (smallest non-negative integer absent) over the
    given (row, color) pairs — vectorized: sort, dedupe, compare each
    unique color with its per-row rank; the first mismatch is the mex,
    else the count of distinct colors."""
    out = np.zeros(n_rows, dtype=np.int64)
    if colors.size == 0:
        return out
    order = np.lexsort((colors, row))
    r, c = row[order], colors[order]
    first = np.ones(r.size, dtype=bool)
    first[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
    r, c = r[first], c[first]
    starts = np.flatnonzero(np.r_[True, r[1:] != r[:-1]])
    rank = np.arange(r.size) - np.repeat(starts, np.diff(
        np.append(starts, r.size)))
    # rows present: mex = rank of first gap, else distinct count
    gap = c != rank
    mex = np.full(n_rows, 0, dtype=np.int64)
    cnt = np.zeros(n_rows, dtype=np.int64)
    np.add.at(cnt, r, 1)
    mex[np.unique(r)] = cnt[np.unique(r)]  # default: no gap
    if gap.any():
        gr, grank = r[gap], rank[gap]
        firstgap = np.full(n_rows, np.iinfo(np.int64).max)
        np.minimum.at(firstgap, gr, grank)
        hasgap = firstgap != np.iinfo(np.int64).max
        mex[hasgap] = firstgap[hasgap]
    return mex


@ray.remote(num_cpus=0)
class ColorShardActor:
    def __init__(self, actor_idx: int, owned: List[int],
                 paths: Dict[int, str], offsets: np.ndarray,
                 part2actor: np.ndarray, num_actors: int, seed: int):
        self.idx = actor_idx
        self.owned = owned
        self.off = offsets
        self.p2a = part2actor
        self.num_actors = num_actors
        self.seed = seed
        self.shards = {p: load_shard(paths[p]) for p in owned}
        self.color: Dict[int, np.ndarray] = {}
        self.wait: Dict[int, np.ndarray] = {}
        self.nbr_color: Dict[int, np.ndarray] = {}
        self.higher: Dict[int, np.ndarray] = {}
        self.sidx: Dict[int, np.ndarray] = {}
        self.ssorted: Dict[int, np.ndarray] = {}
        for p in owned:
            s = self.shards[p]
            lo = s["vid_lo"]
            n = s["vid_hi"] - lo
            vids = np.arange(lo, lo + n, dtype=np.int64)
            own_p = jp_priority(vids, seed)
            nb = s["indices"]
            nb_p = jp_priority(nb, seed)
            per_edge_own_p = np.repeat(own_p, s["outdeg"])
            per_edge_own_v = np.repeat(vids, s["outdeg"])
            hi = (nb_p > per_edge_own_p) | \
                 ((nb_p == per_edge_own_p) & (nb > per_edge_own_v))
            self.higher[p] = hi
            self.color[p] = np.full(n, _UNSET, dtype=np.int64)
            self.nbr_color[p] = np.full(len(nb), _UNSET, dtype=np.int64)
            w = np.zeros(n, dtype=np.int64)
            np.add.at(w, np.repeat(np.arange(n), s["outdeg"]), hi)
            self.wait[p] = w
            order = np.argsort(nb, kind="stable")
            self.sidx[p] = order
            self.ssorted[p] = nb[order]

    def _route_pairs(self, vids, vals):
        part = np.searchsorted(self.off, vids, side="right") - 1
        dest = self.p2a[part]
        order = np.argsort(dest, kind="stable")
        v, w = vids[order], vals[order]
        b = np.searchsorted(dest[order], np.arange(self.num_actors + 1))
        return [(v[b[j]:b[j + 1]], w[b[j]:b[j + 1]])
                if b[j + 1] > b[j] else None
                for j in range(self.num_actors)]

    def _announce(self, per_part: Dict[int, Tuple[np.ndarray, np.ndarray]]):
        """Emit (neighbor, colored_vid, color) triples for every edge
        leaving a just-colored vertex, routed to the neighbor's owner
        (three aligned arrays per target actor)."""
        vparts, idparts, cparts = [], [], []
        for p, (local, cols) in per_part.items():
            if local.size == 0:
                continue
            s = self.shards[p]
            indptr, indices = s["indptr"], s["indices"]
            starts, ends = indptr[local], indptr[local + 1]
            cnt = ends - starts
            tot = int(cnt.sum())
            if tot == 0:
                continue
            csum = np.concatenate([[0], np.cumsum(cnt)[:-1]])
            pos = np.repeat(starts - csum, cnt) + np.arange(tot)
            vparts.append(indices[pos])
            idparts.append(np.repeat(local + s["vid_lo"], cnt))
            cparts.append(np.repeat(cols, cnt))
        if not vparts:
            return [None] * self.num_actors
        nbr = np.concatenate(vparts)
        vid = np.concatenate(idparts)
        col = np.concatenate(cparts)
        part = np.searchsorted(self.off, nbr, side="right") - 1
        dest = self.p2a[part]
        order = np.argsort(dest, kind="stable")
        nbr, vid, col = nbr[order], vid[order], col[order]
        b = np.searchsorted(dest[order], np.arange(self.num_actors + 1))
        return [(nbr[b[j]:b[j + 1]], vid[b[j]:b[j + 1]],
                 col[b[j]:b[j + 1]]) if b[j + 1] > b[j] else None
                for j in range(self.num_actors)]

    def step(self, *incoming):
        """Apply (neighbor, colored_vid, color) announcements: fill the
        per-edge color cache, decrement waits for lower-priority
        receivers; then color every waiting-zero uncolored vertex with
        the mex of its HIGHER-priority neighbors' colors; announce.
        Returns A messages + (n_colored, n_uncolored_left)."""
        for msg in incoming:
            if msg is None:
                continue
            nbr, vid, col = msg
            for p in self.owned:
                s = self.shards[p]
                lo, hi_b = s["vid_lo"], s["vid_hi"]
                m = (nbr >= lo) & (nbr < hi_b)
                if not m.any():
                    continue
                sn, sv, sc = nbr[m], vid[m], col[m]
                left = np.searchsorted(self.ssorted[p], sv, "left")
                right = np.searchsorted(self.ssorted[p], sv, "right")
                cnt = right - left
                tot = int(cnt.sum())
                if tot == 0:
                    continue
                csum = np.concatenate([[0], np.cumsum(cnt)[:-1]])
                span = np.repeat(left - csum, cnt) + np.arange(tot)
                slot = self.sidx[p][span]
                rrow = np.repeat(sn - lo, cnt)
                rcol = np.repeat(sc, cnt)
                indptr = s["indptr"]
                inrow = (slot >= indptr[rrow]) & (slot < indptr[rrow + 1])
                slot, rrow, rcol = slot[inrow], rrow[inrow], rcol[inrow]
                fresh = self.nbr_color[p][slot] == _UNSET
                slot, rrow = slot[fresh], rrow[fresh]
                self.nbr_color[p][slot] = rcol[fresh]
                # decrement wait where the colored vid was HIGHER-prio
                dec = self.higher[p][slot]
                if dec.any():
                    np.subtract.at(self.wait[p], rrow[dec], 1)
        per_part: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        n_colored = 0
        left_total = 0
        for p in self.owned:
            s = self.shards[p]
            ready = (self.color[p] == _UNSET) & (self.wait[p] == 0)
            local = np.flatnonzero(ready)
            if local.size:
                indptr = s["indptr"]
                starts, ends = indptr[local], indptr[local + 1]
                cnt = ends - starts
                tot = int(cnt.sum())
                if tot:
                    csum = np.concatenate([[0], np.cumsum(cnt)[:-1]])
                    pos = np.repeat(starts - csum, cnt) + np.arange(tot)
                    row = np.repeat(np.arange(local.size), cnt)
                    use = self.higher[p][pos]
                    cols = self.nbr_color[p][pos]
                    mex = _segment_mex(cols[use], row[use], local.size)
                else:
                    mex = np.zeros(local.size, dtype=np.int64)
                self.color[p][local] = mex
                n_colored += int(local.size)
                per_part[p] = (local, mex)
            else:
                per_part[p] = (np.empty(0, dtype=np.int64),
                               np.empty(0, dtype=np.int64))
            left_total += int((self.color[p] == _UNSET).sum())
        msgs = self._announce(per_part) if n_colored else \
            [None] * self.num_actors
        return (*msgs, (n_colored, left_total))

    def result_tables(self):
        out = []
        for p in self.owned:
            lo = self.shards[p]["vid_lo"]
            c = self.color[p]
            out.append(pa.table({
                "part": pa.array(np.full(c.size, p, dtype=np.int32)),
                "vid": pa.array(np.arange(lo, lo + c.size,
                                          dtype=np.int64)),
                "color": pa.array(c),
            }))
        return out


def greedy_coloring(sym_edges, offsets: np.ndarray, workdir: str,
                    cfg: EngineConfig = DEFAULT, *, seed: int = 42,
                    max_iters: Optional[int] = None,
                    num_actors: int = 0,
                    shards_dir: Optional[str] = None
                    ) -> Tuple["rd.Dataset", Dict]:
    """Jones-Plassmann coloring over a SYMMETRIZED self-loop-free edge
    table.  Returns (ds(part, vid, color), info) — adjacent vertices
    always differ; info["n_colors"] is the palette size."""
    from .csr import build_csr_shards

    N = int(offsets[-1])
    num_parts = len(offsets) - 1
    max_iters = max_iters if max_iters is not None else max(
        cfg.max_iters, 64)
    descs = build_csr_shards(sym_edges, offsets,
                             shards_dir or f"{workdir}/csr_sym",
                             lineage={"kind": "sym"})
    paths = {dd["part"]: dd["path"] for dd in descs}
    owned = plan_actors(num_parts, num_actors)
    A = len(owned)
    p2a = part_to_actor_map(owned, num_parts)
    actors = [ColorShardActor.remote(i, owned[i], paths,
                                     np.asarray(offsets), p2a, A, seed)
              for i in range(A)]
    info: Dict = {"n": N, "seed": seed, "rounds": []}
    t0 = time.time()
    try:
        inbox = [[] for _ in range(A)]
        converged = False
        for rnd in range(max_iters):
            outs = [list(actors[j].step.options(num_returns=A + 1)
                         .remote(*inbox[j])) for j in range(A)]
            tails = ray.get([o[A] for o in outs])
            inbox = transpose_refs([o[:A] for o in outs])
            n_colored = sum(t[0] for t in tails)
            left = sum(t[1] for t in tails)
            info["rounds"].append({"round": rnd, "colored": int(n_colored),
                                   "left": int(left)})
            if left == 0:
                converged = True
                break
            if n_colored == 0:
                raise RuntimeError(
                    "coloring: stalled with uncolored vertices — "
                    "priority DAG inconsistency (self-loops present?)")
        if not converged:
            raise RuntimeError(
                f"coloring: not converged in {max_iters} rounds")
        tables = [t for ref in [a.result_tables.remote() for a in actors]
                  for t in ray.get(ref)]
    finally:
        for a in actors:
            ray.kill(a)
    info["num_rounds"] = len(info["rounds"])
    info["n_colors"] = int(max(
        (int(t.column("color").to_numpy().max()) for t in tables
         if t.num_rows), default=-1)) + 1
    info["wall_sec"] = round(time.time() - t0, 4)
    tables = [t for t in tables if t.num_rows] or [pa.schema(
        [pa.field("part", pa.int32()), pa.field("vid", pa.int64()),
         pa.field("color", pa.int64())]).empty_table()]
    return rd.from_arrow(tables), info
