"""Full core decomposition: per-vertex coreness via h-index iteration.

coreness(v) = the largest k such that v belongs to the k-core — the
complete degeneracy profile in one run, where graph/kcore.py answers
membership for a single k.  Algorithm: Lü, Zhou, Zhang & Stanley 2016
("The H-index of a network node and its relation to degree and
coreness"): iterate

    h_0(v) = deg(v);   h_{t+1}(v) = H(h_t(u) : u ~ v)

where H is the h-index operator (the largest h such that at least h
neighbors have value >= h).  The sequence is monotone non-increasing
and converges EXACTLY to coreness in finitely many rounds (small on
web graphs — values collapse geometrically).

Engine shape: one actor round = apply incoming neighbor-value updates
to a per-EDGE value cache, recompute each owned vertex's h-index with
a segmented vectorized kernel (lexsort + position arithmetic — no
per-vertex loop), and DELTA-scatter only changed values (monotone
decrease => total update volume over the whole run is bounded by
sum(deg * value-drops), far below E x rounds).  Each shard holds one
float per edge (the cached neighbor values) plus an argsort of its
indices for O(log E) update routing — the same memory class as the CSR
itself.

Exactness: synchronous fixpoint of a deterministic operator —
partitioning/actor-layout independent; certified against the exact
Batagelj-Zaversnik peeling oracle in tests/test_coreness.py, and
consistent with graph/kcore.py by definition (coreness >= k iff v in
k-core).
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


def _segment_h_index(vals: np.ndarray, indptr: np.ndarray) -> np.ndarray:
    """Per-row h-index of a CSR-segmented value array: for each row,
    the largest h with >= h entries >= h.  Fully vectorized."""
    n_rows = len(indptr) - 1
    if len(vals) == 0:
        return np.zeros(n_rows, dtype=np.int64)
    row = np.repeat(np.arange(n_rows), np.diff(indptr))
    # sort within each row by value DESCENDING
    order = np.lexsort((-vals, row))
    v = vals[order]
    pos = np.arange(len(v)) - np.repeat(indptr[:-1], np.diff(indptr))
    rank = pos + 1                      # 1-based rank of each entry
    ok = v >= rank                      # candidate h values
    cand = np.where(ok, rank, 0)
    h = np.zeros(n_rows, dtype=np.int64)
    np.maximum.at(h, row, cand)         # rows absent stay 0
    return h


@ray.remote(num_cpus=0)
class CorenessShardActor:
    def __init__(self, actor_idx: int, owned: List[int],
                 paths: Dict[int, str], offsets: np.ndarray,
                 part2actor: np.ndarray, num_actors: int):
        self.idx = actor_idx
        self.owned = owned
        self.off = offsets
        self.p2a = part2actor
        self.num_actors = num_actors
        self.shards = {p: load_shard(paths[p]) for p in owned}
        self.h: Dict[int, np.ndarray] = {}
        self.nv: Dict[int, np.ndarray] = {}       # per-edge neighbor values
        self.sidx: Dict[int, np.ndarray] = {}     # argsort of indices
        self.ssorted: Dict[int, np.ndarray] = {}  # indices[sidx]
        for p in owned:
            s = self.shards[p]
            self.h[p] = s["outdeg"].astype(np.int64)  # h_0 = degree
            self.nv[p] = np.empty(len(s["indices"]), dtype=np.int64)
            order = np.argsort(s["indices"], kind="stable")
            self.sidx[p] = order
            self.ssorted[p] = s["indices"][order]

    def _route_pairs(self, vids: np.ndarray, vals: np.ndarray):
        part = np.searchsorted(self.off, vids, side="right") - 1
        dest = self.p2a[part]
        order = np.argsort(dest, kind="stable")
        v, w = vids[order], vals[order]
        b = np.searchsorted(dest[order], np.arange(self.num_actors + 1))
        return [(v[b[j]:b[j + 1]], w[b[j]:b[j + 1]])
                if b[j + 1] > b[j] else None
                for j in range(self.num_actors)]

    def _scatter(self, per_part_changed: Dict[int, np.ndarray]):
        """Push changed vertices' values to every neighbor's owner
        (dedup per (dst_part_owner, src) naturally: one row per
        (neighbor, src_value) unique pair via the shard's udsts)."""
        vparts, wparts = [], []
        for p, local in per_part_changed.items():
            if local.size == 0:
                continue
            s = self.shards[p]
            indptr, indices = s["indptr"], s["indices"]
            starts, ends = indptr[local], indptr[local + 1]
            cnt = ends - starts
            total = int(cnt.sum())
            if total == 0:
                continue
            csum = np.concatenate([[0], np.cumsum(cnt)[:-1]])
            pos = np.repeat(starts - csum, cnt) + np.arange(total)
            # message = (neighbor vid, sender vid, sender value); pack
            # sender+value? receiver needs sender id to locate edge
            # slots, so ship (nbr, sender) with the value via two cols:
            nbr = indices[pos]
            snd = np.repeat(local + s["vid_lo"], cnt)
            val = np.repeat(self.h[p][local], cnt)
            # route by neighbor owner; vals packed as (sender << 20 is
            # unsafe) — send parallel arrays instead
            part = np.searchsorted(self.off, nbr, side="right") - 1
            dest = self.p2a[part]
            order = np.argsort(dest, kind="stable")
            nbr, snd, val = nbr[order], snd[order], val[order]
            b = np.searchsorted(dest[order], np.arange(self.num_actors + 1))
            vparts.append((nbr, snd, val, b))
        if not vparts:
            return [None] * self.num_actors
        out = []
        for j in range(self.num_actors):
            chunks = [(n[b[j]:b[j + 1]], s2[b[j]:b[j + 1]],
                       v2[b[j]:b[j + 1]])
                      for (n, s2, v2, b) in vparts if b[j + 1] > b[j]]
            if not chunks:
                out.append(None)
            else:
                out.append((np.concatenate([c[0] for c in chunks]),
                            np.concatenate([c[1] for c in chunks]),
                            np.concatenate([c[2] for c in chunks])))
        return out

    def init_round(self):
        """Round 0: every vertex pushes its degree to all neighbors."""
        per = {p: np.arange(len(self.h[p]), dtype=np.int64)
               for p in self.owned}
        msgs = self._scatter(per)
        return (*msgs, 0)

    def step(self, *incoming):
        """Apply neighbor-value updates to the per-edge cache, recompute
        h-indices, delta-scatter the drops.  Returns A msgs + changed."""
        for msg in incoming:
            if msg is None:
                continue
            nbr, snd, val = msg
            for p in self.owned:
                s = self.shards[p]
                lo, hi = s["vid_lo"], s["vid_hi"]
                m = (nbr >= lo) & (nbr < hi)
                if not m.any():
                    continue
                # edge slots of vertex nbr whose other endpoint is snd:
                # the cache is indexed like `indices`; find positions of
                # (row=nbr-lo, indices==snd).  indices are only sorted
                # GLOBALLY per shard by value, so locate by sender id
                # then filter to the right rows via ownership of slots.
                sn, vv, rows = snd[m], val[m], nbr[m] - lo
                # positions of slots with indices == sender, restricted
                # to the row: per (row, sender) pair find the slice of
                # sorted-indices equal to sender, then intersect with
                # the row's indptr range
                indptr = s["indptr"]
                left = np.searchsorted(self.ssorted[p], sn, side="left")
                right = np.searchsorted(self.ssorted[p], sn, side="right")
                # expand each [left, right) run and keep slots lying in
                # the target row's [indptr[row], indptr[row+1]) range
                cnt = right - left
                tot = int(cnt.sum())
                if tot == 0:
                    continue
                csum = np.concatenate([[0], np.cumsum(cnt)[:-1]])
                span = np.repeat(left - csum, cnt) + np.arange(tot)
                slot = self.sidx[p][span]
                rrow = np.repeat(rows, cnt)
                rval = np.repeat(vv, cnt)
                inrow = (slot >= indptr[rrow]) & (slot < indptr[rrow + 1])
                self.nv[p][slot[inrow]] = rval[inrow]
        changed = 0
        per_changed: Dict[int, np.ndarray] = {}
        for p in self.owned:
            s = self.shards[p]
            new = _segment_h_index(self.nv[p], s["indptr"])
            ch = new < self.h[p]
            self.h[p] = np.where(ch, new, self.h[p])
            per_changed[p] = np.flatnonzero(ch)
            changed += int(ch.sum())
        msgs = self._scatter(per_changed) if changed else \
            [None] * self.num_actors
        return (*msgs, changed)

    def result_tables(self):
        out = []
        for p in self.owned:
            lo = self.shards[p]["vid_lo"]
            h = self.h[p]
            out.append(pa.table({
                "part": pa.array(np.full(h.size, p, dtype=np.int32)),
                "vid": pa.array(np.arange(lo, lo + h.size,
                                          dtype=np.int64)),
                "coreness": pa.array(h),
            }))
        return out


def coreness(sym_edges, offsets: np.ndarray, workdir: str,
             cfg: EngineConfig = DEFAULT, *,
             max_iters: Optional[int] = None,
             num_actors: int = 0,
             shards_dir: Optional[str] = None) -> Tuple["rd.Dataset",
                                                        Dict]:
    """Exact per-vertex core numbers over a SYMMETRIZED edge table
    (callers: graph.build.symmetrize first, drop_self_loops=True for
    standard coreness).  Returns (ds(part, vid, coreness), info)."""
    from .csr import build_csr_shards

    N = int(offsets[-1])
    num_parts = len(offsets) - 1
    max_iters = max_iters if max_iters is not None else max(cfg.max_iters,
                                                            N + 1)
    descs = build_csr_shards(sym_edges, offsets,
                             shards_dir or f"{workdir}/csr_sym",
                             lineage={"kind": "sym"})
    paths = {dd["part"]: dd["path"] for dd in descs}
    owned = plan_actors(num_parts, num_actors)
    A = len(owned)
    p2a = part_to_actor_map(owned, num_parts)
    actors = [CorenessShardActor.remote(i, owned[i], paths,
                                        np.asarray(offsets), p2a, A)
              for i in range(A)]
    info: Dict = {"n": N, "iters": []}
    t0 = time.time()
    try:
        outs = [list(a.init_round.options(num_returns=A + 1).remote())
                for a in actors]
        inbox = transpose_refs([o[:A] for o in outs])
        converged = False
        for k in range(1, max_iters + 1):
            outs = [list(actors[j].step.options(num_returns=A + 1)
                         .remote(*inbox[j])) for j in range(A)]
            changed = sum(ray.get([o[A] for o in outs]))
            inbox = transpose_refs([o[:A] for o in outs])
            info["iters"].append({"iter": k, "changed": int(changed)})
            if changed == 0:
                converged = True
                break
        if not converged:
            raise RuntimeError(
                f"coreness: no convergence in {max_iters} rounds")
        tables = [t for ref in [a.result_tables.remote() for a in actors]
                  for t in ray.get(ref)]
    finally:
        for a in actors:
            ray.kill(a)
    info["num_iters"] = len(info["iters"])
    info["wall_sec"] = round(time.time() - t0, 4)
    tables = [t for t in tables if t.num_rows] or [pa.schema(
        [pa.field("part", pa.int32()), pa.field("vid", pa.int64()),
         pa.field("coreness", pa.int64())]).empty_table()]
    return rd.from_arrow(tables), info
