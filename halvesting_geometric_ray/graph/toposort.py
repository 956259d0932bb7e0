"""Topological levels of a DAG on the CSR shard engine.

level(v) = length of the longest path from any source (in-degree-0
vertex) to v — the canonical parallel schedule of a dependency DAG and
the layer index of the SCC condensation (graph/scc.py::condensation):
level-k vertices depend only on levels < k, so each level is a maximal
batch that can run concurrently.

Synchronous Kahn peeling, one fused actor call per round (graph/bfs.py
cadence): round k assigns level k to every active vertex whose
remaining in-degree is zero, then sends per-unique-neighbor decrements
along its out-edges.  In-degrees are initialized with ONE exchange of
the per-shard unique-destination counts (the udsts/uinv combiner the
CSR shards already carry).  Total work is O(E + V·rounds_overhead);
round count = DAG depth (longest path length + 1).

Exactness: the peel order is a fixpoint of monotone counters —
partitioning/actor-layout independent (tests/test_toposort.py pins a
longest-path oracle and layout invariance).  A graph with a cycle never
drains: the run raises ValueError naming the number of stuck vertices
(run strongly_connected_components + condensation first; that is the
q_toposort_urls pipeline).
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

_UNSET = np.int64(-1)


@ray.remote(num_cpus=0)
class LevelShardActor:
    def __init__(self, actor_idx: int, owned: List[int],
                 paths: Dict[int, str], offsets: np.ndarray,
                 part2actor: np.ndarray, num_actors: int):
        self.idx = actor_idx
        self.owned = owned
        self.off = offsets
        self.p2a = part2actor
        self.num_actors = num_actors
        self.shards = {p: load_shard(paths[p]) for p in owned}
        self.level: Dict[int, np.ndarray] = {}
        self.indeg: Dict[int, np.ndarray] = {}
        for p in owned:
            n = self.shards[p]["vid_hi"] - self.shards[p]["vid_lo"]
            self.level[p] = np.full(n, _UNSET, dtype=np.int64)
            self.indeg[p] = np.zeros(n, dtype=np.int64)

    def _route_pairs(self, vids: np.ndarray, vals: np.ndarray):
        part = np.searchsorted(self.off, vids, side="right") - 1
        dest = self.p2a[part]
        order = np.argsort(dest, kind="stable")
        v, w = vids[order], vals[order]
        b = np.searchsorted(dest[order], np.arange(self.num_actors + 1))
        return [(v[b[j]:b[j + 1]], w[b[j]:b[j + 1]])
                if b[j + 1] > b[j] else None
                for j in range(self.num_actors)]

    def indeg_scatter(self):
        """Per-unique-destination edge counts of my shards, routed to
        the destination's owner (the CSR udsts/uinv combiner)."""
        vparts, cparts = [], []
        for p in self.owned:
            s = self.shards[p]
            if s["udsts"].size == 0:
                continue
            vparts.append(s["udsts"])
            cparts.append(np.bincount(s["uinv"],
                                      minlength=len(s["udsts"]))
                          .astype(np.int64))
        if not vparts:
            return tuple([None] * self.num_actors) if self.num_actors > 1 \
                else None
        out = self._route_pairs(np.concatenate(vparts),
                                np.concatenate(cparts))
        return tuple(out) if self.num_actors > 1 else out[0]

    def indeg_apply(self, *incoming) -> bool:
        for msg in incoming:
            if msg is None:
                continue
            vids, cnts = msg
            for p in self.owned:
                lo = self.shards[p]["vid_lo"]
                hi = self.shards[p]["vid_hi"]
                m = (vids >= lo) & (vids < hi)
                if m.any():
                    np.add.at(self.indeg[p], vids[m] - lo, cnts[m])
        return True

    def peel(self, k: int, *incoming):
        """Apply round-(k-1) decrements, assign level k to active
        zero-indeg vertices, emit their out-edge decrements.  Returns
        num_actors messages + (n_leveled, n_active_after)."""
        for msg in incoming:
            if msg is None:
                continue
            vids, cnts = msg
            for p in self.owned:
                lo = self.shards[p]["vid_lo"]
                hi = self.shards[p]["vid_hi"]
                m = (vids >= lo) & (vids < hi)
                if m.any():
                    np.subtract.at(self.indeg[p], vids[m] - lo, cnts[m])
        vparts, cparts = [], []
        leveled = 0
        active = 0
        for p in self.owned:
            s = self.shards[p]
            unset = self.level[p] == _UNSET
            hit = unset & (self.indeg[p] <= 0)
            local = np.flatnonzero(hit)
            if local.size:
                self.level[p][local] = k
                leveled += int(local.size)
                indptr, indices = s["indptr"], s["indices"]
                starts, ends = indptr[local], indptr[local + 1]
                cnt = ends - starts
                total = int(cnt.sum())
                if total:
                    csum = np.concatenate([[0], np.cumsum(cnt)[:-1]])
                    pos = np.repeat(starts - csum, cnt) + np.arange(total)
                    nbrs = indices[pos]
                    uv, uc = np.unique(nbrs, return_counts=True)
                    vparts.append(uv)
                    cparts.append(uc.astype(np.int64))
            active += int(unset.sum()) - int(local.size)
        if vparts:
            msgs = self._route_pairs(np.concatenate(vparts),
                                     np.concatenate(cparts))
        else:
            msgs = [None] * self.num_actors
        return (*msgs, (leveled, active))

    def result_tables(self):
        out = []
        for p in self.owned:
            lo = self.shards[p]["vid_lo"]
            lv = self.level[p]
            out.append(pa.table({
                "part": pa.array(np.full(lv.size, p, dtype=np.int32)),
                "vid": pa.array(np.arange(lo, lo + lv.size,
                                          dtype=np.int64)),
                "level": pa.array(lv),
            }))
        return out


def topological_levels(edges, offsets: np.ndarray, workdir: str,
                       cfg: EngineConfig = DEFAULT, *,
                       num_actors: int = 0,
                       shards_dir: Optional[str] = None,
                       lineage: Optional[Dict] = None
                       ) -> Tuple["rd.Dataset", Dict]:
    """Longest-path levels of a DIRECTED ACYCLIC edge table (src, dst).
    Returns (ds(part, vid, level), info); every vid in [0, offsets[-1])
    appears (isolated vertices are level 0).  Raises ValueError if the
    graph has a cycle (the stuck-vertex count is reported).
    """
    from .csr import build_csr_shards

    N = int(offsets[-1])
    num_parts = len(offsets) - 1
    descs = build_csr_shards(edges, offsets,
                             shards_dir or f"{workdir}/csr",
                             lineage=lineage or {"kind": "directed"})
    paths = {dd["part"]: dd["path"] for dd in descs}

    owned = plan_actors(num_parts, num_actors)
    A = len(owned)
    p2a = part_to_actor_map(owned, num_parts)
    actors = [LevelShardActor.remote(i, owned[i], paths,
                                     np.asarray(offsets), p2a, A)
              for i in range(A)]
    info: Dict = {"n": N, "rounds": []}
    t0 = time.time()
    try:
        deg_out = [list(a.indeg_scatter.options(num_returns=A).remote())
                   if A > 1 else [a.indeg_scatter.remote()] for a in actors]
        deg_inbox = transpose_refs(deg_out)
        ray.get([a.indeg_apply.remote(*deg_inbox[j])
                 for j, a in enumerate(actors)])
        inbox = [[] for _ in range(A)]
        for k in range(N + 1):
            outs = [list(actors[j].peel.options(num_returns=A + 1)
                         .remote(k, *inbox[j])) for j in range(A)]
            tails = ray.get([o[A] for o in outs])
            inbox = transpose_refs([o[:A] for o in outs])
            leveled = sum(t[0] for t in tails)
            active = sum(t[1] for t in tails)
            info["rounds"].append({"level": k, "n": int(leveled)})
            if active == 0 and leveled >= 0 and \
                    sum(r["n"] for r in info["rounds"]) >= N:
                break
            if leveled == 0:
                raise ValueError(
                    f"topological_levels: graph has a cycle — {active} "
                    "vertices never reach in-degree 0 (condense SCCs "
                    "first: graph/scc.py::condensation)")
        tables = [t for ref in [a.result_tables.remote() for a in actors]
                  for t in ray.get(ref)]
    finally:
        for a in actors:
            ray.kill(a)
    info["depth"] = len(info["rounds"]) - 1
    info["wall_sec"] = round(time.time() - t0, 4)
    tables = [t for t in tables if t.num_rows] or [pa.schema(
        [pa.field("part", pa.int32()), pa.field("vid", pa.int64()),
         pa.field("level", pa.int64())]).empty_table()]
    return rd.from_arrow(tables), info
