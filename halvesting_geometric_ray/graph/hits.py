"""HITS (hubs & authorities) — the second classic link-analysis
iteration, on the same CSR-shard actor engine as PageRank.

    a'(u) = sum_{v -> u} h(v)          (authority: in-links from hubs)
    h'(v) = sum_{v -> u} a'(u)         (hub: out-links to authorities)
    normalize each vector to unit L2 every iteration

One iteration = two half-rounds on the shard actors:
  1. scatter: per-shard h-contributions pre-aggregated by unique
     destination (the PageRank combiner) -> exchange -> owners apply and
     produce the unnormalized a';
  2. gather-back: each shard queries a'(udsts) from the owners (the
     CC pointer-jump query/answer pattern) and reduces per-source to h'.
Global L2 norms are tiny driver-side reductions over per-actor partials.
Convergence: L1 delta of the normalized authority vector < tol.

Deterministic: actor layout is fixed by plan_actors, all reductions are
order-fixed float64 sums; matches the NumPy oracle to allclose 1e-6.

Convergence note: power iteration converges at the ratio of the top two
singular values — graphs with small spectral gaps (including the
synthetic fixtures) need many rounds at tol=1e-8; production use
typically fixes max_iters (~50).  Rounds here are barriered (5 actor
calls each, ~0.2 s/round at 600k vertices / 32 CPUs) — pipelining like
PageRank's single-call step is possible if HITS becomes a hot path.
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
from .engine import part_to_actor_map, plan_actors, scatter_refs_matrix, transpose_refs


@ray.remote(num_cpus=0)
class HitsShardActor:
    def __init__(self, actor_idx: int, owned: List[int], paths: Dict[int, str],
                 offsets: np.ndarray, part2actor: np.ndarray, num_actors: int):
        self.owned = owned
        self.off = offsets
        self._p2a = part2actor
        self.num_actors = num_actors
        self.shards: Dict[int, Dict] = {}
        self.h: Dict[int, np.ndarray] = {}
        self.a: Dict[int, np.ndarray] = {}
        for p in owned:
            s = dict(load_shard(paths[p]))
            dest = part2actor[s["udst_part"]]
            order = np.argsort(dest, kind="stable")
            s["route_order"] = order
            s["route_udsts"] = s["udsts"][order]
            s["route_bounds"] = np.searchsorted(dest[order],
                                                np.arange(num_actors + 1))
            self.shards[p] = s
            size = s["vid_hi"] - s["vid_lo"]
            n = float(offsets[-1])
            self.h[p] = np.full(size, 1.0 / np.sqrt(n), dtype=np.float64)
            self.a[p] = np.full(size, 1.0 / np.sqrt(n), dtype=np.float64)

    def _msgs_from_h(self):
        """Per-destination-actor (vids, sum of h over in-edges)."""
        per_v: List[List[np.ndarray]] = [[] for _ in range(self.num_actors)]
        per_s: List[List[np.ndarray]] = [[] for _ in range(self.num_actors)]
        for p in self.owned:
            s = self.shards[p]
            if s["indices"].size == 0:
                continue
            per_edge = np.repeat(self.h[p], s["outdeg"])
            sums = np.bincount(s["uinv"], weights=per_edge,
                               minlength=len(s["udsts"]))[s["route_order"]]
            b = s["route_bounds"]
            for j in range(self.num_actors):
                if b[j + 1] > b[j]:
                    per_v[j].append(s["route_udsts"][b[j]:b[j + 1]])
                    per_s[j].append(sums[b[j]:b[j + 1]])
        out = [(np.concatenate(per_v[j]), np.concatenate(per_s[j]))
               if per_v[j] else None for j in range(self.num_actors)]
        return tuple(out) if self.num_actors > 1 else out[0]

    def scatter(self):
        return self._msgs_from_h()

    def apply_auth(self, *incoming) -> float:
        """a_raw(u) = sum incoming h-contributions; returns sum(a_raw^2)
        partial for the global L2 norm."""
        sq = 0.0
        for p in self.owned:
            lo, hi = self.shards[p]["vid_lo"], self.shards[p]["vid_hi"]
            new = np.zeros(hi - lo, dtype=np.float64)
            for msg in incoming:
                if msg is None:
                    continue
                vids, vals = msg
                m = (vids >= lo) & (vids < hi)
                if m.any():
                    np.add.at(new, vids[m] - lo, vals[m])
            self.a[p] = new
            sq += float((new * new).sum())
        return sq

    def norm_auth(self, norm: float) -> float:
        """Normalize a, return L1 delta partial vs previous normalized a
        (kept by caller passing through prev snapshot)."""
        inv = 1.0 / norm if norm > 0 else 0.0
        delta = 0.0
        for p in self.owned:
            prev = getattr(self, "_a_prev", {}).get(p)
            new = self.a[p] * inv
            if prev is not None:
                delta += float(np.abs(new - prev).sum())
            else:
                delta = float("inf")
            self.a[p] = new
        self._a_prev = {p: self.a[p] for p in self.owned}
        return delta

    def auth_queries(self):
        """Distinct destination vids needed for the hub update, routed
        to their owning actor (CC's query/answer exchange pattern)."""
        allq = np.unique(np.concatenate(
            [self.shards[p]["udsts"] for p in self.owned
             if self.shards[p]["udsts"].size]
        )) if self.owned else np.empty(0, dtype=np.int64)
        if allq.size == 0:
            out = [None] * self.num_actors
            return tuple(out) if self.num_actors > 1 else out[0]
        part = (np.searchsorted(self.off, allq, side="right") - 1)
        dest = self._p2a[part]
        order = np.argsort(dest, kind="stable")
        q = allq[order]
        b = np.searchsorted(dest[order], np.arange(self.num_actors + 1))
        out = [q[b[j]:b[j + 1]] if b[j + 1] > b[j] else None
               for j in range(self.num_actors)]
        return tuple(out) if self.num_actors > 1 else out[0]

    def auth_answers(self, *queries):
        out = []
        for q in queries:
            if q is None:
                out.append(None)
                continue
            ans = np.empty(len(q), dtype=np.float64)
            for p in self.owned:
                lo, hi = self.shards[p]["vid_lo"], self.shards[p]["vid_hi"]
                m = (q >= lo) & (q < hi)
                if m.any():
                    ans[m] = self.a[p][q[m] - lo]
            out.append((q, ans))
        return tuple(out) if len(out) > 1 else out[0]

    def update_hubs(self, *answers) -> float:
        """h_raw(v) = sum over out-edges of a(dst); returns sum(h^2)."""
        if answers and any(x is not None for x in answers):
            qs = np.concatenate([x[0] for x in answers if x is not None])
            vs = np.concatenate([x[1] for x in answers if x is not None])
            order = np.argsort(qs)
            qs, vs = qs[order], vs[order]
        else:
            qs = np.empty(0, dtype=np.int64)
            vs = np.empty(0, dtype=np.float64)
        sq = 0.0
        for p in self.owned:
            s = self.shards[p]
            lo, hi = s["vid_lo"], s["vid_hi"]
            new = np.zeros(hi - lo, dtype=np.float64)
            if s["indices"].size and qs.size:
                a_of_udst = vs[np.searchsorted(qs, s["udsts"])]
                per_edge = a_of_udst[s["uinv"]]
                # per-source reduce over the CSR layout
                new = np.add.reduceat(
                    np.r_[per_edge, 0.0], np.minimum(s["indptr"][:-1],
                                                     len(per_edge)))
                new[s["outdeg"] == 0] = 0.0
            self.h[p] = new
            sq += float((new * new).sum())
        return sq

    def norm_hubs(self, norm: float) -> bool:
        inv = 1.0 / norm if norm > 0 else 0.0
        for p in self.owned:
            self.h[p] = self.h[p] * inv
        return True

    def write_out(self, paths: Dict[int, str]) -> bool:
        """Persist (vid, authority, hub) parquet per partition — results
        stay sharded on disk, never vertex-cardinality on the driver."""
        import pyarrow.parquet as pq

        for p, path in paths.items():
            lo, hi = self.shards[p]["vid_lo"], self.shards[p]["vid_hi"]
            t = pa.table({
                "vid": pa.array(np.arange(lo, hi, dtype=np.int64)),
                "authority": pa.array(self.a[p]),
                "hub": pa.array(self.h[p])})
            tmp = f"{path}.tmp"
            pq.write_table(t, tmp)
            import os

            os.replace(tmp, path)
        return True


def hits(edges, offsets: np.ndarray, cfg: EngineConfig = DEFAULT, *,
         tol: float = 1e-8, max_iters: int = 100,
         shards_dir: Optional[str] = None, workdir: str = "/tmp/hgr_hits",
         num_actors: int = 0) -> Tuple["rd.Dataset", Dict]:
    """HITS over the directed edge table.  Returns
    (ds(vid, authority, hub), info with per-iteration L1 deltas)."""
    from .csr import build_csr_shards

    N = int(offsets[-1])
    num_parts = len(offsets) - 1
    descs = build_csr_shards(edges, offsets, shards_dir or f"{workdir}/csr",
                             lineage={"kind": "directed"})
    paths = {dd["part"]: dd["path"] for dd in descs}
    owned = plan_actors(num_parts, num_actors)
    A = len(owned)
    p2a = part_to_actor_map(owned, num_parts)
    actors = [HitsShardActor.remote(i, owned[i], paths, offsets, p2a, A)
              for i in range(A)]
    info: Dict = {"iters": []}
    try:
        for k in range(1, max_iters + 1):
            t0 = time.time()
            inbox = transpose_refs(scatter_refs_matrix(actors, A))
            sq = sum(ray.get([a.apply_auth.remote(*inbox[j])
                              for j, a in enumerate(actors)]))
            a_norm = float(np.sqrt(sq))
            deltas = ray.get([a.norm_auth.remote(a_norm) for a in actors])
            q_inbox = transpose_refs(
                scatter_refs_matrix(actors, A, method="auth_queries"))
            ans = [list(actors[j].auth_answers.options(num_returns=A)
                        .remote(*q_inbox[j]))
                   if A > 1 else [actors[j].auth_answers.remote(*q_inbox[j])]
                   for j in range(A)]
            a_inbox = transpose_refs(ans)
            sqh = sum(ray.get([a.update_hubs.remote(*a_inbox[j])
                               for j, a in enumerate(actors)]))
            h_norm = float(np.sqrt(sqh))
            ray.get([a.norm_hubs.remote(h_norm) for a in actors])
            delta = float(sum(deltas))
            info["iters"].append({"iter": k, "a_delta_l1": delta,
                                  "wall_sec": round(time.time() - t0, 4)})
            if delta < tol:
                break
        import os

        out_dir = os.path.join(workdir, "hits_out")
        os.makedirs(out_dir, exist_ok=True)
        ray.get([a.write_out.remote(
            {p: os.path.join(out_dir, f"part-{p:05d}.parquet")
             for p in owned[i]}) for i, a in enumerate(actors)])
    finally:
        for a in actors:
            ray.kill(a)

    info["num_iters"] = len(info["iters"])
    info["converged"] = bool(info["iters"] and
                             info["iters"][-1]["a_delta_l1"] < tol)
    return rd.read_parquet(out_dir), info
