"""k-core extraction: iterative degree peeling on the CSR shard engine.

The k-core of an undirected graph is the maximal subgraph in which every
vertex has degree >= k — the classic density filter for link-graph
cleanup (spam farms and boilerplate nav rings fall out of low cores;
cf. Batagelj & Zaversnik, "An O(m) Algorithm for Cores Decomposition of
Networks", 2003, for the sequential peeling this distributes).

Algorithm (synchronous peeling over the SYMMETRIZED edge table, same
shard layout as connected components):

  deg(v)  <- degree among currently-alive vertices (init: full degree)
  repeat: kill every alive v with deg(v) < k; for each edge (u, v) with
          u newly killed, send v a decrement; apply decrements;
  until no vertex dies in a round.

Each round is two barriered actor calls (peel -> apply).  Death is
monotone — a vertex never revives — so the fixpoint is exactly the
k-core regardless of partitioning, and the round count is bounded by
the longest peeling chain (degeneracy ordering depth), typically a few
dozen on web graphs.  Decrement messages are per-unique-destination
counts (bincount over the shard's udsts), so a round's exchange is
bounded by the number of distinct neighbors of the dying set, not edge
multiplicity.

Reference conformance anchor: the reference keeps only a cleaned vertex
set before building its graph (halvesting_geometric/utils/data/
link_prediction_metadata.py:193-253); k-core is the standard web-scale
generalization of that clean-set filtering, certified here against an
exact single-process peeling oracle (tests/test_kcore.py).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..config import DEFAULT, EngineConfig
from .csr import load_shard
from .engine import part_to_actor_map, plan_actors, transpose_refs


@ray.remote(num_cpus=0)
class KCoreShardActor:
    def __init__(self, actor_idx: int, owned: List[int], paths: Dict[int, str],
                 offsets: np.ndarray, part2actor: np.ndarray, num_actors: int):
        self.owned = owned
        self.num_actors = num_actors
        self.shards: Dict[int, Dict] = {}
        self.alive: Dict[int, np.ndarray] = {}
        self.deg: Dict[int, np.ndarray] = {}
        for p in owned:
            s = dict(load_shard(paths[p]))
            dest = part2actor[s["udst_part"]]
            order = np.argsort(dest, kind="stable")
            s["route_order"] = order
            s["route_udsts"] = s["udsts"][order]
            s["route_bounds"] = np.searchsorted(dest[order],
                                                np.arange(num_actors + 1))
            self.shards[p] = s
            n = s["vid_hi"] - s["vid_lo"]
            self.alive[p] = np.ones(n, dtype=bool)
            self.deg[p] = s["outdeg"].astype(np.int64)

    def peel(self, k: int):
        """Kill every alive vertex with deg < k; emit per-destination
        (vids, decrement counts) for the edges leaving the dying set.
        Returns A messages + the number of newly killed vertices."""
        per_v: List[List[np.ndarray]] = [[] for _ in range(self.num_actors)]
        per_c: List[List[np.ndarray]] = [[] for _ in range(self.num_actors)]
        n_dead = 0
        for p in self.owned:
            s = self.shards[p]
            dying = self.alive[p] & (self.deg[p] < k)
            nd = int(dying.sum())
            if nd == 0:
                continue
            n_dead += nd
            self.alive[p] &= ~dying
            if s["indices"].size:
                per_edge = np.repeat(dying, s["outdeg"])
                if per_edge.any():
                    cnt = np.bincount(s["uinv"][per_edge],
                                      minlength=len(s["udsts"]))
                    cnt = cnt[s["route_order"]]
                    b = s["route_bounds"]
                    for j in range(self.num_actors):
                        seg = cnt[b[j]:b[j + 1]]
                        nz = seg > 0
                        if nz.any():
                            per_v[j].append(
                                s["route_udsts"][b[j]:b[j + 1]][nz])
                            per_c[j].append(seg[nz])
        msgs = [(np.concatenate(per_v[j]), np.concatenate(per_c[j]))
                if per_v[j] else None for j in range(self.num_actors)]
        return (*msgs, n_dead)

    def apply(self, *incoming) -> bool:
        """Subtract the decrement counts from owned vertices' degrees."""
        for p in self.owned:
            lo, hi = self.shards[p]["vid_lo"], self.shards[p]["vid_hi"]
            for msg in incoming:
                if msg is None:
                    continue
                vids, cnts = msg
                m = (vids >= lo) & (vids < hi)
                if m.any():
                    np.subtract.at(self.deg[p], vids[m] - lo, cnts[m])
        return True

    def write_out(self, paths: Dict[int, str]) -> int:
        """Persist (vid, in_kcore, degree) per partition; degree is the
        residual degree WITHIN the core for surviving vertices."""
        import pyarrow.parquet as pq

        n_core = 0
        for p, path in paths.items():
            lo, hi = self.shards[p]["vid_lo"], self.shards[p]["vid_hi"]
            t = pa.table({
                "vid": pa.array(np.arange(lo, hi, dtype=np.int64)),
                "in_kcore": pa.array(self.alive[p]),
                "core_degree": pa.array(
                    np.where(self.alive[p], self.deg[p], 0)),
            })
            n_core += int(self.alive[p].sum())
            tmp = f"{path}.tmp"
            pq.write_table(t, tmp)
            os.replace(tmp, path)
        return n_core


def k_core(sym_edges, offsets: np.ndarray, k: int, workdir: str,
           cfg: EngineConfig = DEFAULT, *, max_iters: int = 10_000,
           shards_dir: Optional[str] = None,
           num_actors: int = 0) -> Tuple["rd.Dataset", Dict]:
    """k-core membership over a SYMMETRIZED edge table (callers: use
    graph.build.symmetrize first, as for connected_components).

    Returns (ds(vid, in_kcore, core_degree), info) with per-round death
    counts.  Results stay sharded on disk — vertex-cardinality state
    never lands on the driver."""
    from .csr import build_csr_shards

    num_parts = len(offsets) - 1
    descs = build_csr_shards(sym_edges, offsets,
                             shards_dir or f"{workdir}/csr_sym",
                             lineage={"kind": "sym"})
    paths = {dd["part"]: dd["path"] for dd in descs}
    owned = plan_actors(num_parts, num_actors)
    A = len(owned)
    p2a = part_to_actor_map(owned, num_parts)
    actors = [KCoreShardActor.remote(i, owned[i], paths, offsets, p2a, A)
              for i in range(A)]
    info: Dict = {"k": k, "iters": []}
    try:
        for it in range(1, max_iters + 1):
            outs = [list(a.peel.options(num_returns=A + 1).remote(k))
                    for a in actors]
            inbox = transpose_refs([o[:A] for o in outs])
            n_dead = int(sum(ray.get([o[A] for o in outs])))
            ray.get([a.apply.remote(*inbox[j])
                     for j, a in enumerate(actors)])
            info["iters"].append({"iter": it, "killed": n_dead})
            if n_dead == 0:
                break
        out_dir = os.path.join(workdir, f"kcore_{k}")
        os.makedirs(out_dir, exist_ok=True)
        counts = ray.get([a.write_out.remote(
            {p: os.path.join(out_dir, f"part-{p:05d}.parquet")
             for p in owned[i]}) for i, a in enumerate(actors)])
    finally:
        for a in actors:
            ray.kill(a)
    info["num_iters"] = len(info["iters"])
    info["core_size"] = int(sum(counts))
    return rd.read_parquet(out_dir), info
