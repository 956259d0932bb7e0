"""Densest-subgraph extraction (parallel greedy peeling) on the CSR
shard engine.

Bahmani, Kumar & Vassilvitskii 2012 ("Densest subgraph in streaming
and MapReduce"): repeatedly delete EVERY vertex whose residual degree
is at most 2(1+eps) times the current average density rho = |E|/|V|,
remembering the densest intermediate vertex set — a (2+2eps)
approximation of the densest subgraph in O(log n / eps) synchronous
rounds.  The web use case: dense link farms / collusion rings surface
as the maximum-density subgraph long before they dominate PageRank.

Engine shape: the k-core peeling machinery (graph/kcore.py) with a
global float threshold recomputed each round from two scalars (alive
vertex count, alive degree sum) — one extra tiny reduce per round.
Every vertex records its removal round, so the best snapshot is
recovered as {v : removal_round(v) >= best_round} without storing any
per-round vertex sets.  Deterministic in (edge set, eps):
tests/test_densest.py pins a sequential replay of the same rounds and
the planted-clique recovery property.

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


@ray.remote(num_cpus=0)
class DensestShardActor:
    def __init__(self, actor_idx: int, owned: List[int],
                 paths: Dict[int, str], offsets: np.ndarray,
                 part2actor: np.ndarray, num_actors: int):
        self.owned = owned
        self.num_actors = num_actors
        self.shards: Dict[int, Dict] = {}
        self.alive: Dict[int, np.ndarray] = {}
        self.deg: Dict[int, np.ndarray] = {}
        self.removed: Dict[int, np.ndarray] = {}
        for p in owned:
            s = dict(load_shard(paths[p]))
            dest = part2actor[s["udst_part"]]
            order = np.argsort(dest, kind="stable")
            s["route_order"] = order
            s["route_udsts"] = s["udsts"][order]
            s["route_bounds"] = np.searchsorted(
                dest[order], np.arange(num_actors + 1))
            self.shards[p] = s
            n = s["vid_hi"] - s["vid_lo"]
            self.alive[p] = np.ones(n, dtype=bool)
            self.deg[p] = s["outdeg"].astype(np.int64)
            self.removed[p] = np.full(n, -1, dtype=np.int64)

    def stats(self) -> Tuple[int, int]:
        """(alive vertices, alive degree sum = 2 x alive edges)."""
        v = 0
        d = 0
        for p in self.owned:
            v += int(self.alive[p].sum())
            d += int(self.deg[p][self.alive[p]].sum())
        return v, d

    def apply(self, *incoming) -> bool:
        """Subtract incoming decrement counts (must run BEFORE stats so
        the round's density sees the post-peel degrees)."""
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

    def peel_below(self, thresh: float, rnd: int):
        """Kill every alive vertex with residual degree <= thresh,
        stamping its removal round.  Returns A (vids, counts)
        decrement messages + n_dead."""
        per_v: List[List[np.ndarray]] = [[] for _ in range(self.num_actors)]
        per_c: List[List[np.ndarray]] = [[] for _ in range(self.num_actors)]
        n_dead = 0
        for p in self.owned:
            s = self.shards[p]
            dying = self.alive[p] & (self.deg[p] <= thresh)
            nd = int(dying.sum())
            if nd == 0:
                continue
            n_dead += nd
            self.alive[p] &= ~dying
            self.removed[p][dying] = rnd
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

    def result_tables(self, best_round: int):
        out = []
        for p in self.owned:
            lo = self.shards[p]["vid_lo"]
            r = self.removed[p]
            member = (r == -1) | (r >= best_round)
            out.append(pa.table({
                "part": pa.array(np.full(r.size, p, dtype=np.int32)),
                "vid": pa.array(np.arange(lo, lo + r.size,
                                          dtype=np.int64)),
                "removal_round": pa.array(r),
                "in_densest": pa.array(member),
            }))
        return out


def densest_subgraph(sym_edges, offsets: np.ndarray, workdir: str,
                     cfg: EngineConfig = DEFAULT, *, eps: float = 0.1,
                     max_iters: Optional[int] = None,
                     num_actors: int = 0,
                     shards_dir: Optional[str] = None
                     ) -> Tuple["rd.Dataset", Dict]:
    """(2+2eps)-approximate densest subgraph over a SYMMETRIZED
    self-loop-free edge table.  Returns (ds(part, vid, removal_round,
    in_densest), info) with info["best_density"] = |E(S)|/|S| of the
    returned set."""
    from .csr import build_csr_shards

    if eps <= 0:
        raise ValueError("eps must be > 0 (guarantees round progress)")
    N = int(offsets[-1])
    num_parts = len(offsets) - 1
    max_iters = max_iters if max_iters is not None else max(
        cfg.max_iters, 200)
    descs = build_csr_shards(sym_edges, offsets,
                             shards_dir or f"{workdir}/csr_sym",
                             lineage={"kind": "sym"})
    paths = {dd["part"]: dd["path"] for dd in descs}
    owned = plan_actors(num_parts, num_actors)
    A = len(owned)
    p2a = part_to_actor_map(owned, num_parts)
    actors = [DensestShardActor.remote(i, owned[i], paths,
                                       np.asarray(offsets), p2a, A)
              for i in range(A)]
    info: Dict = {"n": N, "eps": eps, "rounds": []}
    t0 = time.time()
    best_rho = -1.0
    best_round = 0
    try:
        inbox = [[] for _ in range(A)]
        for rnd in range(max_iters):
            ray.get([actors[j].apply.remote(*inbox[j]) for j in range(A)])
            stats = ray.get([a.stats.remote() for a in actors])
            v_alive = sum(s[0] for s in stats)
            e_alive = sum(s[1] for s in stats) / 2.0
            if v_alive == 0:
                break
            rho = e_alive / v_alive
            if rho > best_rho:
                best_rho = rho
                best_round = rnd
            thresh = 2.0 * (1.0 + eps) * rho
            outs = [list(actors[j].peel_below
                         .options(num_returns=A + 1)
                         .remote(thresh, rnd)) for j in range(A)]
            n_dead = sum(ray.get([o[A] for o in outs]))
            inbox = transpose_refs([o[:A] for o in outs])
            info["rounds"].append({"round": rnd, "alive": int(v_alive),
                                   "density": rho, "killed": int(n_dead)})
            if n_dead == 0:
                raise RuntimeError(
                    "densest: no vertex at or below 2(1+eps)*rho — "
                    "impossible for eps > 0")
        else:
            raise RuntimeError(
                f"densest: not converged in {max_iters} rounds")
        tables = [t for ref in [a.result_tables.remote(best_round)
                                for a in actors] for t in ray.get(ref)]
    finally:
        for a in actors:
            ray.kill(a)
    info["num_rounds"] = len(info["rounds"])
    info["best_round"] = int(best_round)
    info["best_density"] = float(best_rho)
    info["subgraph_size"] = int(sum(
        t.column("in_densest").to_numpy(zero_copy_only=False).sum()
        for t in tables))
    info["wall_sec"] = round(time.time() - t0, 4)
    tables = [t for t in tables if t.num_rows] or [pa.schema(
        [pa.field("part", pa.int32()), pa.field("vid", pa.int64()),
         pa.field("removal_round", pa.int64()),
         pa.field("in_densest", pa.bool_())]).empty_table()]
    return rd.from_arrow(tables), info
