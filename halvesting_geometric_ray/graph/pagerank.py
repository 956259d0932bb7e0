"""PageRank as iterative gather-scatter rounds over CSR shard actors.

Semantic anchor: the reference's GNN message-passing loop — rounds of
gather-from-neighbors / aggregate / update over edge_index
(reference halvesting_geometric/modules/sage.py:56-82) — of which
PageRank is the deterministic special case:

    r' = (1-d)/N + d * (sum_in r_u / outdeg_u + dangling_mass / N)
    iterate until  ||r' - r||_1 < tol

Execution model (see graph/engine.py for why the inner loop is an actor
pool rather than per-round Dataset pipelines): a pool of shard actors,
each pinning its partitions' CSR shards and rank vectors across rounds.

One round =
  scatter: per shard, contributions r/outdeg pre-aggregated by UNIQUE
           destination via the shard's precomputed (udsts, uinv)
           factorization — one bincount per shard, exchange volume
           bounded by unique dsts (not E), routed per destination actor;
  exchange: ``num_returns=A`` object refs — each gather pulls only its
           slice through the (distributed) object store;
  gather:  sum incoming, apply damping + dangling mass, write the
           per-partition (rank, delta) checkpoint parquet atomically.

The dangling mass is a global scalar folded into each round's driver
reduction (each actor returns its partial for the NEXT round).  All
reductions are order-free float64 sums, so results are reproducible
under any partitioning to ~1e-12 noise — compared to the NumPy oracle
with allclose(atol=1e-6) as BASELINE.md specifies.

Checkpoint/resume: every iteration persists per-partition state+delta
with a lineage manifest (state/checkpoint.py).  Resume loads the last
complete iteration; partition files of a torn in-flight iteration are
REUSED (loaded as that partition's post-iteration state, compute+write
skipped) — mid-iteration resume per the north rule.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..config import DEFAULT, EngineConfig
from ..state.checkpoint import IterativeCheckpoint
from .csr import load_shard
from .engine import part_to_actor_map, plan_actors, scatter_refs_matrix, transpose_refs


@ray.remote(num_cpus=0)
class RankShardActor:
    """Owns a set of partitions: their CSR shards + rank vectors.

    num_cpus=0: rounds are short numpy bursts coordinated by the driver;
    reserving whole CPUs would starve any concurrent Dataset stages (on
    a real cluster, use .options(scheduling_strategy="SPREAD"))."""

    def __init__(self, actor_idx: int, owned: List[int], paths: Dict[int, str],
                 offsets: np.ndarray, part2actor: np.ndarray, num_actors: int,
                 n_vertices: int, damping: float):
        self.idx = actor_idx
        self.owned = owned
        self.off = offsets
        self.num_actors = num_actors
        self.N = n_vertices
        self.d = damping
        self.shards: Dict[int, Dict] = {}
        self.r: Dict[int, np.ndarray] = {}
        for p in owned:
            s = dict(load_shard(paths[p]))
            # routing: group unique dsts by destination actor, once
            dest = part2actor[s["udst_part"]]
            order = np.argsort(dest, kind="stable")
            s["route_order"] = order
            s["route_udsts"] = s["udsts"][order]
            s["route_bounds"] = np.searchsorted(dest[order],
                                                np.arange(num_actors + 1))
            self.shards[p] = s
            size = s["vid_hi"] - s["vid_lo"]
            self.r[p] = np.full(size, 1.0 / n_vertices, dtype=np.float64)

    def load_state(self, files: Dict[int, str]) -> bool:
        for p, path in files.items():
            t = pq.read_table(path, columns=["vid", "rank"])
            vid = t.column("vid").to_numpy()
            rank = t.column("rank").to_numpy()
            lo = self.shards[p]["vid_lo"]
            r = np.zeros_like(self.r[p])
            r[vid - lo] = rank
            self.r[p] = r
        return True

    def dangling(self) -> float:
        dm = 0.0
        for p in self.owned:
            dm += float(self.r[p][self.shards[p]["outdeg"] == 0].sum())
        return dm

    def scatter(self):
        """Returns num_actors objects; object j = (vids, vals) destined to
        actor j, pre-aggregated by unique destination per shard."""
        per_dest_v: List[List[np.ndarray]] = [[] for _ in range(self.num_actors)]
        per_dest_s: List[List[np.ndarray]] = [[] for _ in range(self.num_actors)]
        for p in self.owned:
            s = self.shards[p]
            if s["indices"].size == 0:
                continue
            outdeg = s["outdeg"]
            with np.errstate(divide="ignore", invalid="ignore"):
                src_r = np.where(outdeg > 0, self.r[p] / np.maximum(outdeg, 1), 0.0)
            per_edge = np.repeat(src_r, outdeg)
            sums = np.bincount(s["uinv"], weights=per_edge,
                               minlength=len(s["udsts"]))[s["route_order"]]
            b = s["route_bounds"]
            for j in range(self.num_actors):
                if b[j + 1] > b[j]:
                    per_dest_v[j].append(s["route_udsts"][b[j]:b[j + 1]])
                    per_dest_s[j].append(sums[b[j]:b[j + 1]])
        out = []
        for j in range(self.num_actors):
            if per_dest_v[j]:
                out.append((np.concatenate(per_dest_v[j]),
                            np.concatenate(per_dest_s[j])))
            else:
                out.append(None)
        return tuple(out) if self.num_actors > 1 else out[0]

    def gather(self, k: int, dm: float, ckpt_paths: Dict[int, str],
               reuse: Dict[int, str], *incoming):
        """Apply one round.  `reuse` maps part -> existing checkpoint file
        of THIS iteration (torn run) to adopt instead of recomputing."""
        l1 = 0.0
        dm_next = 0.0
        contrib: Dict[int, np.ndarray] = {
            p: np.zeros_like(self.r[p]) for p in self.owned}
        for msg in incoming:
            if msg is None:
                continue
            vids, vals = msg
            for p in self.owned:
                lo, hi = self.shards[p]["vid_lo"], self.shards[p]["vid_hi"]
                m = (vids >= lo) & (vids < hi)
                if m.any():
                    np.add.at(contrib[p], vids[m] - lo, vals[m])
        for p in self.owned:
            s = self.shards[p]
            lo, hi = s["vid_lo"], s["vid_hi"]
            if p in reuse:
                t = pq.read_table(reuse[p], columns=["vid", "rank", "delta"])
                new = np.zeros(hi - lo)
                new[t.column("vid").to_numpy() - lo] = t.column("rank").to_numpy()
                l1 += float(t.column("delta").to_numpy().sum())
            else:
                new = (1.0 - self.d) / self.N + self.d * (contrib[p] + dm / self.N)
                delta = np.abs(new - self.r[p])
                l1 += float(delta.sum())
                out = pa.table({
                    "part": pa.array(np.full(hi - lo, p, dtype=np.int32)),
                    "vid": pa.array(np.arange(lo, hi, dtype=np.int64)),
                    "rank": pa.array(new),
                    "outdeg": pa.array(s["outdeg"].astype(np.int64)),
                    "delta": pa.array(delta),
                })
                IterativeCheckpoint.write_part(out, ckpt_paths[p])
            self.r[p] = new
            dm_next += float(new[s["outdeg"] == 0].sum())
        return l1, dm_next


def pagerank(edges, offsets: np.ndarray, workdir: str,
             cfg: EngineConfig = DEFAULT, *,
             damping: Optional[float] = None, tol: Optional[float] = None,
             max_iters: Optional[int] = None, job: str = "pagerank",
             resume: bool = True, lineage: Optional[Dict] = None,
             shards_dir: Optional[str] = None,
             num_actors: int = 0) -> Tuple["rd.Dataset", Dict]:
    """Run PageRank over the edge table.  Returns (ranks_ds, info):
    ranks_ds has columns (part, vid, rank); info carries per-iteration
    metrics (l1, dangling mass, wall) and resume provenance."""
    from .csr import build_csr_shards

    d = cfg.damping if damping is None else damping
    tol = cfg.pagerank_tol if tol is None else tol
    max_iters = cfg.max_iters if max_iters is None else max_iters
    N = int(offsets[-1])
    num_parts = len(offsets) - 1

    descs = build_csr_shards(edges, offsets, shards_dir or f"{workdir}/csr")
    paths = {dd["part"]: dd["path"] for dd in descs}

    ckpt = IterativeCheckpoint(
        workdir, job,
        lineage or {"algo": "pagerank", "n": N, "parts": num_parts,
                    "d": d, "tol": tol})

    def ranks_ds(k: int):
        return (rd.read_parquet(ckpt.state_files(k))
                .select_columns(["part", "vid", "rank"]))

    k0 = ckpt.latest_complete() if resume else None
    info: Dict = {"resumed_from": k0, "iters": list(ckpt.metrics_history()) if k0 else []}
    if k0 is not None and info["iters"] and info["iters"][-1]["l1"] < tol:
        info["num_iters"] = len(info["iters"])
        info["converged"] = True
        return ranks_ds(k0), info

    owned = plan_actors(num_parts, num_actors)
    A = len(owned)
    p2a = part_to_actor_map(owned, num_parts)
    actors = [RankShardActor.remote(i, owned[i], paths, offsets, p2a, A, N, d)
              for i in range(A)]
    try:
        if k0 is not None:
            files = {p: ckpt.part_path(k0, p) for p in range(num_parts)}
            ray.get([a.load_state.remote({p: files[p] for p in owned[i]})
                     for i, a in enumerate(actors)])
            start = k0 + 1
        else:
            start = 1
        dm = sum(ray.get([a.dangling.remote() for a in actors]))

        last_k = k0 or 0
        for k in range(start, max_iters + 1):
            t0 = time.time()
            reuse_all = ckpt.have_parts(k) if resume else set()
            sc = scatter_refs_matrix(actors, A)
            inbox = transpose_refs(sc)
            gr = []
            for j, a in enumerate(actors):
                ck = {p: ckpt.part_path(k, p) for p in owned[j]}
                ru = {p: ckpt.part_path(k, p) for p in owned[j] if p in reuse_all}
                gr.append(a.gather.remote(k, dm, ck, ru, *inbox[j]))
            parts_res = ray.get(gr)
            l1 = float(sum(r[0] for r in parts_res))
            dm = float(sum(r[1] for r in parts_res))
            metrics = {"iter": k, "l1": l1, "dangling_mass": dm,
                       "wall_sec": time.time() - t0}
            ckpt.commit_iter(k, metrics, list(range(num_parts)))
            info["iters"].append(metrics)
            last_k = k
            if l1 < tol:
                break
    finally:
        for a in actors:
            ray.kill(a)

    info["num_iters"] = len(info["iters"])
    info["converged"] = bool(info["iters"] and info["iters"][-1]["l1"] < tol)
    info["final_iter"] = last_k
    return ranks_ds(last_k), info
