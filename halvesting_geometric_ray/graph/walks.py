"""Distributed random walks (DeepWalk-style, optional restart) on the
CSR shard-actor engine.

The corpus-generation analogue of the reference's neighbor-sampling
loader workers (reference link_prediction_datamodule.py:147-191): where
the GNN loader draws k-hop neighborhoods per seed batch, embedding
pipelines (DeepWalk/PinSage) need millions of fixed-length random walks
as training sentences.  Walkers are plain (walk_id, start, cur) arrays
routed between shard actors each hop — the owner of the current vertex
advances the walker one step and records the visit locally; nothing per
walk ever exists on the driver.

Determinism at any scale: the next-neighbor draw is a STATELESS hash
``splitmix64(walk_id, step, seed)`` — no RNG state, so the walk set is
bitwise identical under any partitioning / actor count, resumable by
construction, and any single walk can be re-derived locally for audit.
(Same trick as ops/sample.py's hash-score sampling.)

Semantics per step from vertex v:
- with probability ``restart_prob``: jump back to the walk's start
  vertex (PPR-style restart walks);
- else, if out-degree(v) == 0: the walk ENDS (recorded length < len);
- else move to a uniform random out-neighbor.

node2vec p/q biasing needs the previous vertex's neighbor set per step
— that second-order variant lives in graph/node2vec.py (rejection
sampling, two routed hops per attempt); this module stays the
zero-rejection fast path for DeepWalk and PPR-sampling corpora.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..config import DEFAULT, EngineConfig
from .anf import splitmix64
from .csr import load_shard
from .engine import part_to_actor_map, plan_actors

_FNV = np.uint64(1099511628211)


def _draw(wid: np.ndarray, t: int, seed: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return splitmix64(wid.astype(np.uint64) * _FNV + np.uint64(t), seed)


@ray.remote(num_cpus=0)
class WalkShardActor:
    def __init__(self, actor_idx: int, owned: List[int], paths: Dict[int, str],
                 offsets: np.ndarray, part2actor: np.ndarray, num_actors: int,
                 seed: int, walk_len: int, restart_prob: float):
        self.owned = owned
        self.off = offsets
        self.p2a = part2actor
        self.A = num_actors
        self.seed = seed
        self.walk_len = walk_len
        self.restart = float(restart_prob)
        self.shards = {p: load_shard(paths[p]) for p in owned}
        self.visits: List[Tuple[np.ndarray, int, np.ndarray]] = []

    def step(self, t: int, *incoming):
        """Advance round-t arrivals: record the visit (wid, t, cur), then
        emit (wid, start, next) routed by the owner of next.  Returns A
        messages + alive count."""
        wids, starts, curs = [], [], []
        for msg in incoming:
            if msg is None:
                continue
            w, s, c = msg
            wids.append(w)
            starts.append(s)
            curs.append(c)
        if not wids:
            return (*[None] * self.A, 0)
        wid = np.concatenate(wids)
        start = np.concatenate(starts)
        cur = np.concatenate(curs)
        self.visits.append((wid, t, cur))
        if t >= self.walk_len - 1:
            return (*[None] * self.A, 0)

        nxt = np.full(cur.shape, -1, dtype=np.int64)
        h = _draw(wid, t, self.seed)
        if self.restart > 0.0:
            u = (h >> np.uint64(11)).astype(np.float64) * 2.0 ** -53
            rmask = u < self.restart
            nxt[rmask] = start[rmask]
        h2 = splitmix64(h, self.seed + 1)
        todo = nxt < 0
        for p in self.owned:
            s = self.shards[p]
            lo, hi = s["vid_lo"], s["vid_hi"]
            m = todo & (cur >= lo) & (cur < hi)
            if not m.any():
                continue
            local = cur[m] - lo
            indptr, indices = s["indptr"], s["indices"]
            deg = indptr[local + 1] - indptr[local]
            ok = deg > 0
            if ok.any():
                pos = indptr[local[ok]] + (h2[m][ok] % deg[ok].astype(np.uint64)
                                           ).astype(np.int64)
                sub = np.flatnonzero(m)[ok]
                nxt[sub] = indices[pos]
        alive = nxt >= 0
        n_alive = int(alive.sum())
        if n_alive == 0:
            return (*[None] * self.A, 0)
        wid, start, nxt = wid[alive], start[alive], nxt[alive]
        part = np.searchsorted(self.off, nxt, side="right") - 1
        dact = self.p2a[part]
        order = np.argsort(dact, kind="stable")
        b = np.searchsorted(dact[order], np.arange(self.A + 1))
        msgs = [(wid[order[b[j]:b[j + 1]]], start[order[b[j]:b[j + 1]]],
                 nxt[order[b[j]:b[j + 1]]]) if b[j + 1] > b[j] else None
                for j in range(self.A)]
        return (*msgs, n_alive)

    def result_tables(self):
        if not self.visits:
            return []
        wid = np.concatenate([v[0] for v in self.visits])
        step = np.concatenate([np.full(v[0].size, v[1], dtype=np.int64)
                               for v in self.visits])
        vid = np.concatenate([v[2] for v in self.visits])
        return [pa.table({"walk_id": pa.array(wid.astype(np.int64)),
                          "step": pa.array(step),
                          "vid": pa.array(vid.astype(np.int64))})]


def random_walks(edges, offsets: np.ndarray, workdir: str,
                 cfg: EngineConfig = DEFAULT, *,
                 starts: Optional[np.ndarray] = None,
                 walks_per_vertex: int = 1, walk_len: int = 10,
                 seed: int = 42, restart_prob: float = 0.0,
                 shards_dir: Optional[str] = None,
                 lineage: Optional[dict] = None,
                 num_actors: int = 0) -> Tuple["rd.Dataset", Dict]:
    """Fixed-length uniform random walks over a directed edge table.

    ``starts``: explicit start vids (one walk each); default = every
    vertex, ``walks_per_vertex`` times.  walk_id = start_index *
    walks_per_vertex + repeat (stable, independent of execution).
    Returns (ds(walk_id, step, vid) — one row per visit, walks may end
    early at out-degree-0 vertices — and info with per-round alive
    counts).
    """
    from .csr import build_csr_shards

    if walk_len < 1:
        raise ValueError("walk_len must be >= 1")
    if not 0.0 <= restart_prob <= 1.0:
        raise ValueError("restart_prob must be in [0, 1]")
    N = int(offsets[-1])
    if starts is None:
        starts = np.repeat(np.arange(N, dtype=np.int64), walks_per_vertex)
    else:
        starts = np.asarray(starts, dtype=np.int64)
        if walks_per_vertex > 1:
            starts = np.repeat(starts, walks_per_vertex)
    if starts.size == 0:
        raise ValueError("no walk starts")
    if starts.min() < 0 or starts.max() >= N:
        raise ValueError(f"starts out of range [0, {N})")
    wid0 = np.arange(starts.size, dtype=np.int64)

    num_parts = len(offsets) - 1
    descs = build_csr_shards(edges, offsets, shards_dir or f"{workdir}/csr",
                             lineage=lineage or {"kind": "directed"})
    paths = {dd["part"]: dd["path"] for dd in descs}
    owned = plan_actors(num_parts, num_actors)
    A = len(owned)
    p2a = part_to_actor_map(owned, num_parts)
    actors = [WalkShardActor.remote(i, owned[i], paths, np.asarray(offsets),
                                    p2a, A, seed, walk_len, restart_prob)
              for i in range(A)]
    info: Dict = {"n_walks": int(starts.size), "walk_len": walk_len,
                  "seed": seed, "restart_prob": restart_prob, "iters": []}
    try:
        part = np.searchsorted(np.asarray(offsets), starts, side="right") - 1
        dact = p2a[part]
        inbox: List[List] = []
        for j in range(A):
            m = dact == j
            inbox.append([(wid0[m], starts[m], starts[m]) if m.any() else None])
        for t in range(walk_len):
            refs = [actors[j].step.options(num_returns=A + 1).remote(
                t, *inbox[j]) for j in range(A)]
            alive = sum(ray.get([r[A] for r in refs]))
            info["iters"].append({"step": t, "alive": int(alive)})
            if alive == 0:
                break
            inbox = [[refs[i][j] for i in range(A)] for j in range(A)]
        tables = [tt for ref in [a.result_tables.remote() for a in actors]
                  for tt in ray.get(ref)]
    finally:
        for a in actors:
            ray.kill(a)
    if not tables:
        tables = [pa.schema([pa.field("walk_id", pa.int64()),
                             pa.field("step", pa.int64()),
                             pa.field("vid", pa.int64())]).empty_table()]
    info["n_visits"] = int(sum(t.num_rows for t in tables))
    return rd.from_arrow(tables), info


def pagerank_mc(edges, offsets: np.ndarray, workdir: str,
                cfg: EngineConfig = DEFAULT, *,
                damping: float = 0.85, walks_per_vertex: int = 16,
                walk_len: int = 32, seed: int = 42,
                shards_dir: Optional[str] = None,
                num_actors: int = 0) -> Tuple["rd.Dataset", Dict]:
    """Monte-Carlo PageRank (Avrachenkov et al. 2007, "Monte Carlo
    methods in PageRank computation"): run `walks_per_vertex` restart
    walks from EVERY vertex with restart probability 1-damping and
    estimate rank(v) = visits(v) / total_visits.  With uniform starts,
    restart-to-origin equals the uniform teleport in aggregate, so the
    visit frequencies converge to the PageRank stationary distribution
    as walks_per_vertex grows (truncation bias O(damping^walk_len)).

    Scale shape vs the exact fixpoint (graph/pagerank.py): ONE walk
    pass — O(V * R * E[len]) total work with no convergence barrier.
    HONEST TRADE-OFF: this engine's exact fixpoint is heavily
    vectorized (~15M edges/s/iter), so at full precision it beats MC
    wall-clock on every measured input; MC pays off when the walk set
    is restricted (rank a sampled subset / a seed neighborhood), when
    per-iteration global synchronization dominates (very wide clusters,
    stragglers), or as the incremental estimator under edge deltas
    (walks touching unchanged regions stay valid).  Walk draws are
    stateless hashes, so the estimate is bitwise deterministic under
    any partitioning/actor layout.

    DANGLING BIAS (documented): a walk ENDS at an out-degree-0 vertex
    (the walk engine's contract) instead of teleporting uniformly, so
    mass near dangling sinks is slightly under-propagated; the exact
    engine redistributes dangling mass and remains the reference
    semantics.  Returns (Dataset(vid, rank_mc), info)."""
    from ..ops.agg import grouped_aggregate

    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    if walks_per_vertex < 1:
        raise ValueError("walks_per_vertex must be >= 1")
    visits, winfo = random_walks(
        edges, offsets, workdir, cfg, walks_per_vertex=walks_per_vertex,
        walk_len=walk_len, seed=seed, restart_prob=1.0 - damping,
        shards_dir=shards_dir, num_actors=num_actors)
    total = winfo["n_visits"]
    counts = grouped_aggregate(visits.select_columns(["vid"]), ["vid"],
                               {"n": ("count", None)},
                               num_parts=cfg.num_parts)

    def norm(b: pa.Table) -> pa.Table:
        return pa.table({
            "vid": b.column("vid"),
            "rank_mc": pa.array(
                b.column("n").to_numpy().astype(np.float64) / total)})

    ranks = counts.map_batches(norm, batch_format="pyarrow",
                               zero_copy_batch=True)
    info = {"n_visits": total, "walks": winfo,
            "damping": damping, "walks_per_vertex": walks_per_vertex,
            "walk_len": walk_len}
    return ranks, info
