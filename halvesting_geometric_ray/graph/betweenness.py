"""Betweenness centrality (Brandes 2001; sampled estimator Brandes &
Pich 2007) on the CSR shard-actor engine.

Two message-passing sweeps per source batch, both rounds of the same
gather-scatter skeleton as PageRank/BFS (the reference's
message-passing anchor, modules/sage.py:56-82):

1. FORWARD — multi-source BFS with shortest-path counting: round t
   settles ``dist_k(v) = t`` and ``sigma_k(v) = sum of sigma_k(u)`` over
   arriving edges, vectorized across the K sources of the batch (the
   per-shard scatter is one masked-matrix ``np.add.reduceat`` per unique
   destination — the K-wide analogue of PageRank's per-destination
   combiner, so a hub's fan-in is one reduce wherever its in-neighbors
   live).
2. BACKWARD — dependency accumulation by DESCENDING BFS level over the
   REVERSED CSR shards (built once, cached under their own lineage):
   level-L vertices scatter ``q_k(w) = (1 + delta_k(w)) / sigma_k(w)``
   to their in-neighbors; a receiver accumulates
   ``delta_k(u) += sigma_k(u) * sum q_k`` only where ``dist_k(u) ==
   L-1`` (for an edge u->w, dist(w) <= dist(u)+1, so the filter is
   exactly Brandes' shortest-path-DAG predicate — no predecessor lists
   are ever materialized).

``sources=None`` runs EVERY vertex (batched K at a time) and the result
is the exact betweenness (pinned against a pure-Python Brandes oracle);
a sampled run scales by n/K — the canonical unbiased estimator.  Sample
selection is a deterministic hash draw (splitmix64 scores, K smallest),
so sampled results are reproducible and partitioning-independent; the
floating-point accumulation order across actor messages varies with the
actor layout, so cross-layout equality is allclose, not bitwise
(contrast ANF, whose max-merges are order-free).

Memory: dist/sigma/delta are (shard_size, K) matrices — K trades rounds
for memory; rounds per batch = 2 x eccentricity, independent of K.

Directed betweenness over the given edge table; pass
``graph.build.symmetrize(edges)`` for the undirected variant (each
undirected pair then counted in both directions, the standard 2x of
undirected BC).
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


def _scatter_matrix(shard, values, active_cols_mask):
    """Per-unique-destination column-sum of ``values`` (size, K) over
    the shard's edges whose SOURCE row is active: returns (udst ids,
    (n_udst, K) sums).  values must already be zero where inactive."""
    indptr = shard["indptr"]
    esrc = shard["__esrc"]
    uinv = shard["uinv"]
    # edges whose source row has any active column
    emask = active_cols_mask[esrc]
    if not emask.any():
        return None, None
    order = shard["__uorder"]
    em_o = emask[order]
    sel = order[em_o]
    groups = shard["__uinv_sorted"][em_o]
    starts = np.flatnonzero(np.r_[True, groups[1:] != groups[:-1]])
    sums = np.add.reduceat(values[esrc[sel]], starts, axis=0)
    gids = groups[starts]
    return gids, sums


@ray.remote(num_cpus=0)
class BrandesShardActor:
    def __init__(self, actor_idx: int, owned: List[int],
                 fwd_paths: Dict[int, str], bwd_paths: Dict[int, str],
                 offsets: np.ndarray, part2actor: np.ndarray,
                 num_actors: int):
        self.owned = owned
        self.off = offsets
        self.p2a = part2actor
        self.A = num_actors
        self.fwd: Dict[int, dict] = {}
        self.bwd: Dict[int, dict] = {}
        for p in owned:
            for side, paths in (("fwd", fwd_paths), ("bwd", bwd_paths)):
                s = load_shard(paths[p])
                size = s["vid_hi"] - s["vid_lo"]
                s["__esrc"] = np.repeat(np.arange(size, dtype=np.int64),
                                        np.diff(s["indptr"]))
                order = np.argsort(s["uinv"], kind="stable")
                s["__uorder"] = order
                s["__uinv_sorted"] = s["uinv"][order]
                getattr(self, side)[p] = s
        self.bc: Dict[int, np.ndarray] = {
            p: np.zeros(self.fwd[p]["vid_hi"] - self.fwd[p]["vid_lo"],
                        dtype=np.float64) for p in owned}
        self.K = 0

    def start_batch(self, sources: np.ndarray):
        """Reset per-batch state; settle the sources owned here."""
        self.K = K = sources.size
        self.srcs = sources
        self.dist: Dict[int, np.ndarray] = {}
        self.sigma: Dict[int, np.ndarray] = {}
        self.delta: Dict[int, np.ndarray] = {}
        for p in self.owned:
            s = self.fwd[p]
            size = s["vid_hi"] - s["vid_lo"]
            self.dist[p] = np.full((size, K), -1, dtype=np.int32)
            self.sigma[p] = np.zeros((size, K), dtype=np.float64)
            self.delta[p] = np.zeros((size, K), dtype=np.float64)
            m = (sources >= s["vid_lo"]) & (sources < s["vid_hi"])
            if m.any():
                loc = sources[m] - s["vid_lo"]
                kk = np.flatnonzero(m)
                self.dist[p][loc, kk] = 0
                self.sigma[p][loc, kk] = 1.0

    def _route(self, gids_by_part):
        """gids_by_part: list of (udst vids, matrix); returns A messages
        with per-message unique vids (second combine level, as ANF)."""
        out_v: List[List[np.ndarray]] = [[] for _ in range(self.A)]
        out_m: List[List[np.ndarray]] = [[] for _ in range(self.A)]
        for vids, M, udst_part in gids_by_part:
            dact = self.p2a[udst_part]
            order = np.argsort(dact, kind="stable")
            b = np.searchsorted(dact[order], np.arange(self.A + 1))
            for j in range(self.A):
                if b[j + 1] > b[j]:
                    rows = order[b[j]:b[j + 1]]
                    out_v[j].append(vids[rows])
                    out_m[j].append(M[rows])
        msgs = []
        for j in range(self.A):
            if not out_v[j]:
                msgs.append(None)
            elif len(out_v[j]) == 1:
                msgs.append((out_v[j][0], out_m[j][0]))
            else:
                v = np.concatenate(out_v[j])
                m = np.concatenate(out_m[j])
                order = np.argsort(v, kind="stable")
                v, m = v[order], m[order]
                starts = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])
                msgs.append((v[starts], np.add.reduceat(m, starts, axis=0)))
        return msgs

    def fwd_step(self, t: int, *incoming):
        """Settle round-t sigma arrivals, then scatter from the round-t
        frontier.  Returns A messages + settled count."""
        settled = 0
        for p in self.owned:
            lo, hi = self.fwd[p]["vid_lo"], self.fwd[p]["vid_hi"]
            if t > 0:
                acc_v, acc_m = None, None
                for msg in incoming:
                    if msg is None:
                        continue
                    vids, M = msg
                    m = (vids >= lo) & (vids < hi)
                    if not m.any():
                        continue
                    if acc_v is None:
                        acc_v, acc_m = vids[m], M[m].copy()
                    else:
                        # vids unique per message: merge-sum the overlap
                        both = np.concatenate([acc_v, vids[m]])
                        bm = np.concatenate([acc_m, M[m]])
                        order = np.argsort(both, kind="stable")
                        both, bm = both[order], bm[order]
                        st = np.flatnonzero(np.r_[True, both[1:] != both[:-1]])
                        acc_v = both[st]
                        acc_m = np.add.reduceat(bm, st, axis=0)
                if acc_v is not None:
                    loc = acc_v - lo
                    fresh = (self.dist[p][loc] == -1) & (acc_m > 0)
                    if fresh.any():
                        rows, cols = np.nonzero(fresh)
                        self.dist[p][loc[rows], cols] = t
                        self.sigma[p][loc[rows], cols] = acc_m[rows, cols]
                        settled += int(fresh.sum())
            # scatter from the round-t frontier of this part
        gb = []
        for p in self.owned:
            frontier = self.dist[p] == t
            if not frontier.any():
                continue
            vals = np.where(frontier, self.sigma[p], 0.0)
            active = frontier.any(axis=1)
            gids, sums = _scatter_matrix(self.fwd[p], vals, active)
            if gids is not None:
                s = self.fwd[p]
                gb.append((s["udsts"][gids], sums, s["udst_part"][gids]))
        msgs = self._route(gb)
        return (*msgs, settled)

    def bwd_step(self, L: int, *incoming):
        """Apply dependency arrivals to dist==L vertices, then (L>0)
        scatter q from them over the REVERSED shards."""
        for p in self.owned:
            lo, hi = self.fwd[p]["vid_lo"], self.fwd[p]["vid_hi"]
            for msg in incoming:
                if msg is None:
                    continue
                vids, M = msg
                m = (vids >= lo) & (vids < hi)
                if not m.any():
                    continue
                loc = vids[m] - lo
                ok = self.dist[p][loc] == L
                self.delta[p][loc] += np.where(
                    ok, self.sigma[p][loc] * M[m], 0.0)
        if L <= 0:
            return (*[None] * self.A, 0)
        gb = []
        n_active = 0
        for p in self.owned:
            at = self.dist[p] == L
            if not at.any():
                continue
            n_active += int(at.sum())
            with np.errstate(divide="ignore", invalid="ignore"):
                q = np.where(at, (1.0 + self.delta[p]) / self.sigma[p], 0.0)
            gids, sums = _scatter_matrix(self.bwd[p], q, at.any(axis=1))
            if gids is not None:
                s = self.bwd[p]
                gb.append((s["udsts"][gids], sums, s["udst_part"][gids]))
        msgs = self._route(gb)
        return (*msgs, n_active)

    def finish_batch(self, scale: float):
        """Fold the batch's deltas into BC, excluding each source's own
        column at the source vertex."""
        for p in self.owned:
            lo, hi = self.fwd[p]["vid_lo"], self.fwd[p]["vid_hi"]
            m = (self.srcs >= lo) & (self.srcs < hi)
            if m.any():
                self.delta[p][self.srcs[m] - lo, np.flatnonzero(m)] = 0.0
            self.bc[p] += scale * self.delta[p].sum(axis=1)
        self.dist = self.sigma = self.delta = None
        return True

    def result_tables(self):
        out = []
        for p in self.owned:
            lo, hi = self.fwd[p]["vid_lo"], self.fwd[p]["vid_hi"]
            out.append(pa.table({
                "part": pa.array(np.full(hi - lo, p, dtype=np.int32)),
                "vid": pa.array(np.arange(lo, hi, dtype=np.int64)),
                "betweenness": pa.array(self.bc[p]),
            }))
        return out


def betweenness(edges, offsets: np.ndarray, workdir: str,
                cfg: EngineConfig = DEFAULT, *,
                sources: Optional[np.ndarray] = None,
                n_samples: Optional[int] = None, seed: int = 42,
                batch_k: int = 32, max_iters: Optional[int] = None,
                num_actors: int = 0) -> Tuple["rd.Dataset", Dict]:
    """Betweenness centrality over a directed edge table.

    - ``sources=None, n_samples=None``: EXACT (every vertex a source).
    - ``n_samples=K``: Brandes-Pich estimate from a deterministic
      hash-sampled K-subset, scaled by N/K.
    - explicit ``sources``: those exact sources, unscaled sum.

    Returns (ds(part, vid, betweenness), info).
    """
    from .csr import build_csr_shards

    N = int(offsets[-1])
    max_iters = (cfg.max_iters if max_iters is None else max_iters)
    scale = 1.0
    if sources is not None:
        sources = np.unique(np.asarray(sources, dtype=np.int64))
        if sources.size == 0:
            raise ValueError("sources must be non-empty")
        if sources.min() < 0 or sources.max() >= N:
            raise ValueError(f"sources out of range [0, {N})")
    elif n_samples is not None:
        if not 1 <= n_samples <= N:
            raise ValueError("n_samples out of range")
        scores = splitmix64(np.arange(N, dtype=np.uint64), seed)
        sources = np.sort(np.argsort(scores, kind="stable")[:n_samples]
                          ).astype(np.int64)
        scale = N / n_samples
    else:
        sources = np.arange(N, dtype=np.int64)

    def swap(b: pa.Table) -> pa.Table:
        return pa.table({"src": b.column("dst"), "dst": b.column("src")})

    fwd_descs = build_csr_shards(edges, offsets, f"{workdir}/csr_fwd",
                                 lineage={"kind": "directed"})
    bwd_descs = build_csr_shards(
        edges.map_batches(swap, batch_format="pyarrow", zero_copy_batch=True),
        offsets, f"{workdir}/csr_bwd", lineage={"kind": "reversed"})
    fwd_paths = {d["part"]: d["path"] for d in fwd_descs}
    bwd_paths = {d["part"]: d["path"] for d in bwd_descs}

    num_parts = len(offsets) - 1
    owned = plan_actors(num_parts, num_actors)
    A = len(owned)
    p2a = part_to_actor_map(owned, num_parts)
    actors = [BrandesShardActor.remote(i, owned[i], fwd_paths, bwd_paths,
                                       np.asarray(offsets), p2a, A)
              for i in range(A)]
    info: Dict = {"n_sources": int(sources.size), "scale": scale,
                  "batches": []}
    try:
        for b0 in range(0, sources.size, batch_k):
            batch = sources[b0:b0 + batch_k]
            ray.get([a.start_batch.remote(batch) for a in actors])
            inbox: List[List] = [[] for _ in range(A)]
            lmax = 0
            for t in range(0, max_iters + 1):
                refs = [actors[j].fwd_step.options(
                    num_returns=A + 1).remote(t, *inbox[j]) for j in range(A)]
                settled = sum(ray.get([r[A] for r in refs]))
                if t > 0 and settled == 0:
                    lmax = t - 1
                    break
                inbox = [[refs[i][j] for i in range(A)] for j in range(A)]
            else:
                raise RuntimeError("forward sweep exceeded max_iters")
            inbox = [[] for _ in range(A)]
            for L in range(lmax, -1, -1):
                refs = [actors[j].bwd_step.options(
                    num_returns=A + 1).remote(L, *inbox[j]) for j in range(A)]
                ray.get([r[A] for r in refs])
                inbox = [[refs[i][j] for i in range(A)] for j in range(A)]
            ray.get([a.finish_batch.remote(scale) for a in actors])
            info["batches"].append({"k": int(batch.size), "lmax": int(lmax)})
        tables = [tt for ref in [a.result_tables.remote() for a in actors]
                  for tt in ray.get(ref)]
    finally:
        for a in actors:
            ray.kill(a)
    return rd.from_arrow(tables), info
