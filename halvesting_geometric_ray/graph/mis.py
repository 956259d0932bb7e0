"""Maximal independent set (Luby's algorithm) on the CSR shard engine.

The classic distributed symmetry-breaking primitive (Luby 1986, "A
simple parallel algorithm for the maximal independent set problem"):
each round every ACTIVE vertex draws a priority; local minima join the
MIS, their neighbors drop out, and the survivors repeat — O(log n)
rounds w.h.p.  Downstream uses: conflict-free parallel scheduling of
mutating per-page jobs, landmark/seed selection with guaranteed
spacing, coordinator election per graph neighborhood.

Determinism without priority exchange: the round-r priority of vertex
v is a STATELESS hash mix of (v, r, seed), so any actor can compute any
neighbor's priority locally from the CSR — the only messages are
round-r MIS announcements and deactivations, both vid lists.  Each
shard keeps a per-edge neighbor-active bitmask (the coreness per-edge
cache pattern, argsort-of-indices routing), so "min over ACTIVE
neighbors" is one segmented vectorized pass.  The full run is a
deterministic function of (edge set, seed) — partitioning/actor-layout
independent; tests/test_mis.py pins a sequential replay of the same
rounds plus the independence + maximality invariants.

Input contract: SYMMETRIZED, self-loop-free edge table
(graph.build.symmetrize(drop_self_loops=True)) — a self-loop would
make its vertex permanently ineligible, which is not MIS semantics.
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

_U64 = np.uint64


def round_priority(vids: np.ndarray, rnd: int, seed: int) -> np.ndarray:
    """Stateless splitmix64-style priority of each vid for round rnd —
    identical everywhere (actors, tests) by construction."""
    x = (vids.astype(np.int64).view(_U64) * _U64(0x9E3779B97F4A7C15)
         ^ _U64((rnd * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF)
         ^ _U64((seed * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF))
    x = (x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)
    return x ^ (x >> _U64(31))


@ray.remote(num_cpus=0)
class MisShardActor:
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
        # 0 = undecided, 1 = in MIS, -1 = out (has a MIS neighbor)
        self.state: Dict[int, np.ndarray] = {}
        self.edge_active: Dict[int, np.ndarray] = {}
        self.sidx: Dict[int, np.ndarray] = {}
        self.ssorted: Dict[int, np.ndarray] = {}
        for p in owned:
            s = self.shards[p]
            n = s["vid_hi"] - s["vid_lo"]
            self.state[p] = np.zeros(n, dtype=np.int8)
            self.edge_active[p] = np.ones(len(s["indices"]), dtype=bool)
            order = np.argsort(s["indices"], kind="stable")
            self.sidx[p] = order
            self.ssorted[p] = s["indices"][order]

    def _route_pairs(self, vids: np.ndarray, vals: np.ndarray):
        """Route aligned (vid, value) arrays by the OWNER of vid."""
        part = np.searchsorted(self.off, vids, side="right") - 1
        dest = self.p2a[part]
        order = np.argsort(dest, kind="stable")
        v, w = vids[order], vals[order]
        b = np.searchsorted(dest[order], np.arange(self.num_actors + 1))
        return [(v[b[j]:b[j + 1]], w[b[j]:b[j + 1]])
                if b[j + 1] > b[j] else None
                for j in range(self.num_actors)]

    def _announce(self, per_part_locals: Dict[int, np.ndarray]):
        """For each given local vertex, emit (neighbor, vertex) pairs
        routed to the neighbor's owner — how MIS elections and
        knock-outs reach the shards that hold edges pointing at them."""
        vparts, wparts = [], []
        for p, local in per_part_locals.items():
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
            wparts.append(np.repeat(local + s["vid_lo"], cnt))
        if not vparts:
            return [None] * self.num_actors
        return self._route_pairs(np.concatenate(vparts),
                                 np.concatenate(wparts))

    def _clear_edges_to(self, p: int, dead: np.ndarray):
        """Mark per-edge slots pointing at `dead` vids inactive."""
        if dead.size == 0:
            return
        left = np.searchsorted(self.ssorted[p], dead, side="left")
        right = np.searchsorted(self.ssorted[p], dead, side="right")
        cnt = right - left
        tot = int(cnt.sum())
        if tot == 0:
            return
        csum = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        span = np.repeat(left - csum, cnt) + np.arange(tot)
        self.edge_active[p][self.sidx[p][span]] = False

    def select(self, rnd: int, *deact_msgs):
        """Apply last round's knock-out deactivations to the edge
        cache, then elect round-rnd MIS members (priority strictly
        below every ACTIVE neighbor's, ties to the smaller vid).
        Returns A (neighbor, mis_vid) pair messages + n_elected."""
        deads = [m[1] for m in deact_msgs if m is not None]
        if deads:
            dead = np.unique(np.concatenate(deads))
            for p in self.owned:
                self._clear_edges_to(p, dead)
        elected_parts: Dict[int, np.ndarray] = {}
        n = 0
        for p in self.owned:
            s = self.shards[p]
            lo = s["vid_lo"]
            local = np.flatnonzero(self.state[p] == 0)
            elected_parts[p] = np.empty(0, dtype=np.int64)
            if local.size == 0:
                continue
            indptr, indices = s["indptr"], s["indices"]
            starts, ends = indptr[local], indptr[local + 1]
            cnt = ends - starts
            own = round_priority(local + lo, rnd, self.seed)
            tot = int(cnt.sum())
            if tot == 0:
                win = np.ones(local.size, dtype=bool)
            else:
                csum = np.concatenate([[0], np.cumsum(cnt)[:-1]])
                pos = np.repeat(starts - csum, cnt) + np.arange(tot)
                nbrs = indices[pos]
                act = self.edge_active[p][pos]
                np_prio = round_priority(nbrs, rnd, self.seed)
                row = np.repeat(np.arange(local.size), cnt)
                best_p = np.full(local.size, _U64(0xFFFFFFFFFFFFFFFF))
                best_v = np.full(local.size, np.iinfo(np.int64).max,
                                 dtype=np.int64)
                np.minimum.at(best_p, row[act], np_prio[act])
                sel = act & (np_prio == best_p[row])
                np.minimum.at(best_v, row[sel], nbrs[sel])
                ownv = local + lo
                win = (own < best_p) | ((own == best_p) & (ownv < best_v))
            elected = local[win]
            if elected.size:
                self.state[p][elected] = 1
                elected_parts[p] = elected
                n += int(elected.size)
        msgs = self._announce(elected_parts) if n else \
            [None] * self.num_actors
        return (*msgs, n)

    def knockout(self, *mis_msgs):
        """(neighbor, mis_vid) pairs arrive at the neighbor's owner:
        clear edge slots pointing at the MIS vids, knock out undecided
        neighbors, and announce the knock-outs for the next round's
        cache update.  Returns A pair messages + (n_out, n_left)."""
        nbr_parts, mis_parts = [], []
        for msg in mis_msgs:
            if msg is not None:
                nbr_parts.append(msg[0])
                mis_parts.append(msg[1])
        out_parts: Dict[int, np.ndarray] = {}
        n_out = 0
        left = 0
        if nbr_parts:
            nbrs = np.concatenate(nbr_parts)
            mis = np.unique(np.concatenate(mis_parts))
        else:
            nbrs = np.empty(0, dtype=np.int64)
            mis = nbrs
        for p in self.owned:
            lo = self.shards[p]["vid_lo"]
            hi = self.shards[p]["vid_hi"]
            self._clear_edges_to(p, mis)
            out_parts[p] = np.empty(0, dtype=np.int64)
            if nbrs.size:
                m = (nbrs >= lo) & (nbrs < hi)
                if m.any():
                    local = np.unique(nbrs[m] - lo)
                    hit = local[self.state[p][local] == 0]
                    if hit.size:
                        self.state[p][hit] = -1
                        out_parts[p] = hit
                        n_out += int(hit.size)
            left += int((self.state[p] == 0).sum())
        msgs = self._announce(out_parts) if n_out else \
            [None] * self.num_actors
        return (*msgs, (n_out, left))

    def result_tables(self):
        out = []
        for p in self.owned:
            lo = self.shards[p]["vid_lo"]
            st = self.state[p]
            out.append(pa.table({
                "part": pa.array(np.full(st.size, p, dtype=np.int32)),
                "vid": pa.array(np.arange(lo, lo + st.size,
                                          dtype=np.int64)),
                "in_mis": pa.array(st == 1),
            }))
        return out


def maximal_independent_set(sym_edges, offsets: np.ndarray, workdir: str,
                            cfg: EngineConfig = DEFAULT, *,
                            seed: int = 42,
                            max_iters: Optional[int] = None,
                            num_actors: int = 0,
                            shards_dir: Optional[str] = None
                            ) -> Tuple["rd.Dataset", Dict]:
    """Luby MIS over a SYMMETRIZED self-loop-free edge table.  Returns
    (ds(part, vid, in_mis), info); deterministic in (edge set, seed)."""
    from .csr import build_csr_shards

    N = int(offsets[-1])
    num_parts = len(offsets) - 1
    max_iters = max_iters if max_iters is not None else cfg.max_iters
    descs = build_csr_shards(sym_edges, offsets,
                             shards_dir or f"{workdir}/csr_sym",
                             lineage={"kind": "sym"})
    paths = {dd["part"]: dd["path"] for dd in descs}
    owned = plan_actors(num_parts, num_actors)
    A = len(owned)
    p2a = part_to_actor_map(owned, num_parts)
    actors = [MisShardActor.remote(i, owned[i], paths,
                                   np.asarray(offsets), p2a, A, seed)
              for i in range(A)]
    info: Dict = {"n": N, "seed": seed, "rounds": []}
    t0 = time.time()
    try:
        deact_inbox = [[] for _ in range(A)]
        for rnd in range(max_iters):
            s_outs = [list(actors[j].select.options(num_returns=A + 1)
                           .remote(rnd, *deact_inbox[j]))
                      for j in range(A)]
            n_elected = sum(ray.get([o[A] for o in s_outs]))
            mis_inbox = transpose_refs([o[:A] for o in s_outs])
            k_outs = [list(actors[j].knockout.options(num_returns=A + 1)
                           .remote(*mis_inbox[j])) for j in range(A)]
            tails = ray.get([o[A] for o in k_outs])
            deact_inbox = transpose_refs([o[:A] for o in k_outs])
            n_out = sum(t[0] for t in tails)
            left = sum(t[1] for t in tails)
            info["rounds"].append({"round": rnd, "elected": int(n_elected),
                                   "knocked_out": int(n_out),
                                   "undecided": int(left)})
            if left == 0:
                break
            if n_elected == 0:
                raise RuntimeError(
                    "mis: no vertex elected with undecided remaining — "
                    "impossible for a simple graph (self-loops present?)")
        else:
            raise RuntimeError(f"mis: not converged in {max_iters} rounds")
        tables = [t for ref in [a.result_tables.remote() for a in actors]
                  for t in ray.get(ref)]
    finally:
        for a in actors:
            ray.kill(a)
    info["num_rounds"] = len(info["rounds"])
    info["mis_size"] = int(sum(
        t.column("in_mis").to_numpy(zero_copy_only=False).sum()
        for t in tables))
    info["wall_sec"] = round(time.time() - t0, 4)
    tables = [t for t in tables if t.num_rows] or [pa.schema(
        [pa.field("part", pa.int32()), pa.field("vid", pa.int64()),
         pa.field("in_mis", pa.bool_())]).empty_table()]
    return rd.from_arrow(tables), info
