"""Greedy maximal matching on the CSR shard engine.

The second classic distributed symmetry-breaking primitive next to
MIS (Israeli & Itai 1986; the locally-greedy form analyzed by Blelloch,
Fineman & Shun 2012): every round each UNMATCHED vertex proposes along
its minimum-priority incident live edge; an edge whose two endpoints
propose each other is matched, both endpoints retire, and their
incident edges die.  Repeating until no live edge remains yields
EXACTLY the sequential greedy matching under the global edge order

    (priority(e), min_vid(e), max_vid(e))   lexicographic

because a locally-minimum edge at both endpoints is precisely an edge
the sequential scan would take — so the result is a deterministic
function of (edge set, seed), independent of rounds, partitioning and
actor layout (pinned in tests/test_matching.py by a sequential
replay).  Greedy matchings are maximal and at least half the size of a
maximum matching.  Downstream uses: multilevel graph coarsening (match
then contract pairs), 2-approximate vertex cover (matched endpoints),
conflict-free pairwise merge scheduling.

Priorities are STATELESS hash mixes of the canonical edge pair
(min, max, seed) — both endpoints (and the test oracle) compute the
same 64-bit priority locally from the CSR, so the only messages are
(target, proposer) proposal pairs and retired-vertex announcements,
both vid lists.  Per-edge liveness uses MIS's per-shard bitmask +
argsort-of-indices routing; the per-vertex "min over live incident
edges" is one segmented vectorized pass.  O(log m) rounds w.h.p.

Input contract: SYMMETRIZED, self-loop-free edge table
(graph.build.symmetrize(drop_self_loops=True)) — a self-loop can never
match and would pin its vertex's proposal forever.
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


def edge_priority(lo_vid: np.ndarray, hi_vid: np.ndarray,
                  seed: int) -> np.ndarray:
    """Stateless splitmix64-style priority of the canonical edge
    (lo_vid, hi_vid) — identical everywhere (both endpoint owners and
    the test oracle) by construction."""
    x = (lo_vid.astype(np.int64).view(_U64) * _U64(0x9E3779B97F4A7C15)
         ^ hi_vid.astype(np.int64).view(_U64) * _U64(0xC2B2AE3D27D4EB4F)
         ^ _U64((seed * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF))
    x = (x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)
    return x ^ (x >> _U64(31))


@ray.remote(num_cpus=0)
class MatchShardActor:
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
        # partner vid, -1 while unmatched
        self.partner: Dict[int, np.ndarray] = {}
        # this round's proposal target per local vertex (-1 = none)
        self.proposal: Dict[int, np.ndarray] = {}
        self.edge_live: Dict[int, np.ndarray] = {}
        self.sidx: Dict[int, np.ndarray] = {}
        self.ssorted: Dict[int, np.ndarray] = {}
        for p in owned:
            s = self.shards[p]
            n = s["vid_hi"] - s["vid_lo"]
            self.partner[p] = np.full(n, -1, dtype=np.int64)
            self.proposal[p] = np.full(n, -1, dtype=np.int64)
            self.edge_live[p] = np.ones(len(s["indices"]), dtype=bool)
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

    def _announce(self, per_part_locals: Dict[int, np.ndarray]):
        """Emit (neighbor, vid) pairs for each given local vertex,
        routed to the neighbor's owner (MIS's announcement shape)."""
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
        self.edge_live[p][self.sidx[p][span]] = False

    def propose(self, *retire_msgs):
        """Apply last round's retirements to the edge cache, then
        each unmatched vertex proposes along its minimum-(priority,
        neighbor) live edge.  Returns A (target, proposer) messages +
        n_proposals."""
        deads = [m[1] for m in retire_msgs if m is not None]
        if deads:
            dead = np.unique(np.concatenate(deads))
            for p in self.owned:
                self._clear_edges_to(p, dead)
        tgt_parts, own_parts = [], []
        n = 0
        for p in self.owned:
            s = self.shards[p]
            lo = s["vid_lo"]
            self.proposal[p].fill(-1)
            local = np.flatnonzero(self.partner[p] == -1)
            if local.size == 0:
                continue
            indptr, indices = s["indptr"], s["indices"]
            starts, ends = indptr[local], indptr[local + 1]
            cnt = ends - starts
            tot = int(cnt.sum())
            if tot == 0:
                continue
            csum = np.concatenate([[0], np.cumsum(cnt)[:-1]])
            pos = np.repeat(starts - csum, cnt) + np.arange(tot)
            nbrs = indices[pos]
            live = self.edge_live[p][pos]
            ownv = np.repeat(local + lo, cnt)
            prio = edge_priority(np.minimum(ownv, nbrs),
                                 np.maximum(ownv, nbrs), self.seed)
            row = np.repeat(np.arange(local.size), cnt)
            best_p = np.full(local.size, _U64(0xFFFFFFFFFFFFFFFF))
            np.minimum.at(best_p, row[live], prio[live])
            has = best_p != _U64(0xFFFFFFFFFFFFFFFF)
            # tie-break: smallest neighbor among slots at the best prio
            best_v = np.full(local.size, np.iinfo(np.int64).max,
                             dtype=np.int64)
            at_best = live & (prio == best_p[row])
            np.minimum.at(best_v, row[at_best], nbrs[at_best])
            sel = np.flatnonzero(has)
            if sel.size == 0:
                continue
            self.proposal[p][local[sel]] = best_v[sel]
            tgt_parts.append(best_v[sel])
            own_parts.append(local[sel] + lo)
            n += int(sel.size)
        msgs = (self._route_pairs(np.concatenate(tgt_parts),
                                  np.concatenate(own_parts))
                if n else [None] * self.num_actors)
        return (*msgs, n)

    def match(self, *proposal_msgs):
        """(target, proposer) pairs arrive at the target's owner: an
        edge is matched iff the target's own proposal is the proposer
        (mutual minimum).  Retired vertices are announced to their
        neighbors for the next round's cache update.  Returns A pair
        messages + n_newly_matched."""
        tgt_parts, prop_parts = [], []
        for msg in proposal_msgs:
            if msg is not None:
                tgt_parts.append(msg[0])
                prop_parts.append(msg[1])
        retired_parts: Dict[int, np.ndarray] = {}
        n_matched = 0
        if tgt_parts:
            tgts = np.concatenate(tgt_parts)
            props = np.concatenate(prop_parts)
        else:
            tgts = np.empty(0, dtype=np.int64)
            props = tgts
        for p in self.owned:
            s = self.shards[p]
            lo, hi = s["vid_lo"], s["vid_hi"]
            retired_parts[p] = np.empty(0, dtype=np.int64)
            if tgts.size == 0:
                continue
            m = (tgts >= lo) & (tgts < hi)
            if not m.any():
                continue
            local = tgts[m] - lo
            frm = props[m]
            mutual = self.proposal[p][local] == frm
            if not mutual.any():
                continue
            hit = local[mutual]
            self.partner[p][hit] = frm[mutual]
            retired_parts[p] = hit
            n_matched += int(hit.size)
        msgs = self._announce(retired_parts) if n_matched else \
            [None] * self.num_actors
        return (*msgs, n_matched)

    def result_tables(self):
        out = []
        for p in self.owned:
            lo = self.shards[p]["vid_lo"]
            pr = self.partner[p]
            out.append(pa.table({
                "part": pa.array(np.full(pr.size, p, dtype=np.int32)),
                "vid": pa.array(np.arange(lo, lo + pr.size,
                                          dtype=np.int64)),
                "partner": pa.array(pr),
            }))
        return out


def maximal_matching(sym_edges, offsets: np.ndarray, workdir: str,
                     cfg: EngineConfig = DEFAULT, *,
                     seed: int = 42,
                     max_iters: Optional[int] = None,
                     num_actors: int = 0,
                     shards_dir: Optional[str] = None
                     ) -> Tuple["rd.Dataset", Dict]:
    """Greedy maximal matching over a SYMMETRIZED self-loop-free edge
    table.  Returns (ds(part, vid, partner), info) with partner = -1
    for unmatched vertices; every matched pair appears from BOTH
    sides (partner[u] = v and partner[v] = u).  Deterministic in
    (edge set, seed); equals the sequential greedy matching under the
    (edge_priority, min_vid, max_vid) order."""
    from .csr import build_csr_shards

    N = int(offsets[-1])
    num_parts = len(offsets) - 1
    max_iters = max_iters if max_iters is not None else cfg.max_iters
    if N == 0:
        import pandas as _pd

        return rd.from_pandas(_pd.DataFrame(
            {"part": _pd.Series([], dtype="int32"),
             "vid": _pd.Series([], dtype="int64"),
             "partner": _pd.Series([], dtype="int64")})), \
            {"num_rounds": 0, "n_matched_pairs": 0, "rounds": []}
    descs = build_csr_shards(sym_edges, offsets,
                             shards_dir or f"{workdir}/csr_sym",
                             lineage={"kind": "sym"})
    paths = {dd["part"]: dd["path"] for dd in descs}
    owned = plan_actors(num_parts, num_actors)
    A = len(owned)
    p2a = part_to_actor_map(owned, num_parts)
    actors = [MatchShardActor.remote(i, owned[i], paths,
                                     np.asarray(offsets), p2a, A, seed)
              for i in range(A)]
    info: Dict = {"n": N, "seed": seed, "rounds": []}
    t0 = time.time()
    total_matched = 0
    try:
        retire_inbox = [[] for _ in range(A)]
        for rnd in range(max_iters):
            p_outs = [list(actors[j].propose.options(num_returns=A + 1)
                           .remote(*retire_inbox[j])) for j in range(A)]
            n_prop = sum(ray.get([o[A] for o in p_outs]))
            if n_prop == 0:
                break
            prop_inbox = transpose_refs([o[:A] for o in p_outs])
            m_outs = [list(actors[j].match.options(num_returns=A + 1)
                           .remote(*prop_inbox[j])) for j in range(A)]
            n_matched = sum(ray.get([o[A] for o in m_outs]))
            retire_inbox = transpose_refs([o[:A] for o in m_outs])
            info["rounds"].append({"round": rnd, "proposals": int(n_prop),
                                   "matched_vertices": int(n_matched)})
            total_matched += int(n_matched)
            if n_matched == 0:
                raise RuntimeError(
                    "matching: no mutual proposal with live edges "
                    "remaining — impossible for a simple graph "
                    "(self-loops present?)")
        else:
            raise RuntimeError(
                f"matching: not converged in {max_iters} rounds")
        tables = [t for ref in [a.result_tables.remote() for a in actors]
                  for t in ray.get(ref)]
    finally:
        for a in actors:
            ray.kill(a)
    info["num_rounds"] = len(info["rounds"])
    info["n_matched_pairs"] = total_matched // 2
    info["wall_sec"] = round(time.time() - t0, 4)
    tables = [t for t in tables if t.num_rows] or [pa.schema(
        [pa.field("part", pa.int32()), pa.field("vid", pa.int64()),
         pa.field("partner", pa.int64())]).empty_table()]
    return rd.from_arrow(tables), info
