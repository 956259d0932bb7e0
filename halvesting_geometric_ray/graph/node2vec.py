"""node2vec second-order biased random walks (Grover & Leskovec 2016)
on the walker-routing shard-actor engine — the p/q extension that
graph/walks.py deliberately scopes out.

Transition from ``cur`` with previous vertex ``prev``:

    alpha(x) = 1/p   if x == prev          (return)
             = 1     if x in N(prev)       (stay close: triangle edge)
             = 1/q   otherwise             (explore outward)

drawn exactly via REJECTION SAMPLING (the KnightKing 2019 recipe):
propose x uniform over N(cur), accept with probability alpha(x) / M
where M = max(1/p, 1, 1/q) is the envelope.  The only non-local
predicate is x in N(prev) — so an attempt is two routed hops:

    1. PROPOSE at owner(cur): draw x = N(cur)[hash(wid, step, try)];
       the x == prev case (and the p == q == 1 fast path) decides
       LOCALLY; otherwise the walker ships to owner(prev).
    2. TEST at owner(prev): sorted-adjacency searchsorted membership,
       accept iff u < alpha/M.  Accepted walkers advance (prev=cur,
       cur=x) and route to owner(x); rejected ones route back to
       owner(cur) with try+1.

Expected attempts per step are bounded by M / min(1/p, 1, 1/q); a
per-step attempt cap (default 64) force-accepts the next proposal —
probability (1 - m/M)^64, negligible for sane p/q, and DETERMINISTIC,
so the replay oracle reproduces it bit-for-bit.

Determinism: every draw is a stateless splitmix64 of
(walk_id, step, try, seed) — the walk set is bitwise identical under
any partitioning / actor count (pinned in tests/test_node2vec.py along
with a full pure-Python replay oracle and an empirical transition-law
check against exact alpha weights).
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
_K2 = np.uint64(0x9E3779B97F4A7C15)

# walker message: tuple of 6 int64 arrays
# (mode, wid, step, prev, cur, tryno); mode 0 = PROPOSE at owner(cur),
# mode 1 = TEST at owner(prev) with the candidate in `cand`
_EMPTY = tuple(np.empty(0, dtype=np.int64) for _ in range(7))


def _draw_u64(wid, step, tryno, seed):
    with np.errstate(over="ignore"):
        x = (wid.astype(np.uint64) * _FNV
             + step.astype(np.uint64) * _K2
             + tryno.astype(np.uint64))
    return splitmix64(x, seed)


def _uniform(h, seed):
    return (splitmix64(h, seed) >> np.uint64(11)).astype(np.float64) \
        * 2.0 ** -53


@ray.remote(num_cpus=0)
class Node2VecShardActor:
    def __init__(self, actor_idx: int, owned: List[int],
                 paths: Dict[int, str], offsets: np.ndarray,
                 part2actor: np.ndarray, num_actors: int, seed: int,
                 walk_len: int, p: float, q: float, max_tries: int):
        self.owned = owned
        self.off = offsets
        self.p2a = part2actor
        self.A = num_actors
        self.seed = seed
        self.walk_len = walk_len
        self.ip = 1.0 / p
        self.iq = 1.0 / q
        self.M = max(self.ip, 1.0, self.iq)
        self.max_tries = max_tries
        self.N = int(offsets[-1])
        if self.N > 3_000_000_000:
            # composite src*N+dst membership key must fit in int64
            raise ValueError("node2vec composite key needs N <= 3e9; "
                             "shard the id space or extend to uint128")
        self.shards = {}
        self.flat_key: Dict[int, np.ndarray] = {}
        for pp in owned:
            s = dict(load_shard(paths[pp]))
            self.shards[pp] = s
            # globally sorted (src, dst) composite key: CSR rows are
            # contiguous and dst-sorted, so src*N + dst is monotone —
            # membership of (prev, cand) is ONE vectorized searchsorted
            src_loc = np.repeat(
                np.arange(s["vid_lo"], s["vid_hi"], dtype=np.int64),
                s["outdeg"])
            self.flat_key[pp] = src_loc * np.int64(self.N) + s["indices"]
        self.visits: List[Tuple[np.ndarray, np.ndarray, np.ndarray]] = []

    def _locate(self, v: np.ndarray):
        """(shard dict, local index) lookup helpers per owned part."""
        out = []
        for pp in self.owned:
            s = self.shards[pp]
            m = (v >= s["vid_lo"]) & (v < s["vid_hi"])
            if m.any():
                out.append((s, m, v[m] - s["vid_lo"]))
        return out

    def _route(self, arrays, owner_vid):
        """Split walker arrays by owner(owner_vid); returns A messages."""
        if owner_vid.size == 0:
            return [None] * self.A
        part = np.searchsorted(self.off, owner_vid, side="right") - 1
        dact = self.p2a[part]
        order = np.argsort(dact, kind="stable")
        b = np.searchsorted(dact[order], np.arange(self.A + 1))
        msgs = []
        for j in range(self.A):
            if b[j + 1] > b[j]:
                sl = order[b[j]:b[j + 1]]
                msgs.append(tuple(a[sl] for a in arrays))
            else:
                msgs.append(None)
        return msgs

    def step(self, *incoming):
        """Process one routed round of PROPOSE/TEST walkers; returns A
        messages + alive count."""
        cols = [[] for _ in range(7)]
        for msg in incoming:
            if msg is None:
                continue
            for i in range(7):
                cols[i].append(msg[i])
        if not cols[0]:
            return (*[None] * self.A, 0)
        mode, wid, step, prev, cur, cand, tryno = \
            (np.concatenate(c) for c in cols)

        out = [[] for _ in range(7)]   # outgoing walker columns
        out_owner = []                 # routing vid per outgoing walker

        def emit(mode_v, wid_v, step_v, prev_v, cur_v, cand_v, try_v,
                 owner_v):
            if wid_v.size == 0:
                return
            vals = [np.full(wid_v.size, mode_v, dtype=np.int64)
                    if np.isscalar(mode_v) else mode_v,
                    wid_v, step_v, prev_v, cur_v, cand_v, try_v]
            for i in range(7):
                out[i].append(vals[i])
            out_owner.append(owner_v)

        # ---- TEST mode: membership of cand in N(prev) ----
        tm = mode == 1
        if tm.any():
            t_wid, t_step = wid[tm], step[tm]
            t_prev, t_cur = prev[tm], cur[tm]
            t_cand, t_try = cand[tm], tryno[tm]
            member = np.zeros(t_wid.size, dtype=bool)
            for pp in self.owned:
                s = self.shards[pp]
                m = (t_prev >= s["vid_lo"]) & (t_prev < s["vid_hi"])
                if not m.any():
                    continue
                fk = self.flat_key[pp]
                key = t_prev[m] * np.int64(self.N) + t_cand[m]
                j = np.minimum(np.searchsorted(fk, key),
                               max(fk.size - 1, 0))
                member[m] = fk[j] == key if fk.size else False
            alpha = np.where(member, 1.0, self.iq)
            h = _draw_u64(t_wid, t_step, t_try, self.seed)
            u = _uniform(h, self.seed + 7)
            accept = (u < alpha / self.M) | (t_try >= self.max_tries)
            # accepted: advance to cand (visit recorded on arrival)
            a = accept
            emit(0, t_wid[a], t_step[a] + 1, t_cur[a], t_cand[a],
                 np.zeros(int(a.sum()), dtype=np.int64),
                 np.zeros(int(a.sum()), dtype=np.int64), t_cand[a])
            # rejected: back to owner(cur) for the next try
            r = ~accept
            emit(0, t_wid[r], t_step[r], t_prev[r], t_cur[r],
                 np.zeros(int(r.sum()), dtype=np.int64),
                 t_try[r] + 1, t_cur[r])

        # ---- PROPOSE mode ----
        pm = mode == 0
        if pm.any():
            p_wid, p_step = wid[pm], step[pm]
            p_prev, p_cur = prev[pm], cur[pm]
            p_try = tryno[pm]
            # a try-0 arrival IS the visit of this step
            first = p_try == 0
            if first.any():
                self.visits.append((p_wid[first], p_step[first],
                                    p_cur[first]))
            live = p_step < self.walk_len - 1
            if live.any():
                l_wid, l_step = p_wid[live], p_step[live]
                l_prev, l_cur = p_prev[live], p_cur[live]
                l_try = p_try[live]
                nxt = np.full(l_wid.size, -1, dtype=np.int64)
                for s, m, local in self._locate(l_cur):
                    indptr, indices = s["indptr"], s["indices"]
                    deg = indptr[local + 1] - indptr[local]
                    ok = deg > 0
                    if ok.any():
                        h = _draw_u64(l_wid[m][ok], l_step[m][ok],
                                      l_try[m][ok], self.seed + 3)
                        pos = indptr[local[ok]] + \
                            (h % deg[ok].astype(np.uint64)).astype(np.int64)
                        sub = np.flatnonzero(m)[ok]
                        nxt[sub] = indices[pos]
                has = nxt >= 0
                l_wid, l_step = l_wid[has], l_step[has]
                l_prev, l_cur, l_try = l_prev[has], l_cur[has], l_try[has]
                x = nxt[has]
                # local decisions: first hop (prev<0), p==q==1 fast
                # path, x == prev (alpha = 1/p), forced accept at cap
                u = _uniform(_draw_u64(l_wid, l_step, l_try,
                                       self.seed), self.seed + 7)
                is_first = l_prev < 0
                fast = (self.M == 1.0) | is_first | \
                    (l_try >= self.max_tries)
                is_ret = (x == l_prev) & ~fast
                acc_ret = is_ret & (u < self.ip / self.M)
                rej_ret = is_ret & ~acc_ret
                acc_now = fast | acc_ret
                need_test = ~fast & ~is_ret
                emit(0, l_wid[acc_now], l_step[acc_now] + 1,
                     l_cur[acc_now], x[acc_now],
                     np.zeros(int(acc_now.sum()), dtype=np.int64),
                     np.zeros(int(acc_now.sum()), dtype=np.int64),
                     x[acc_now])
                emit(0, l_wid[rej_ret], l_step[rej_ret],
                     l_prev[rej_ret], l_cur[rej_ret],
                     np.zeros(int(rej_ret.sum()), dtype=np.int64),
                     l_try[rej_ret] + 1, l_cur[rej_ret])
                emit(1, l_wid[need_test], l_step[need_test],
                     l_prev[need_test], l_cur[need_test],
                     x[need_test], l_try[need_test], l_prev[need_test])

        if not out[0]:
            return (*[None] * self.A, 0)
        arrays = tuple(np.concatenate(c) for c in out)
        owner = np.concatenate(out_owner)
        msgs = self._route(arrays, owner)
        return (*msgs, int(owner.size))

    def result_tables(self):
        if not self.visits:
            return []
        wid = np.concatenate([v[0] for v in self.visits])
        step = np.concatenate([v[1] for v in self.visits])
        vid = np.concatenate([v[2] for v in self.visits])
        return [pa.table({"walk_id": pa.array(wid.astype(np.int64)),
                          "step": pa.array(step.astype(np.int64)),
                          "vid": pa.array(vid.astype(np.int64))})]


def node2vec_walks(edges, offsets: np.ndarray, workdir: str,
                   cfg: EngineConfig = DEFAULT, *,
                   p: float = 1.0, q: float = 1.0,
                   starts: Optional[np.ndarray] = None,
                   walks_per_vertex: int = 1, walk_len: int = 10,
                   seed: int = 42, max_tries: int = 64,
                   shards_dir: Optional[str] = None,
                   num_actors: int = 0) -> Tuple["rd.Dataset", Dict]:
    """Second-order p/q-biased walks over a directed edge table.
    Returns (ds(walk_id, step, vid), info).  Walks end early at
    out-degree-0 vertices; p == q == 1 reduces to uniform walks (the
    fast path skips every membership test)."""
    from .csr import build_csr_shards

    if walk_len < 1:
        raise ValueError("walk_len must be >= 1")
    if p <= 0 or q <= 0:
        raise ValueError("p and q must be positive")
    if max_tries < 1:
        raise ValueError("max_tries must be >= 1")
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
    descs = build_csr_shards(edges, offsets,
                             shards_dir or f"{workdir}/csr",
                             lineage={"kind": "directed"})
    paths = {dd["part"]: dd["path"] for dd in descs}
    owned = plan_actors(num_parts, num_actors)
    A = len(owned)
    p2a = part_to_actor_map(owned, num_parts)
    actors = [Node2VecShardActor.remote(
        i, owned[i], paths, np.asarray(offsets), p2a, A, seed,
        walk_len, p, q, max_tries) for i in range(A)]
    info: Dict = {"n_walks": int(starts.size), "walk_len": walk_len,
                  "p": p, "q": q, "seed": seed, "rounds": 0}
    # generous round bound: a walk-step costs <= 2 rounds per attempt
    round_cap = walk_len * max_tries * 2 + 4
    try:
        part = np.searchsorted(np.asarray(offsets), starts,
                               side="right") - 1
        dact = p2a[part]
        z = np.zeros_like(wid0)
        inbox: List[List] = []
        for j in range(A):
            m = dact == j
            inbox.append([(z[m], wid0[m], z[m], z[m] - 1, starts[m],
                           z[m], z[m]) if m.any() else None])
        for r in range(round_cap):
            refs = [actors[j].step.options(num_returns=A + 1)
                    .remote(*inbox[j]) for j in range(A)]
            alive = sum(ray.get([rr[A] for rr in refs]))
            info["rounds"] = r + 1
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
