"""HyperBall / ANF — approximate neighborhood function and harmonic /
closeness centralities via per-vertex HyperLogLog counters on the CSR
shard-actor engine.

The sketch special case of the reference's message-passing skeleton
(reference modules/sage.py:56-82 — gather from neighbors, aggregate,
update): instead of learned embeddings, every vertex carries an HLL
register array, and one round max-merges each vertex's registers into
its OUT-neighbors' (messages flow src->dst, the same scatter direction
and routing tables as PageRank).  After round t, vertex v's counter
sketches ``ball_in(v, t) = {u : d(u -> v) <= t}``, so

- neighborhood function  ``N(t) = sum_v |ball_in(v, t)|``  (the number
  of ordered pairs within distance t, self included),
- harmonic centrality    ``H(v) = sum_u 1/d(u -> v)
                                = sum_t (|ball(v,t)| - |ball(v,t-1)|)/t``
  — the standard definition counts paths INTO v, which is exactly the
  src->dst flow; no transpose graph is needed (HyperBall [Boldi &
  Vigna, 2013] runs on the transpose for the same reason),
- closeness = (reach-1) / sum-of-distances from the same deltas.

This is THE web-graph centrality algorithm at 10^12-page scale
(HyperBall computed ClueWeb/Facebook distance distributions on one
box): state is m = 2^p_bits bytes per vertex, a round's exchange is
bounded by (changed unique destinations) x m bytes, and convergence is
an exact sketch fixpoint — registers are max-merges of deterministic
per-vertex hashes, so results are BITWISE independent of partitioning
and actor count (only p_bits/seed change them).

HyperBall's two classic optimizations are kept:

- only vertices whose registers changed last round scatter (max-merge
  is idempotent, so unchanged counters would re-send what they already
  sent); late rounds touch only the sketch frontier;
- per-shard scatter pre-aggregates an elementwise register max PER
  UNIQUE DESTINATION (``np.maximum.reduceat`` over the shard's static
  uinv order) before anything leaves the task — a hub's fan-in costs
  one reduce wherever its in-neighbors live, the same combiner bound as
  PageRank's per-destination sums.

Like BFS (graph/bfs.py) there is deliberately NO per-round checkpoint:
rounds are diameter-bounded and cheap next to the cached CSR shards.

Accuracy: the usual HLL relative standard error 1.04/sqrt(m) per
counter (p_bits=7 -> ~9%); N(t) averages the per-vertex errors down.
Exactness-adjacent invariants (monotone N(t), fixpoint rounds <=
eccentricity+2, partitioning-bitwise-independence) are pinned in
tests/test_anf.py against exact NumPy BFS oracles.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..config import DEFAULT, EngineConfig
from .csr import load_shard
from .engine import part_to_actor_map, plan_actors


def splitmix64(x: np.ndarray, seed: int = 0) -> np.ndarray:
    """Full-width vectorized splitmix64 (uint64 in, uint64 out)."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64((seed * 0x9E3779B97F4A7C15 +
                                             0x9E3779B97F4A7C15) & (2**64 - 1))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _bit_length(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length of a uint64 array (log2 via float64
    would mis-round near 2^53)."""
    x = w.copy()
    bl = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = x >= np.uint64(1 << s)
        bl[m] += s
        x[m] >>= np.uint64(s)
    bl += (x > 0).astype(np.int64)
    return bl


def init_registers(vids: np.ndarray, p_bits: int, seed: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-vertex singleton-HLL: (register index, rho) of hash(vid)."""
    h = splitmix64(vids.astype(np.uint64), seed)
    m = 1 << p_bits
    idx = (h & np.uint64(m - 1)).astype(np.int64)
    w = h >> np.uint64(p_bits)
    rho = (64 - p_bits) - _bit_length(w) + 1  # w==0 -> 65-p_bits
    return idx, rho.astype(np.uint8)


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_estimate(R: np.ndarray, chunk: int = 1 << 16) -> np.ndarray:
    """Cardinality estimates for rows of a (n, m) uint8 register matrix
    (raw HLL + linear-counting small-range correction — the same
    estimator as ops/sketch.py's scalar HLL, row-vectorized).  Processed
    in row chunks so the float64 2^-R expansion never exceeds ~64 MB
    regardless of shard size."""
    n, m = R.shape
    est = np.empty(n, dtype=np.float64)
    if n == 0:
        return est
    tab = np.ldexp(1.0, -np.arange(65, dtype=np.int64))
    am2 = _alpha(m) * m * m
    for i in range(0, n, chunk):
        r = R[i:i + chunk]
        e = am2 / tab[r].sum(axis=1)
        zeros = (r == 0).sum(axis=1)
        small = (e <= 2.5 * m) & (zeros > 0)
        if small.any():
            e[small] = m * np.log(m / zeros[small].astype(np.float64))
        est[i:i + chunk] = e
    return est


def effective_diameter(nf, q: float = 0.9) -> float:
    """Effective diameter from a neighborhood function (HyperBall's
    standard distance metric, Boldi & Vigna 2013): the interpolated
    smallest t with ``N(t) >= q * N(max)``.  Pass ``anf(...)[1]["nf"]``."""
    if not 0 < q <= 1:
        raise ValueError("q must be in (0, 1]")
    nf = list(nf)
    if not nf:
        raise ValueError("empty neighborhood function")
    target = q * nf[-1]
    for t, v in enumerate(nf):
        if v >= target:
            if t == 0:
                return 0.0
            lo = nf[t - 1]
            return t - 1 + (target - lo) / (v - lo) if v > lo else float(t)
    return float(len(nf) - 1)


@ray.remote(num_cpus=0)
class BallShardActor:
    def __init__(self, actor_idx: int, owned: List[int], paths: Dict[int, str],
                 offsets: np.ndarray, part2actor: np.ndarray, num_actors: int,
                 p_bits: int, seed: int):
        self.idx = actor_idx
        self.owned = owned
        self.off = offsets
        self.p2a = part2actor
        self.A = num_actors
        self.m = 1 << p_bits
        self.shards: Dict[int, dict] = {}
        self.R: Dict[int, np.ndarray] = {}
        self.est: Dict[int, np.ndarray] = {}
        self.harm: Dict[int, np.ndarray] = {}
        self.sumd: Dict[int, np.ndarray] = {}
        self.changed: Dict[int, np.ndarray] = {}
        # static per-part scatter factorization
        self.esrc: Dict[int, np.ndarray] = {}       # edge -> local src row
        self.uorder: Dict[int, np.ndarray] = {}     # edges sorted by uinv
        self.uinv_sorted: Dict[int, np.ndarray] = {}
        self.part_est: Dict[int, float] = {}
        for p in owned:
            s = load_shard(paths[p])
            self.shards[p] = s
            lo, hi = s["vid_lo"], s["vid_hi"]
            size = hi - lo
            vids = np.arange(lo, hi, dtype=np.int64)
            idx, rho = init_registers(vids, p_bits, seed)
            R = np.zeros((size, self.m), dtype=np.uint8)
            R[np.arange(size), idx] = rho
            self.R[p] = R
            self.est[p] = hll_estimate(R)
            self.part_est[p] = float(self.est[p].sum())
            self.harm[p] = np.zeros(size, dtype=np.float64)
            self.sumd[p] = np.zeros(size, dtype=np.float64)
            self.changed[p] = np.ones(size, dtype=bool)
            indptr = s["indptr"]
            self.esrc[p] = np.repeat(np.arange(size, dtype=np.int64),
                                     np.diff(indptr))
            order = np.argsort(s["uinv"], kind="stable")
            self.uorder[p] = order
            self.uinv_sorted[p] = s["uinv"][order]

    def _merge(self, t: int, incoming) -> int:
        """Max-merge round-t arrivals (distance <= t) and accumulate the
        per-vertex harmonic / sum-distance deltas.  Returns # vertices
        whose registers changed."""
        n_changed = 0
        for p in self.owned:
            lo, hi = self.shards[p]["vid_lo"], self.shards[p]["vid_hi"]
            newly = np.zeros(hi - lo, dtype=bool)
            for msg in incoming:
                if msg is None:
                    continue
                vids, M = msg
                sel = (vids >= lo) & (vids < hi)
                if not sel.any():
                    continue
                local = vids[sel] - lo
                old = self.R[p][local]
                new = np.maximum(old, M[sel])
                grew = (new != old).any(axis=1)
                if grew.any():
                    gl = local[grew]
                    self.R[p][gl] = new[grew]
                    newly[gl] = True
            self.changed[p] = newly
            if newly.any():
                loc = np.flatnonzero(newly)
                new_est = hll_estimate(self.R[p][loc])
                delta = new_est - self.est[p][loc]
                self.harm[p][loc] += delta / t
                self.sumd[p][loc] += delta * t
                self.part_est[p] += float(delta.sum())
                self.est[p][loc] = new_est
                n_changed += int(loc.size)
        return n_changed

    def _scatter(self):
        """Per-unique-destination register max over edges whose src
        changed, routed by owning actor."""
        out_vids: List[List[np.ndarray]] = [[] for _ in range(self.A)]
        out_regs: List[List[np.ndarray]] = [[] for _ in range(self.A)]
        for p in self.owned:
            ch = self.changed[p]
            if not ch.any():
                continue
            s = self.shards[p]
            order = self.uorder[p]
            emask = ch[self.esrc[p]][order]
            if not emask.any():
                continue
            sel = order[emask]                      # still uinv-sorted
            groups = self.uinv_sorted[p][emask]
            starts = np.flatnonzero(np.r_[True, groups[1:] != groups[:-1]])
            # group-boundary-aligned chunks bound the (edges, m) uint8
            # gather to ~64 MB however large the active edge set is
            gmax_parts = []
            rows_cap = max(1, (1 << 26) // self.m)
            g0 = 0
            while g0 < starts.size:
                g1 = g0 + 1
                while g1 < starts.size and starts[g1] - starts[g0] < rows_cap:
                    g1 += 1
                e_lo = starts[g0]
                e_hi = starts[g1] if g1 < starts.size else sel.size
                gmax_parts.append(np.maximum.reduceat(
                    self.R[p][self.esrc[p][sel[e_lo:e_hi]]],
                    starts[g0:g1] - e_lo, axis=0))
                g0 = g1
            gmax = np.concatenate(gmax_parts) if len(gmax_parts) > 1 \
                else gmax_parts[0]
            gids = groups[starts]
            dvids = s["udsts"][gids]
            dact = self.p2a[s["udst_part"][gids]]
            aorder = np.argsort(dact, kind="stable")
            b = np.searchsorted(dact[aorder], np.arange(self.A + 1))
            for j in range(self.A):
                if b[j + 1] > b[j]:
                    rows = aorder[b[j]:b[j + 1]]
                    out_vids[j].append(dvids[rows])
                    out_regs[j].append(gmax[rows])
        msgs = []
        for j in range(self.A):
            if not out_vids[j]:
                msgs.append(None)
            elif len(out_vids[j]) == 1:
                msgs.append((out_vids[j][0], out_regs[j][0]))
            else:
                # second combiner level: the same destination appears once
                # per owned source part — max-merge per vid BEFORE sending
                # (merge's fancy assignment needs unique vids per message,
                # and this bounds the exchange by unique dsts per actor
                # pair, the same two-level combine as PageRank)
                v = np.concatenate(out_vids[j])
                r = np.concatenate(out_regs[j])
                order = np.argsort(v, kind="stable")
                v, r = v[order], r[order]
                starts = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])
                msgs.append((v[starts],
                             np.maximum.reduceat(r, starts, axis=0)))
        return msgs

    def step(self, t: int, *incoming):
        """One fused round: merge round-t arrivals, then scatter from the
        changed set.  Returns A messages + (n_changed, total_est)."""
        if t == 0:
            n_changed = sum(int(c.sum()) for c in self.changed.values())
        else:
            n_changed = self._merge(t, incoming)
        msgs = self._scatter()
        # per-part N(t) partials: the driver sums them in part order so
        # the reported neighborhood function is bitwise independent of
        # the actor layout (per-vertex outputs already are)
        return (*msgs, (n_changed, dict(self.part_est)))

    def result_tables(self):
        out = []
        for p in self.owned:
            lo, hi = self.shards[p]["vid_lo"], self.shards[p]["vid_hi"]
            size = hi - lo
            reach = self.est[p]
            sumd = self.sumd[p]
            close = np.where(sumd > 0, (reach - 1.0) / np.maximum(sumd, 1e-300),
                             0.0)
            out.append(pa.table({
                "part": pa.array(np.full(size, p, dtype=np.int32)),
                "vid": pa.array(np.arange(lo, hi, dtype=np.int64)),
                "reach_est": pa.array(reach),
                "harmonic": pa.array(self.harm[p]),
                "sum_dist_est": pa.array(sumd),
                "closeness": pa.array(close),
            }))
        return out


def anf(edges, offsets: np.ndarray, workdir: str,
        cfg: EngineConfig = DEFAULT, *, p_bits: int = 7, seed: int = 42,
        max_iters: Optional[int] = None, shards_dir: Optional[str] = None,
        lineage: Optional[dict] = None,
        num_actors: int = 0) -> Tuple["rd.Dataset", Dict]:
    """HyperBall over a DIRECTED edge table (src, dst): per-vertex
    in-ball sketches -> harmonic/closeness centralities + the
    neighborhood function.  Pass ``graph.build.symmetrize(edges)`` for
    undirected-graph semantics.

    Returns ``(ds(part, vid, reach_est, harmonic, sum_dist_est,
    closeness), info)`` with ``info["nf"]`` = [N(0), N(1), ...] and
    ``info["num_rounds"]``.
    """
    from .csr import build_csr_shards

    if not 4 <= p_bits <= 12:
        raise ValueError("p_bits must be in [4, 12]")
    max_iters = (cfg.max_iters if max_iters is None else max_iters)
    num_parts = len(offsets) - 1

    descs = build_csr_shards(edges, offsets, shards_dir or f"{workdir}/csr",
                             lineage=lineage or {"kind": "directed"})
    paths = {dd["part"]: dd["path"] for dd in descs}

    owned = plan_actors(num_parts, num_actors)
    A = len(owned)
    p2a = part_to_actor_map(owned, num_parts)
    actors = [BallShardActor.remote(i, owned[i], paths, np.asarray(offsets),
                                    p2a, A, p_bits, seed)
              for i in range(A)]
    info: Dict = {"p_bits": p_bits, "seed": seed, "iters": [], "nf": []}
    try:
        inbox: List[List] = [[] for _ in range(A)]
        for t in range(0, max_iters + 1):
            refs = [actors[j].step.options(num_returns=A + 1).remote(
                t, *inbox[j]) for j in range(A)]
            stats = ray.get([r[A] for r in refs])
            n_changed = sum(s[0] for s in stats)
            part_est = {p: v for s in stats for p, v in s[1].items()}
            total_est = sum(part_est[p] for p in sorted(part_est))
            info["iters"].append({"iter": t, "changed": int(n_changed)})
            info["nf"].append(float(total_est))
            if t > 0 and n_changed == 0:
                break
            inbox = [[refs[i][j] for i in range(A)] for j in range(A)]
        tables = [tt for ref in [a.result_tables.remote() for a in actors]
                  for tt in ray.get(ref)]
    finally:
        for a in actors:
            ray.kill(a)
    info["num_rounds"] = len(info["iters"])
    # N(t) is reported up to the fixpoint round (the last two entries are
    # equal by construction); drop the duplicate tail entry.
    if len(info["nf"]) >= 2 and info["nf"][-1] == info["nf"][-2]:
        info["nf"].pop()
    return rd.from_arrow(tables), info
