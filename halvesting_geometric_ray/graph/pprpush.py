"""Approximate personalized PageRank by local push (Andersen, Chung &
Lang 2006) + conductance sweep cut — LOCAL community detection: total
work is bounded by 1 / (alpha * eps), independent of graph size, so a
single seed's community costs the same on 10^6 or 10^12 pages.

Push invariant (the directed, out-degree-normalized form whose
fixpoint matches graph/pagerank.py's seeded run on dangling-free
graphs with alpha = 1 - damping):

    p = alpha * s + (1 - alpha) * P^T p
    push at v:  p(v) += alpha * r(v);
                r(u) += (1 - alpha) * r(v) / outdeg(v)  for v -> u;
                r(v)  = 0
    ||pr - p||_1 <= ||r||_1 at every step (monotone, order-free)

Distributed synchronous variant on the CSR shard actors: every round
pushes ALL vertices with r(v) >= eps * outdeg(v) at once (residual
updates are per-unique-destination combined — the PageRank scatter
shape, but restricted to the active set, which stays support-sized);
dangling residual mass is absorbed into p directly (a dangling vertex
has no out-edges to push along — the local analogue of PageRank's
dangling redistribution is out of scope for a LOCAL estimate, and
absorbing keeps the l1 invariant exact).  Rounds end when no vertex
exceeds the threshold; eps=0-ish with max_rounds gives the exact
seeded fixpoint (tested allclose vs pagerank(seeds=...) on a
dangling-free graph).

sweep_cut: order the support by p(v)/deg(v), take the prefix with
minimum conductance — computed exactly on the driver from the
support-induced edge set (one broadcast semi-join pass over the edge
table; the support is 1/(alpha*eps)-bounded, so this is small by
construction).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..config import DEFAULT, EngineConfig
from .csr import load_shard
from .engine import part_to_actor_map, plan_actors, transpose_refs


@ray.remote(num_cpus=0)
class PushShardActor:
    def __init__(self, actor_idx: int, owned: List[int],
                 paths: Dict[int, str], offsets: np.ndarray,
                 part2actor: np.ndarray, num_actors: int,
                 alpha: float, eps: float):
        self.owned = owned
        self.off = offsets
        self.p2a = part2actor
        self.A = num_actors
        self.alpha = alpha
        self.eps = eps
        self.shards = {pp: load_shard(paths[pp]) for pp in owned}
        self.p: Dict[int, np.ndarray] = {}
        self.r: Dict[int, np.ndarray] = {}
        for pp in owned:
            n = self.shards[pp]["vid_hi"] - self.shards[pp]["vid_lo"]
            self.p[pp] = np.zeros(n, dtype=np.float64)
            self.r[pp] = np.zeros(n, dtype=np.float64)

    def seed(self, seeds: np.ndarray, mass: float):
        for pp in self.owned:
            s = self.shards[pp]
            m = (seeds >= s["vid_lo"]) & (seeds < s["vid_hi"])
            if m.any():
                self.r[pp][seeds[m] - s["vid_lo"]] = mass
        return True

    def _push_round(self):
        """Push every over-threshold owned vertex; returns per-actor
        residual delta messages + the number of pushed vertices."""
        per_v: List[List[np.ndarray]] = [[] for _ in range(self.A)]
        per_s: List[List[np.ndarray]] = [[] for _ in range(self.A)]
        pushed = 0
        for pp in self.owned:
            s = self.shards[pp]
            outdeg = s["outdeg"]
            r = self.r[pp]
            active = r >= np.maximum(self.eps * outdeg, 1e-300)
            active &= r > 0
            if not active.any():
                continue
            idx = np.flatnonzero(active)
            rv = r[idx].copy()
            pushed += idx.size
            self.p[pp][idx] += self.alpha * rv
            r[idx] = 0.0
            deg = outdeg[idx]
            dangling = deg == 0
            if dangling.any():
                # no out-edges: absorb the rest of the mass locally
                # (keeps sum p + sum r invariant at 1)
                self.p[pp][idx[dangling]] += (1 - self.alpha) * rv[dangling]
            nz = ~dangling
            if not nz.any():
                continue
            idx, rv, deg = idx[nz], rv[nz], deg[nz]
            share = (1.0 - self.alpha) * rv / deg
            indptr, indices = s["indptr"], s["indices"]
            starts = indptr[idx]
            cnt = deg
            total = int(cnt.sum())
            csum = np.concatenate(([0], np.cumsum(cnt)[:-1]))
            pos = np.repeat(starts - csum, cnt) + np.arange(total)
            nbrs = indices[pos]
            vals = np.repeat(share, cnt)
            uv, inv = np.unique(nbrs, return_inverse=True)
            sums = np.bincount(inv, weights=vals, minlength=uv.size)
            dest = self.p2a[np.searchsorted(self.off, uv,
                                            side="right") - 1]
            order = np.argsort(dest, kind="stable")
            uv, sums, dest = uv[order], sums[order], dest[order]
            b = np.searchsorted(dest, np.arange(self.A + 1))
            for j in range(self.A):
                if b[j + 1] > b[j]:
                    per_v[j].append(uv[b[j]:b[j + 1]])
                    per_s[j].append(sums[b[j]:b[j + 1]])
        msgs = []
        for j in range(self.A):
            if not per_v[j]:
                msgs.append(None)
            elif len(per_v[j]) == 1:
                msgs.append((per_v[j][0], per_s[j][0]))
            else:
                v = np.concatenate(per_v[j])
                sv = np.concatenate(per_s[j])
                uv, inv = np.unique(v, return_inverse=True)
                msgs.append((uv, np.bincount(inv, weights=sv,
                                             minlength=uv.size)))
        return msgs, pushed

    def step(self, *incoming):
        for msg in incoming:
            if msg is None:
                continue
            vids, vals = msg
            for pp in self.owned:
                s = self.shards[pp]
                m = (vids >= s["vid_lo"]) & (vids < s["vid_hi"])
                if m.any():
                    np.add.at(self.r[pp], vids[m] - s["vid_lo"],
                              vals[m])
        msgs, pushed = self._push_round()
        return (*msgs, pushed)

    def result_tables(self):
        out = []
        for pp in self.owned:
            s = self.shards[pp]
            lo = s["vid_lo"]
            nz = np.flatnonzero((self.p[pp] > 0) | (self.r[pp] > 0))
            if nz.size == 0:
                continue
            out.append(pa.table({
                "vid": pa.array((nz + lo).astype(np.int64)),
                "p": pa.array(self.p[pp][nz]),
                "r": pa.array(self.r[pp][nz]),
                "outdeg": pa.array(s["outdeg"][nz].astype(np.int64)),
            }))
        return out


def ppr_push(edges, offsets: np.ndarray, workdir: str,
             seeds: np.ndarray, cfg: EngineConfig = DEFAULT, *,
             alpha: float = 0.15, eps: float = 1e-6,
             max_rounds: int = 1000,
             shards_dir: Optional[str] = None,
             num_actors: int = 0) -> Tuple["rd.Dataset", Dict]:
    """Local push approximation of seeded PageRank over the directed
    edge table.  Returns (ds(vid, p, r, outdeg) — SUPPORT ONLY — and
    info); sum(p) + sum(r) == 1 and ||pr - p||_1 <= sum(r)."""
    from .csr import build_csr_shards

    seeds = np.unique(np.asarray(seeds, dtype=np.int64))
    N = int(offsets[-1])
    if seeds.size == 0:
        raise ValueError("seeds must be non-empty")
    if seeds[0] < 0 or seeds[-1] >= N:
        raise ValueError(f"seeds out of range [0, {N})")
    if not (0.0 < alpha < 1.0):
        raise ValueError("alpha must be in (0, 1)")
    if eps < 0:
        raise ValueError("eps must be >= 0")
    num_parts = len(offsets) - 1
    descs = build_csr_shards(edges, offsets,
                             shards_dir or f"{workdir}/csr",
                             lineage={"kind": "directed"})
    paths = {dd["part"]: dd["path"] for dd in descs}
    owned = plan_actors(num_parts, num_actors)
    A = len(owned)
    p2a = part_to_actor_map(owned, num_parts)
    actors = [PushShardActor.remote(i, owned[i], paths,
                                    np.asarray(offsets), p2a, A,
                                    alpha, eps) for i in range(A)]
    info: Dict = {"alpha": alpha, "eps": eps,
                  "seeds": [int(s) for s in seeds], "rounds": []}
    try:
        ray.get([a.seed.remote(seeds, 1.0 / seeds.size) for a in actors])
        inbox = [[None] * A for _ in range(A)]
        for k in range(max_rounds):
            refs = [list(actors[j].step.options(num_returns=A + 1)
                         .remote(*inbox[j])) for j in range(A)]
            pushed = int(sum(ray.get([r[A] for r in refs])))
            info["rounds"].append(pushed)
            if pushed == 0:
                break
            inbox = transpose_refs([r[:A] for r in refs])
        tables = [tt for ref in [a.result_tables.remote() for a in actors]
                  for tt in ray.get(ref)]
    finally:
        for a in actors:
            ray.kill(a)
    if not tables:
        tables = [pa.schema([
            pa.field("vid", pa.int64()), pa.field("p", pa.float64()),
            pa.field("r", pa.float64()),
            pa.field("outdeg", pa.int64())]).empty_table()]
    info["num_rounds"] = len(info["rounds"])
    info["total_pushes"] = int(sum(info["rounds"]))
    return rd.from_arrow(tables), info


def local_cluster(edges, offsets: np.ndarray, workdir: str,
                  seed_vid: int, cfg: EngineConfig = DEFAULT, *,
                  alpha: float = 0.15, eps: float = 1e-5,
                  shards_dir: Optional[str] = None,
                  num_actors: int = 0) -> Tuple[np.ndarray, float, Dict]:
    """ACL local community of ``seed_vid``: PPR push + the minimum-
    conductance sweep cut over the support (ordered by p/deg on the
    SYMMETRIZED degree).  Returns (member vids sorted, conductance,
    info).  Driver work is support-sized by construction."""
    from ..ops.join import broadcast_semi

    sup, info = ppr_push(edges, offsets, workdir,
                         np.array([seed_vid], dtype=np.int64),
                         cfg, alpha=alpha, eps=eps,
                         shards_dir=shards_dir, num_actors=num_actors)
    sdf = sup.to_pandas()
    if sdf.empty:
        return np.array([seed_vid], dtype=np.int64), 1.0, info
    vids = sdf.vid.to_numpy()
    keys = pa.table({"vid": pa.array(vids)})
    # canonical undirected edge list (each edge ONCE — symmetrize
    # double-counts reciprocal pairs and pre-symmetric inputs): the one
    # global exchange this local algorithm pays, and the thing
    # conductance is defined over
    import pyarrow.compute as pc

    from ..ops.agg import grouped_aggregate
    from ..ops.dedup import distinct

    def canon(b: pa.Table) -> pa.Table:
        sv = b.column("src").to_numpy()
        dv = b.column("dst").to_numpy()
        keep = sv != dv
        sv, dv = sv[keep], dv[keep]
        return pa.table({"src": pa.array(np.minimum(sv, dv)),
                         "dst": pa.array(np.maximum(sv, dv))})

    und = distinct(edges.map_batches(canon, batch_format="pyarrow",
                                     zero_copy_batch=True),
                   ["src", "dst"], num_parts=cfg.num_parts).materialize()
    m2 = 2 * int(und.count())
    # support-induced edges (support-sized by the ACL bound)
    epdf = broadcast_semi(
        broadcast_semi(und, "src", keys, "vid"),
        "dst", keys, "vid").to_pandas()
    # undirected support degrees: endpoint incidences over the canon list
    d1 = grouped_aggregate(broadcast_semi(und, "src", keys, "vid"),
                           ["src"], {"deg": ("count", None)},
                           num_parts=cfg.num_parts).to_pandas()
    d2 = grouped_aggregate(broadcast_semi(und, "dst", keys, "vid"),
                           ["dst"], {"deg": ("count", None)},
                           num_parts=cfg.num_parts).to_pandas()
    deg_of: Dict[int, int] = {}
    for _, row in d1.iterrows():
        deg_of[int(row.src)] = deg_of.get(int(row.src), 0) + int(row.deg)
    for _, row in d2.iterrows():
        deg_of[int(row.dst)] = deg_of.get(int(row.dst), 0) + int(row.deg)
    pvals = dict(zip(sdf.vid, sdf.p))
    order = sorted(vids, key=lambda v: (-pvals[v] / max(deg_of.get(v, 0), 1),
                                        v))
    adj: Dict[int, set] = {}
    for a, b in zip(epdf.src, epdf.dst):
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    best_phi, best_k = 1.0, 1
    vol, cut = 0, 0
    inset: set = set()
    for i, v in enumerate(order):
        d = int(deg_of.get(v, 0))
        inner = sum(1 for u in adj.get(v, ()) if u in inset)
        vol += d
        cut += d - 2 * inner
        inset.add(v)
        den = min(vol, m2 - vol)
        if den > 0:
            phi = cut / den
            if phi < best_phi:
                best_phi, best_k = phi, i + 1
    members = np.array(sorted(int(v) for v in order[:best_k]),
                       dtype=np.int64)
    info["support_size"] = int(vids.size)
    info["conductance"] = float(best_phi)
    return members, float(best_phi), info
