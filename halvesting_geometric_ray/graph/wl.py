"""Weisfeiler-Lehman (1-WL) color refinement on the CSR shard engine.

Iteratively refines a per-vertex color by hashing each vertex's own
color together with the MULTISET of its neighbors' colors:

    c_0(v)   = deg(v)
    c_{t+1}(v) = mix(c_t(v), H(c_t(u) : u ~ v))

until the induced partition stops refining.  The fixpoint is the
coarsest EQUITABLE partition — the classic structural-role /
graph-fingerprint signal (WL is the expressive ceiling of
message-passing GNNs; color histograms are the WL-kernel features, and
per-vertex colors group pages with identical local link structure —
template/mirror-family detection one level beyond degree).  The
reference has no structural-role machinery; this extends the engine's
fingerprint family (simhash / mirror-LSH) with the exact-refinement
counterpart.

Multiset hash: instead of sorting each neighborhood (per-vertex
segment sorts every round), H is a COMMUTATIVE pair of independent
splitmix64-mixed uint64 sums plus the neighbor count — order-free, so
one ``np.add.at`` per shard absorbs the whole inbox.  Two independent
64-bit sums + count make accidental multiset collisions ~2^-128 per
comparison; a collision could only ever MERGE classes (never split),
and the sequential replay + semantic partition oracles in
tests/test_wl.py pin exactness at test scale.

Engine shape: one actor call per round — every vertex scatters its
color along every edge (E messages, routing order precomputed once in
``__init__``), receivers fold sums via add.at, rehash, and return
their distinct owned colors.  Convergence = global distinct-color
count unchanged (refinement is monotone, so equal counts <=> equal
partition).  The driver folds only per-shard UNIQUE color arrays
(O(#classes) driver state — bounded by the class count, not E; swap
the exact fold for a mergeable sketch if classes ever approach vertex
count at web scale).  Colors are pure functions of the edge set —
bitwise actor-layout- and partitioning-independent; the returned
labels are dense ranks of the final colors (canonical).
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

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over a uint64 array (vectorized, exact)."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + _GOLD
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def wl_update(own: np.ndarray, s1: np.ndarray, s2: np.ndarray,
              cnt: np.ndarray) -> np.ndarray:
    """c' = mix(own, commutative-multiset digest) — the pinned update."""
    with np.errstate(over="ignore"):
        return mix64(mix64(own) ^ mix64(s1)
                     ^ mix64(s2 + _GOLD) ^ mix64(cnt.astype(np.uint64)))


@ray.remote(num_cpus=0)
class WlShardActor:
    def __init__(self, actor_idx: int, owned: List[int],
                 paths: Dict[int, str], offsets: np.ndarray,
                 part2actor: np.ndarray, num_actors: int):
        self.owned = owned
        self.off = offsets
        self.num_actors = num_actors
        self.shards = {p: load_shard(paths[p]) for p in owned}
        self.colors: Dict[int, np.ndarray] = {}
        # precompute per-part edge routing: destination order + actor
        # boundaries (reused every round — scatter is then a gather +
        # one permutation)
        self.route: Dict[int, tuple] = {}
        for p in owned:
            s = self.shards[p]
            deg = np.diff(s["indptr"])
            self.colors[p] = deg.astype(np.uint64)  # c_0 = degree
            nbr = s["indices"]
            part = np.searchsorted(offsets, nbr, side="right") - 1
            dest = part2actor[part]
            order = np.argsort(dest, kind="stable")
            bounds = np.searchsorted(dest[order],
                                     np.arange(num_actors + 1))
            srcrow = np.repeat(np.arange(len(deg)), deg)
            self.route[p] = (nbr[order], srcrow[order], bounds)

    def scatter(self):
        """Ship (neighbor vid, my color) along every edge."""
        per = [[] for _ in range(self.num_actors)]
        for p in self.owned:
            nbr_sorted, srcrow_sorted, b = self.route[p]
            vals = self.colors[p][srcrow_sorted]
            for j in range(self.num_actors):
                if b[j + 1] > b[j]:
                    per[j].append((nbr_sorted[b[j]:b[j + 1]],
                                   vals[b[j]:b[j + 1]]))
        out = tuple(
            (np.concatenate([c[0] for c in chunks]),
             np.concatenate([c[1] for c in chunks])) if chunks else None
            for chunks in per)
        # num_returns=1 means "return the value itself", not a 1-tuple
        return out[0] if self.num_actors == 1 else out

    def refine(self, *incoming):
        """Fold the inbox into commutative sums, rehash, return owned
        distinct colors."""
        acc = {}
        for p in self.owned:
            n = len(self.colors[p])
            acc[p] = (np.zeros(n, dtype=np.uint64),
                      np.zeros(n, dtype=np.uint64),
                      np.zeros(n, dtype=np.int64))
        for msg in incoming:
            if msg is None:
                continue
            nbr, val = msg
            for p in self.owned:
                s = self.shards[p]
                lo, hi = s["vid_lo"], s["vid_hi"]
                m = (nbr >= lo) & (nbr < hi)
                if not m.any():
                    continue
                rows = nbr[m] - lo
                v = val[m]
                s1, s2, cnt = acc[p]
                with np.errstate(over="ignore"):
                    np.add.at(s1, rows, mix64(v))
                    np.add.at(s2, rows, mix64(v ^ _GOLD))
                np.add.at(cnt, rows, 1)
        uniqs = []
        for p in self.owned:
            s1, s2, cnt = acc[p]
            self.colors[p] = wl_update(self.colors[p], s1, s2, cnt)
            uniqs.append(np.unique(self.colors[p]))
        return np.unique(np.concatenate(uniqs)) if uniqs else \
            np.zeros(0, dtype=np.uint64)

    def distinct(self):
        return np.unique(np.concatenate(
            [self.colors[p] for p in self.owned])) \
            if self.owned else np.zeros(0, dtype=np.uint64)

    def result_tables(self, rank_of: np.ndarray):
        """Final colors -> dense ranks via the broadcast sorted unique
        color array."""
        out = []
        for p in self.owned:
            lo = self.shards[p]["vid_lo"]
            c = self.colors[p]
            out.append(pa.table({
                "vid": pa.array(np.arange(lo, lo + len(c),
                                          dtype=np.int64)),
                "wl_color": pa.array(
                    np.searchsorted(rank_of, c).astype(np.int64)),
            }))
        return out


def wl_refinement(sym_edges, offsets: np.ndarray, workdir: str,
                  cfg: EngineConfig = DEFAULT, *,
                  max_rounds: int = 20,
                  num_actors: int = 0,
                  shards_dir: Optional[str] = None
                  ) -> Tuple["rd.Dataset", Dict]:
    """1-WL color refinement over a SYMMETRIZED self-loop-free edge
    table (the CSR build collapses duplicates, so neighborhoods are
    sets — classic WL-1 on the simple graph).  Returns
    (ds(vid, wl_color dense-rank int64), info) with info["rounds"] the
    per-round class counts; stops when the partition stabilizes."""
    from .csr import build_csr_shards

    num_parts = len(offsets) - 1
    descs = build_csr_shards(sym_edges, offsets,
                             shards_dir or f"{workdir}/csr_sym",
                             lineage={"kind": "sym"})
    paths = {dd["part"]: dd["path"] for dd in descs}
    owned = plan_actors(num_parts, num_actors)
    A = len(owned)
    p2a = part_to_actor_map(owned, num_parts)
    actors = [WlShardActor.remote(i, owned[i], paths,
                                  np.asarray(offsets), p2a, A)
              for i in range(A)]
    info: Dict = {"n": int(offsets[-1]), "rounds": []}
    t0 = time.time()
    try:
        prev_classes = len(np.unique(np.concatenate(
            ray.get([a.distinct.remote() for a in actors]))))
        info["rounds"].append({"round": 0, "n_classes": prev_classes})
        for rnd in range(1, max_rounds + 1):
            if A == 1:
                inbox = [[actors[0].scatter.remote()]]
            else:
                s_outs = [list(actors[j].scatter.options(num_returns=A)
                               .remote()) for j in range(A)]
                inbox = transpose_refs(s_outs)
            uniq = ray.get([actors[j].refine.remote(*inbox[j])
                            for j in range(A)])
            n_classes = len(np.unique(np.concatenate(uniq)))
            info["rounds"].append({"round": rnd, "n_classes": n_classes})
            if n_classes == prev_classes:
                info["converged"] = True
                break
            prev_classes = n_classes
        else:
            info["converged"] = False
        final = np.unique(np.concatenate(
            ray.get([a.distinct.remote() for a in actors])))
        rank_ref = ray.put(final)
        tables = [t for ref in [a.result_tables.remote(rank_ref)
                                for a in actors]
                  for t in ray.get(ref)]
    finally:
        for a in actors:
            ray.kill(a)
    info["num_rounds"] = len(info["rounds"]) - 1
    info["n_classes"] = int(info["rounds"][-1]["n_classes"])
    info["wall_s"] = round(time.time() - t0, 3)
    ds = rd.from_arrow(tables) if tables else rd.from_arrow(
        pa.table({"vid": pa.array([], type=pa.int64()),
                  "wl_color": pa.array([], type=pa.int64())}))
    return ds, info
