"""Eigenvector centrality on the CSR shard-actor engine.

Power iteration on the in-link operator (von Mises 1929; Bonacich
1972):

    y_{k+1}(v) = sum_{u -> v} w_uv * x_k(u)     (raw gather)
    x_{k+1}    = y_{k+1} / ||y_{k+1}||_2         (global normalization)
    iterate until ||x_{k+1} - x_k||_1 < tol

The fixpoint is the principal eigenvector of A^T — the "a vertex is
central if central vertices link to it" score, the un-damped ancestor
of both PageRank (add teleport + out-degree normalization) and Katz
(add the beta offset, drop the normalization).

Execution model is Katz's (graph/katz.py): shard actors pin the
directed CSR (SAME {workdir}/csr cache + "directed" lineage as
pagerank/hits/katz, so all four link-analysis scores share one shard
build); a round is ONE actor call + a scalar reduce.  Normalization is
DEFERRED, HITS-style (graph/hits.py r3): actors keep RAW vectors and
scatter raw contributions; the receiver divides by the global L2 norm
of the round that produced them, which the driver passes in as a
scalar — A^T (x/s) == (A^T x)/s, so the math is unchanged and no extra
barrier is paid.  The L1 convergence delta therefore trails one round
(delta reported at round k+1 compares x_k vs x_{k-1}), costing at most
one extra round.

Zero-in-degree vertices converge to score 0; a graph whose every
vertex has zero in-degree (no edges) raises ValueError rather than
dividing by a zero norm.  As with HITS, convergence speed is the
spectral gap; production use fixes max_iters (~100).

Semantic anchor: the reference's neighbor-aggregation message passing
(halvesting_geometric/modules/sage.py:56-82) — eigenvector centrality
is its linear, globally-renormalized special case.

Deterministic: actor layout fixed by plan_actors, per-destination
combines are order-fixed float64 bincounts, the norm reduce is an
actor-order sum; matches the NumPy oracle to allclose 1e-9 with
identical iteration counts (tests/test_eigenvector.py).
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
class EigShardActor:
    """Owns partitions' CSR shards + raw/normalized vectors across
    rounds (raw y scattered, normalization deferred to the receiver)."""

    def __init__(self, actor_idx: int, owned: List[int],
                 paths: Dict[int, str], offsets: np.ndarray,
                 part2actor: np.ndarray, num_actors: int, n_total: int):
        self.owned = owned
        self.num_actors = num_actors
        self.shards: Dict[int, Dict] = {}
        self.y: Dict[int, np.ndarray] = {}       # raw, pre-normalization
        self.x_prev: Dict[int, np.ndarray] = {}  # previous NORMALIZED x
        for p in owned:
            s = dict(load_shard(paths[p]))
            dest = part2actor[s["udst_part"]]
            order = np.argsort(dest, kind="stable")
            s["route_order"] = order
            s["route_udsts"] = s["udsts"][order]
            s["route_bounds"] = np.searchsorted(dest[order],
                                                np.arange(num_actors + 1))
            self.shards[p] = s
            size = s["vid_hi"] - s["vid_lo"]
            # x_0 = 1/sqrt(N): exactly unit-L2, so the first round's
            # incoming raw messages are already normalized inputs.
            self.y[p] = np.full(size, 1.0 / np.sqrt(n_total),
                                dtype=np.float64)
            self.x_prev[p] = self.y[p].copy()

    def _scatter_msgs(self, scale: float):
        """Per-destination-actor (vids, partials) of
        scale * sum_{u->v} w_uv * y_u — Katz's two-level combiner; the
        scale folds the deferred normalization into the scatter."""
        per_dest_v: List[List[np.ndarray]] = \
            [[] for _ in range(self.num_actors)]
        per_dest_s: List[List[np.ndarray]] = \
            [[] for _ in range(self.num_actors)]
        for p in self.owned:
            s = self.shards[p]
            if s["indices"].size == 0:
                continue
            per_edge = np.repeat(self.y[p] * scale, s["outdeg"])
            w = s.get("weights")
            if w is not None:
                per_edge = per_edge * w
            sums = np.bincount(s["uinv"], weights=per_edge,
                               minlength=len(s["udsts"]))[s["route_order"]]
            b = s["route_bounds"]
            for j in range(self.num_actors):
                if b[j + 1] > b[j]:
                    per_dest_v[j].append(s["route_udsts"][b[j]:b[j + 1]])
                    per_dest_s[j].append(sums[b[j]:b[j + 1]])
        out = []
        for j in range(self.num_actors):
            if not per_dest_v[j]:
                out.append(None)
            elif len(per_dest_v[j]) == 1:
                out.append((per_dest_v[j][0], per_dest_s[j][0]))
            else:
                v = np.concatenate(per_dest_v[j])
                sv = np.concatenate(per_dest_s[j])
                uv, inv = np.unique(v, return_inverse=True)
                out.append((uv, np.bincount(inv, weights=sv,
                                            minlength=len(uv))))
        return out

    def scatter(self):
        """Round-0 messages from the (exactly unit-L2) init."""
        out = self._scatter_msgs(1.0)
        return tuple(out) if self.num_actors > 1 else out[0]

    def step(self, inv_norm: float, *incoming):
        """One power-iteration round.  ``incoming`` are raw A^T y
        partials of the previous round; ``inv_norm`` is 1/||y_prev||_2
        (global), so contrib = incoming * inv_norm == A^T x_prev.
        Returns next round's raw messages + (sq_sum, l1_delta)
        partials; the delta compares the two latest NORMALIZED
        vectors (trails one round)."""
        sq = 0.0
        l1 = 0.0
        for p in self.owned:
            s = self.shards[p]
            lo, hi = s["vid_lo"], s["vid_hi"]
            x_now = self.y[p] * inv_norm  # normalize the stored raw
            l1 += float(np.abs(x_now - self.x_prev[p]).sum())
            self.x_prev[p] = x_now
            contrib = np.zeros(hi - lo, dtype=np.float64)
            for msg in incoming:
                if msg is None:
                    continue
                vids, vals = msg
                m = (vids >= lo) & (vids < hi)
                if m.any():
                    np.add.at(contrib, vids[m] - lo, vals[m])
            new = contrib * inv_norm  # = A^T x_prev (raw for next round)
            sq += float((new * new).sum())
            self.y[p] = new
        msgs = self._scatter_msgs(1.0)
        return (*msgs, (sq, l1))

    def result_tables(self, inv_norm: float):
        out = []
        for p in self.owned:
            s = self.shards[p]
            lo, hi = s["vid_lo"], s["vid_hi"]
            out.append(pa.table({
                "part": pa.array(np.full(hi - lo, p, dtype=np.int32)),
                "vid": pa.array(np.arange(lo, hi, dtype=np.int64)),
                "eigenvector": pa.array(self.y[p] * inv_norm),
            }))
        return out


def eigenvector_centrality(
        edges, offsets: np.ndarray, workdir: str,
        cfg: EngineConfig = DEFAULT, *,
        tol: float = 1e-9, max_iters: Optional[int] = None,
        weight_col: Optional[str] = None,
        shards_dir: Optional[str] = None,
        num_actors: int = 0) -> Tuple["rd.Dataset", Dict]:
    """Principal-eigenvector (in-link) centrality over the directed
    edge table.  Returns (ds(part, vid, eigenvector), info); the score
    vector is unit-L2.  info carries per-iteration (l1, norm).

    weight_col: POSITIVE edge weights — contribution becomes
    w_uv * x(u) (duplicate (src, dst) sum weights per the weighted-CSR
    contract), sharing pagerank's weighted shard cache."""
    from .csr import build_csr_shards

    max_iters = cfg.max_iters if max_iters is None else max_iters
    N = int(offsets[-1])
    num_parts = len(offsets) - 1
    if N == 0:
        import pandas as _pd

        return rd.from_pandas(_pd.DataFrame(
            {"part": _pd.Series([], dtype="int32"),
             "vid": _pd.Series([], dtype="int64"),
             "eigenvector": _pd.Series([], dtype="float64")})), \
            {"iters": [], "num_iters": 0, "converged": True}

    # Shared shard cache with pagerank/hits/katz (one lineage).
    if weight_col is None:
        descs = build_csr_shards(edges, offsets,
                                 shards_dir or f"{workdir}/csr",
                                 lineage={"kind": "directed"})
    else:
        descs = build_csr_shards(edges, offsets,
                                 shards_dir or f"{workdir}/csr_w",
                                 lineage={"kind": "directed-weighted"},
                                 weight_col=weight_col)
    paths = {dd["part"]: dd["path"] for dd in descs}
    owned = plan_actors(num_parts, num_actors)
    A = len(owned)
    p2a = part_to_actor_map(owned, num_parts)
    actors = [EigShardActor.remote(i, owned[i], paths,
                                   np.asarray(offsets), p2a, A, N)
              for i in range(A)]
    info: Dict = {"iters": []}
    t0 = time.time()
    inv_norm = 1.0  # x_0 is exactly unit-L2
    try:
        outs = [list(a.scatter.options(num_returns=A).remote())
                if A > 1 else [a.scatter.remote()] for a in actors]
        inbox = transpose_refs(outs)
        converged = False
        for k in range(1, max_iters + 1):
            outs = [list(actors[j].step.options(num_returns=A + 1)
                         .remote(inv_norm, *inbox[j])) for j in range(A)]
            # actor-order sums: deterministic float accumulation
            parts = ray.get([o[A] for o in outs])
            sq = float(sum(p[0] for p in parts))
            l1 = float(sum(p[1] for p in parts))
            inbox = transpose_refs([o[:A] for o in outs])
            if sq <= 0.0:
                raise ValueError(
                    "eigenvector centrality undefined: A^T x vanished "
                    "(every vertex has zero in-degree)")
            inv_norm = 1.0 / np.sqrt(sq)
            info["iters"].append({"iter": k, "l1": l1,
                                  "norm": float(np.sqrt(sq))})
            # l1 trails one round (k's delta compares x_{k-1}, x_{k-2})
            if k >= 2 and l1 < tol:
                converged = True
                break
        tables = [t for ref in [a.result_tables.remote(inv_norm)
                                for a in actors]
                  for t in ray.get(ref)]
    finally:
        for a in actors:
            ray.kill(a)
    info["num_iters"] = len(info["iters"])
    info["converged"] = converged
    info["wall_sec"] = round(time.time() - t0, 4)
    return rd.from_arrow(tables), info
