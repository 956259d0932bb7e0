"""Katz centrality on the CSR shard-actor engine.

The third classic link-analysis score next to PageRank/HITS (Katz
1953): a vertex is central if many (short) directed paths lead INTO it,
with paths of length k discounted by alpha^k —

    x'(v) = beta + alpha * sum_{u -> v} w_uv * x(u)
    iterate until  ||x' - x||_1 < tol

Unlike PageRank there is NO out-degree normalization and no teleport
mass conservation: the fixpoint x = beta * (I - alpha * A^T)^{-1} 1
exists iff alpha < 1 / lambda_max(A).  The driver guards divergence
explicitly (monotone-increasing L1 delta) instead of silently looping
to max_iters with exploding floats.

Execution model is PageRank's (graph/engine.py): shard actors pin the
directed CSR (SAME {workdir}/csr cache + "directed" lineage as
pagerank/hits, so the three link-analysis scores share one shard
build), a round is one actor call (apply incoming sums -> emit next
round's per-unique-destination partials via the two-level combiner).
Rounds are barriered on a scalar L1 reduce — Katz is a fixed-iteration
analytics score, not the north-rule checkpoint path, so it skips
PageRank's pipelined-overshoot/manifest machinery; restartability comes
from the cached CSR shards (the expensive artifact) plus geometric
convergence from any init.

Semantic anchor: the reference's neighbor-aggregation message passing
(halvesting_geometric/modules/sage.py:56-82) — Katz is the linear,
un-normalized special case.

Deterministic: actor layout fixed by plan_actors, per-destination
combines are order-fixed float64 bincounts; matches the NumPy oracle
to allclose 1e-9 with identical iteration counts
(tests/test_katz.py).
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
class KatzShardActor:
    """Owns partitions' CSR shards + Katz vectors across rounds."""

    def __init__(self, actor_idx: int, owned: List[int],
                 paths: Dict[int, str], offsets: np.ndarray,
                 part2actor: np.ndarray, num_actors: int,
                 alpha: float, beta: float):
        self.owned = owned
        self.num_actors = num_actors
        self.alpha = alpha
        self.beta = beta
        self.shards: Dict[int, Dict] = {}
        self.x: Dict[int, np.ndarray] = {}
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
            # x_0 = beta everywhere (the k=0 term of the Katz series);
            # each round adds the next path-length term.
            self.x[p] = np.full(size, beta, dtype=np.float64)

    def _scatter_msgs(self):
        """Per-destination-actor (vids, partial_sums) of sum_{u->v} x_u
        (optionally weighted) — PageRank's two-level combiner without
        the out-degree division."""
        per_dest_v: List[List[np.ndarray]] = \
            [[] for _ in range(self.num_actors)]
        per_dest_s: List[List[np.ndarray]] = \
            [[] for _ in range(self.num_actors)]
        for p in self.owned:
            s = self.shards[p]
            if s["indices"].size == 0:
                continue
            per_edge = np.repeat(self.x[p], s["outdeg"])
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
        out = self._scatter_msgs()
        return tuple(out) if self.num_actors > 1 else out[0]

    def step(self, *incoming):
        """Apply round-k contributions (x <- beta + alpha * contrib),
        emit round-(k+1) messages.  Returns A msgs + the L1 partial."""
        l1 = 0.0
        for p in self.owned:
            s = self.shards[p]
            lo, hi = s["vid_lo"], s["vid_hi"]
            contrib = np.zeros(hi - lo, dtype=np.float64)
            for msg in incoming:
                if msg is None:
                    continue
                vids, vals = msg
                m = (vids >= lo) & (vids < hi)
                if m.any():
                    np.add.at(contrib, vids[m] - lo, vals[m])
            new = self.beta + self.alpha * contrib
            l1 += float(np.abs(new - self.x[p]).sum())
            self.x[p] = new
        msgs = self._scatter_msgs()
        return (*msgs, l1)

    def result_tables(self, norm: float = 1.0):
        out = []
        for p in self.owned:
            s = self.shards[p]
            lo, hi = s["vid_lo"], s["vid_hi"]
            out.append(pa.table({
                "part": pa.array(np.full(hi - lo, p, dtype=np.int32)),
                "vid": pa.array(np.arange(lo, hi, dtype=np.int64)),
                "katz": pa.array(self.x[p] * norm),
            }))
        return out

    def sq_sum(self) -> float:
        return float(sum((self.x[p] ** 2).sum() for p in self.owned))


def katz(edges, offsets: np.ndarray, workdir: str,
         cfg: EngineConfig = DEFAULT, *,
         alpha: float = 0.05, beta: float = 1.0,
         tol: float = 1e-9, max_iters: Optional[int] = None,
         normalize: bool = False,
         weight_col: Optional[str] = None,
         shards_dir: Optional[str] = None,
         num_actors: int = 0) -> Tuple["rd.Dataset", Dict]:
    """Katz centrality over the directed edge table.  Returns
    (ds(part, vid, katz), info); info carries per-iteration L1 deltas.

    alpha must satisfy alpha < 1/lambda_max(A) for the series to
    converge; lambda_max is bounded by the max in/out degree, so on web
    graphs a small alpha (default 0.05) is the safe operating point.
    Divergence (L1 delta rising for `patience` consecutive rounds) is
    raised as ValueError rather than looping to max_iters on exploding
    floats.

    normalize=True scales the result to unit L2 norm (score SHAPE, the
    common reporting convention); raw beta-scaled values otherwise.

    weight_col: POSITIVE edge weights — contribution becomes
    w_uv * x(u) (duplicate (src, dst) sum weights per the weighted-CSR
    contract), sharing pagerank's weighted shard cache."""
    from .csr import build_csr_shards

    max_iters = cfg.max_iters if max_iters is None else max_iters
    if not (0.0 < alpha < 1.0):
        raise ValueError(f"alpha must be in (0, 1); got {alpha}")
    if beta <= 0.0:
        raise ValueError(f"beta must be positive; got {beta}")
    N = int(offsets[-1])
    num_parts = len(offsets) - 1
    if N == 0:
        import pandas as _pd

        return rd.from_pandas(_pd.DataFrame(
            {"part": _pd.Series([], dtype="int32"),
             "vid": _pd.Series([], dtype="int64"),
             "katz": _pd.Series([], dtype="float64")})), \
            {"iters": [], "num_iters": 0, "converged": True}

    # Shared shard cache with pagerank/hits (one "directed" lineage).
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
    actors = [KatzShardActor.remote(i, owned[i], paths,
                                    np.asarray(offsets), p2a, A,
                                    alpha, beta)
              for i in range(A)]
    info: Dict = {"alpha": alpha, "beta": beta, "iters": []}
    patience = 8
    rising = 0
    prev_l1 = None
    t0 = time.time()
    try:
        outs = [list(a.scatter.options(num_returns=A).remote())
                if A > 1 else [a.scatter.remote()] for a in actors]
        inbox = transpose_refs(outs)
        converged = False
        for k in range(1, max_iters + 1):
            outs = [list(actors[j].step.options(num_returns=A + 1)
                         .remote(*inbox[j])) for j in range(A)]
            # actor-order sum: deterministic float accumulation
            l1 = float(sum(ray.get([o[A] for o in outs])))
            inbox = transpose_refs([o[:A] for o in outs])
            info["iters"].append({"iter": k, "l1": l1})
            if prev_l1 is not None and l1 > prev_l1:
                rising += 1
                if rising >= patience:
                    raise ValueError(
                        f"katz diverging: L1 delta rose {patience} "
                        f"consecutive rounds (alpha={alpha} likely >= "
                        "1/lambda_max) — reduce alpha")
            else:
                rising = 0
            prev_l1 = l1
            if l1 < tol:
                converged = True
                break
        norm = 1.0
        if normalize:
            sq = float(sum(ray.get([a.sq_sum.remote() for a in actors])))
            norm = 1.0 / np.sqrt(sq) if sq > 0 else 1.0
        tables = [t for ref in [a.result_tables.remote(norm)
                                for a in actors]
                  for t in ray.get(ref)]
    finally:
        for a in actors:
            ray.kill(a)
    info["num_iters"] = len(info["iters"])
    info["converged"] = converged
    info["wall_sec"] = round(time.time() - t0, 4)
    return rd.from_arrow(tables), info
