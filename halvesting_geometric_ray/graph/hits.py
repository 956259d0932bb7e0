"""HITS (hubs & authorities) — the second classic link-analysis
iteration, on the same CSR-shard actor engine as PageRank.

    a'(u) = sum_{v -> u} h(v)          (authority: in-links from hubs)
    h'(v) = sum_{v -> u} a'(u)         (hub: out-links to authorities)
    normalize each vector to unit L2 every iteration

Pipelined protocol (r3 — replaces the r2 version's 5 barriered actor
calls per round, which cost ~0.2 s/round at 600k vertices):

- the query/answer exchange for the hub update is STATIC: which dst
  vids each actor needs from each owner never changes, so the request
  sets are exchanged ONCE at setup and owners push value arrays (no
  per-round vid traffic, and the receiver's gather permutation is
  precomputed per shard);
- L2 normalization is DEFERRED: actors keep raw vectors and divide by
  the global norm of the PREVIOUS half-round, which arrives as a tiny
  scalar ObjectRef reduced by a side task — no driver barrier;
- a round is exactly two chained actor calls (step_auth -> step_hub)
  whose message refs flow actor-to-actor; the driver only collects the
  (norm, delta) scalar pairs one round BEHIND (trailing convergence
  check, PageRank's overshoot pattern — the extra submitted round is
  harmless because each step snapshots the previous round's state
  before overwriting, and write_out can publish the snapshot).

Deterministic: actor layout is fixed by plan_actors, all reductions are
order-fixed float64 sums; matches the NumPy oracle to allclose 1e-6
with identical iteration counts.

Convergence note: power iteration converges at the ratio of the top two
singular values — graphs with small spectral gaps (including the
synthetic fixtures) need many rounds at tol=1e-8; production use
typically fixes max_iters (~50).
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..config import DEFAULT, EngineConfig
from .csr import load_shard
from .engine import (drain_refs, part_to_actor_map, plan_actors,
                     scatter_refs_matrix, transpose_refs)


@ray.remote(num_cpus=0)
def _sum_scalars(*xs) -> float:
    return float(sum(xs))


@ray.remote(num_cpus=0)
def _sum_hsq(*hd) -> float:
    return float(sum(x[0] for x in hd))


@ray.remote(num_cpus=0)
class HitsShardActor:
    def __init__(self, actor_idx: int, owned: List[int], paths: Dict[int, str],
                 offsets: np.ndarray, part2actor: np.ndarray, num_actors: int):
        self.owned = owned
        self.off = offsets
        self._p2a = part2actor
        self.num_actors = num_actors
        self.shards: Dict[int, Dict] = {}
        self.h: Dict[int, np.ndarray] = {}
        self.a: Dict[int, np.ndarray] = {}
        n = float(offsets[-1])
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
            self.h[p] = np.full(size, 1.0 / np.sqrt(n), dtype=np.float64)
            self.a[p] = np.zeros(size, dtype=np.float64)
        # Static answer routing: the dst vids this actor needs for its
        # hub update, split by owning actor (sorted, possibly empty),
        # plus the per-shard gather permutation into the sender-ordered
        # concatenation of those arrays.
        allq = np.unique(np.concatenate(
            [self.shards[p]["udsts"] for p in owned
             if self.shards[p]["udsts"].size]
        )) if owned else np.empty(0, dtype=np.int64)
        if allq.size:
            part = (np.searchsorted(self.off, allq, side="right") - 1)
            dest = self._p2a[part]
            self._needs = [allq[dest == i] for i in range(num_actors)]
        else:
            self._needs = [np.empty(0, dtype=np.int64)
                           for _ in range(num_actors)]
        full = np.concatenate(self._needs) if num_actors else allq
        order = np.argsort(full, kind="stable")
        self._gather_idx: Dict[int, np.ndarray] = {}
        for p in owned:
            ud = self.shards[p]["udsts"]
            self._gather_idx[p] = order[np.searchsorted(full[order], ud)] \
                if ud.size else np.empty(0, dtype=np.int64)
        # Static per-destination vid arrays for the h-contribution
        # messages (the sums change per round, the vids never do): the
        # concatenation order below MUST match _sums_list exactly.
        self._sent_vids: List[Optional[np.ndarray]] = []
        for j in range(num_actors):
            vs = [self.shards[p]["route_udsts"][
                      self.shards[p]["route_bounds"][j]:
                      self.shards[p]["route_bounds"][j + 1]]
                  for p in owned if self.shards[p]["indices"].size]
            vs = [v for v in vs if v.size]
            self._sent_vids.append(np.concatenate(vs) if vs else None)
        self._reqs: Optional[List[np.ndarray]] = None
        # static plans built once from the setup exchanges (vid routing
        # never changes between rounds, so no per-round mask work):
        self._req_plan: Optional[List[List[Tuple]]] = None
        self._h_plan: Optional[Dict[int, Tuple]] = None
        self._a_raw: Dict[int, np.ndarray] = {}
        self._a_prev: Dict[int, np.ndarray] = {}
        self._snap: Optional[Tuple[Dict, Dict]] = None

    # -- one-time setup exchange -----------------------------------------

    def get_needs(self) -> List[np.ndarray]:
        return self._needs

    def set_requests(self, reqs: List[np.ndarray]) -> bool:
        """reqs[j] = vids actor j needs from this actor (sorted).  Also
        precomputes the per-requester answer plan (which owned part each
        requested vid lives in, and where) — static across rounds."""
        self._reqs = reqs
        self._req_plan = []
        for q in reqs:
            plans: List[Tuple] = []
            for p in self.owned:
                lo, hi = self.shards[p]["vid_lo"], self.shards[p]["vid_hi"]
                m = (q >= lo) & (q < hi)
                if m.any():
                    plans.append((p, np.nonzero(m)[0], q[m] - lo))
            self._req_plan.append(plans)
        return True

    def get_sent_vids(self) -> List[Optional[np.ndarray]]:
        """Static per-destination vid arrays for this actor's
        h-contribution messages (exchanged once; rounds ship sums only)."""
        return self._sent_vids

    def set_incoming_vids(self, vids_by_sender: List[Optional[np.ndarray]]) -> bool:
        """Build the static scatter plan for incoming h-sums:
        vids_by_sender[i] = the vids actor i's sums will cover, in the
        exact order its _sums_list concatenates them."""
        nz = [v for v in vids_by_sender if v is not None]
        full = np.concatenate(nz) if nz else np.empty(0, dtype=np.int64)
        self._h_plan = {}
        for p in self.owned:
            lo, hi = self.shards[p]["vid_lo"], self.shards[p]["vid_hi"]
            m = (full >= lo) & (full < hi)
            self._h_plan[p] = (np.nonzero(m)[0], full[m] - lo)
        return True

    def _sums_list(self) -> List[Optional[np.ndarray]]:
        """Per-destination-actor sums of RAW h over in-edges, aligned
        with the static vid arrays in self._sent_vids."""
        per_s: List[List[np.ndarray]] = [[] for _ in range(self.num_actors)]
        for p in self.owned:
            s = self.shards[p]
            if s["indices"].size == 0:
                continue
            per_edge = np.repeat(self.h[p], s["outdeg"])
            sums = np.bincount(s["uinv"], weights=per_edge,
                               minlength=len(s["udsts"]))[s["route_order"]]
            b = s["route_bounds"]
            for j in range(self.num_actors):
                if b[j + 1] > b[j]:
                    per_s[j].append(sums[b[j]:b[j + 1]])
        return [np.concatenate(per_s[j]) if per_s[j] else None
                for j in range(self.num_actors)]

    def scatter(self):
        """Initial h-contribution sums (round-0 state)."""
        out = self._sums_list()
        return tuple(out) if self.num_actors > 1 else out[0]

    # -- per-round fused steps -------------------------------------------

    def step_auth(self, hsq: float, *h_sums):
        """First half-round: apply incoming h-contribution sums (computed
        from RAW h — normalize by the global h norm passed as a scalar),
        store a_raw, and push the statically-requested a_raw values to
        every requester.  Returns A value arrays + the a-norm partial.

        All vid routing is via the static plans built at setup
        (set_incoming_vids / set_requests) — no per-round mask work."""
        inv_h = 1.0 / np.sqrt(hsq) if hsq > 0 else 0.0
        nz = [v for v in h_sums if v is not None]
        full = np.concatenate(nz) if nz else np.empty(0, dtype=np.float64)
        asq = 0.0
        for p in self.owned:
            size = self.shards[p]["vid_hi"] - self.shards[p]["vid_lo"]
            sel, loc = self._h_plan[p]
            new = np.bincount(loc, weights=full[sel], minlength=size) \
                if sel.size else np.zeros(size, dtype=np.float64)
            new *= inv_h
            self._a_raw[p] = new
            asq += float((new * new).sum())
        outs: List = []
        for j in range(self.num_actors):
            ans = np.empty(len(self._reqs[j]), dtype=np.float64)
            for p, sel, loc in self._req_plan[j]:
                ans[sel] = self._a_raw[p][loc]
            outs.append(ans)
        outs.append(asq)
        return tuple(outs)

    def step_hub(self, asq: float, *a_vals):
        """Second half-round: normalize a, compute the L1 delta vs the
        previous round, rebuild RAW h from the pushed a values, and emit
        next round's h-contribution messages.  Returns A messages +
        (h-norm partial, delta partial)."""
        inv_a = 1.0 / np.sqrt(asq) if asq > 0 else 0.0
        # snapshot the PREVIOUS round's published state: the overshoot
        # round submitted past convergence must not destroy it
        self._snap = (dict(self.a), dict(self.h))
        delta = 0.0
        for p in self.owned:
            a_n = self._a_raw[p] * inv_a
            prev = self._a_prev.get(p)
            delta += float(np.abs(a_n - prev).sum()) if prev is not None \
                else float("inf")
            self.a[p] = a_n
        self._a_prev = dict(self.a)
        full_vals = np.concatenate([np.asarray(v) for v in a_vals]) \
            if self.num_actors else np.empty(0, dtype=np.float64)
        hsq = 0.0
        for p in self.owned:
            s = self.shards[p]
            lo, hi = s["vid_lo"], s["vid_hi"]
            new = np.zeros(hi - lo, dtype=np.float64)
            if s["indices"].size and full_vals.size:
                a_of_udst = full_vals[self._gather_idx[p]] * inv_a
                per_edge = a_of_udst[s["uinv"]]
                new = np.add.reduceat(
                    np.r_[per_edge, 0.0], np.minimum(s["indptr"][:-1],
                                                     len(per_edge)))
                new[s["outdeg"] == 0] = 0.0
            self.h[p] = new  # RAW; next round's step_auth divides
            hsq += float((new * new).sum())
        msgs = self._sums_list()
        return tuple(msgs + [(hsq, delta)])

    def write_out(self, paths: Dict[int, str], hsq: float,
                  use_prev: bool) -> bool:
        """Persist (vid, authority, hub) parquet per partition — results
        stay sharded on disk, never vertex-cardinality on the driver.
        ``hsq`` is the GLOBAL h-norm square of the published round (the
        hub vector is stored raw); ``use_prev`` selects the pre-overshoot
        snapshot."""
        import pyarrow.parquet as pq

        a_d, h_d = self._snap if use_prev else (self.a, self.h)
        inv_h = 1.0 / np.sqrt(hsq) if hsq > 0 else 0.0
        for p, path in paths.items():
            lo, hi = self.shards[p]["vid_lo"], self.shards[p]["vid_hi"]
            t = pa.table({
                "vid": pa.array(np.arange(lo, hi, dtype=np.int64)),
                "authority": pa.array(a_d[p]),
                "hub": pa.array(h_d[p] * inv_h)})
            tmp = f"{path}.tmp"
            pq.write_table(t, tmp)
            os.replace(tmp, path)
        return True


def hits(edges, offsets: np.ndarray, cfg: EngineConfig = DEFAULT, *,
         tol: float = 1e-8, max_iters: int = 100,
         shards_dir: Optional[str] = None, workdir: str = "/tmp/hgr_hits",
         num_actors: int = 0) -> Tuple["rd.Dataset", Dict]:
    """HITS over the directed edge table.  Returns
    (ds(vid, authority, hub), info with per-iteration L1 deltas)."""
    from .csr import build_csr_shards

    num_parts = len(offsets) - 1
    descs = build_csr_shards(edges, offsets, shards_dir or f"{workdir}/csr",
                             lineage={"kind": "directed"})
    paths = {dd["part"]: dd["path"] for dd in descs}
    owned = plan_actors(num_parts, num_actors)
    A = len(owned)
    p2a = part_to_actor_map(owned, num_parts)
    actors = [HitsShardActor.remote(i, owned[i], paths, offsets, p2a, A)
              for i in range(A)]
    # one-time static exchange of the answer-routing request sets and
    # the h-message vid layouts (rounds then ship value arrays only)
    needs = ray.get([a.get_needs.remote() for a in actors])
    ray.get([a.set_requests.remote([needs[j][i] for j in range(A)])
             for i, a in enumerate(actors)])
    sent = ray.get([a.get_sent_vids.remote() for a in actors])
    ray.get([a.set_incoming_vids.remote([sent[i][j] for i in range(A)])
             for j, a in enumerate(actors)])
    info: Dict = {"iters": []}
    asq_ref = None
    hsq_ref = 1.0  # initial h is exactly unit-L2
    try:
        inbox = transpose_refs(scatter_refs_matrix(actors, A))
        pending: Dict[int, List] = {}
        hsq_by_round: Dict[int, float] = {}
        converged = False
        overshoot = False
        final_k = 0
        t_start = time.time()

        def commit(kk: int) -> float:
            hd = ray.get(pending.pop(kk))
            delta = float(sum(x[1] for x in hd))
            hsq_by_round[kk] = float(sum(x[0] for x in hd))
            info["iters"].append({"iter": kk, "a_delta_l1": delta,
                                  "wall_sec": round(time.time() - t_start, 4)})
            return delta

        for k in range(1, max_iters + 1):
            outs = [list(a.step_auth.options(num_returns=A + 1)
                         .remote(hsq_ref, *inbox[j]))
                    for j, a in enumerate(actors)]
            a_inbox = transpose_refs([o[:A] for o in outs])
            asq_ref = _sum_scalars.remote(*[o[A] for o in outs])
            outs2 = [list(a.step_hub.options(num_returns=A + 1)
                          .remote(asq_ref, *a_inbox[j]))
                     for j, a in enumerate(actors)]
            inbox = transpose_refs([o[:A] for o in outs2])
            hd_refs = [o[A] for o in outs2]
            hsq_ref = _sum_hsq.remote(*hd_refs)
            pending[k] = hd_refs
            final_k = k
            # trailing convergence check (one round of overlap)
            if k - 1 in pending:
                if commit(k - 1) < tol:
                    final_k = k - 1
                    converged = True
                    overshoot = True  # round k already submitted
                    break
        if not converged and final_k in pending:
            converged = commit(final_k) < tol
        pending.clear()

        out_dir = os.path.join(workdir, "hits_out")
        os.makedirs(out_dir, exist_ok=True)
        hsq_final = hsq_by_round.get(final_k, 1.0)
        ray.get([a.write_out.remote(
            {p: os.path.join(out_dir, f"part-{p:05d}.parquet")
             for p in owned[i]}, hsq_final, overshoot)
            for i, a in enumerate(actors)])
    finally:
        drain_refs(hsq_ref, asq_ref)  # overshoot reduces: consume, then kill
        for a in actors:
            ray.kill(a)

    info["num_iters"] = len(info["iters"])
    info["converged"] = bool(info["iters"] and
                             info["iters"][-1]["a_delta_l1"] < tol)
    return rd.read_parquet(out_dir), info
