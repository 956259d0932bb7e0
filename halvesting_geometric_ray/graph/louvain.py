"""Distributed Louvain community detection (multi-level modularity).

The standard web-corpus community algorithm (Blondel et al. 2008),
re-expressed as BSP rounds on the CSR shard-actor engine + pure
Ray-Data contraction between levels:

Phase 1 (local moving), synchronous sub-rounds on shard actors —
  a vertex v evaluates moving to a neighbor community C by the
  modularity gain comparison (all terms share the 1/m2 scale):

      score(C)   = k_{v,C}     - resolution * k_v * Sigma_tot(C)    / m2
      score(stay)= k_{v,D\\v}  - resolution * k_v * (Sigma_tot(D)-k_v)/m2

  moving to the best-scoring C (ties -> smallest community id) iff it
  beats staying by > gain_eps.  Parallel synchronous moving admits
  limit cycles (synchronized hopping between symmetric halves of a
  clique is period-2 under any fixed schedule), so sub-round t
  activates a STATELESS-HASH random half of the vertices
  (round_priority(v, t, seed) & 1 == 0 — deterministic, layout-
  independent, different each round); phase 1 ends after 3 zero-move
  sub-rounds.

  Distributed state: community labels + k_v live with the vertex owner;
  Sigma_tot(C) lives with the OWNER OF COMMUNITY ID C (community ids
  are current-level vids, so ownership is the same searchsorted).  A
  sub-round is 4 chained actor barriers:
    1. scatter_labels: per-edge (dst, c(src), w) combined per (dst, c)
       inside the actor (labelprop's combiner — exchange bounded by
       distinct pairs, not E); also applies last round's Sigma_tot
       deltas.
    2. prep_moves: merge candidate messages; request Sigma_tot for the
       candidate + own-community id set, routed to community owners.
    3. answer_ctot: owners answer value arrays aligned to each request.
    4. apply_moves: vectorized gain evaluation, label updates, and
       (community, +-k_v) delta messages back to community owners.

  MIRRORED mode (levels with <= mirror_cap vertices, the common case
  after level 0 contracts — and level 0 itself on graphs under the
  cap): every actor keeps the FULL Sigma_tot array (O(V) float64) and
  answers candidate lookups locally, fusing barriers 2-4 into one
  move_and_apply call — 2 barriers per sub-round, and the (community,
  +-k_v) deltas become ONE broadcast object per actor per round
  instead of an A x A routed exchange.  Delta application order is
  fixed (actor index), so mirror values — and therefore every move
  decision — are bitwise identical to the owner protocol (pinned by
  tests/test_louvain.py's mirror-vs-owner parity test).  Above
  mirror_cap the owner protocol is the 10^12-vertex scale path.

Phase 2 (contraction), pure Ray Data — communities become vertices:
  assign_dense_ids_hash gives the surviving community ids a dense
  contiguous-range id space + offsets (the CSR ownership contract),
  two bucketed hash_joins relabel the edge endpoints, one grouped sum
  folds parallel edges; intra-community mass becomes per-vertex
  self-loop weight, delivered to the next level's actors as per-part
  parquet (pagerank's _write_ranks_by_part — never a driver-side
  broadcast), and k_v = wout + self_w keeps the invariant
  k_C = sum of member degrees, so m2 is conserved across levels
  (recorded per level in info["levels"]; pinned by tests).

Determinism: all message combines sort by (vid, community) before
order-fixed reduction; with integer-valued weights (level 0 always;
contraction sums preserve integrality) decisions are bitwise
independent of partitioning and actor layout (tests/test_louvain.py
pins 1-vs-4-actor label equality and a pure-Python full replay
oracle).

Semantic anchor: the reference's community structure comes from its
GNN embeddings (halvesting_geometric/modules/sage.py); Louvain is the
deterministic classical counterpart, the fitness metric being
graph/metrics.py::modularity.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..config import DEFAULT, EngineConfig
from .csr import load_shard
from .engine import part_to_actor_map, plan_actors, transpose_refs
from .labelprop import _agg_pairs
from .mis import round_priority

_NEG = -np.inf


def _agg_pairs_pl(vids: np.ndarray, labels: np.ndarray,
                  counts: np.ndarray):
    """Hash-aggregated replacement for labelprop's sort-based
    _agg_pairs on the phase-1 hot path: sum counts per (vid, label),
    output in (vid, label) order.  A 20M-pair round costs ~0.7 s here
    vs ~31 s for lexsort+reduceat (r4 micro-bench) — this was the 8x
    per-edge gap vs a PageRank round flagged in the r3 VERDICT.  Used
    only when weights are integer-valued (level 0 always; contraction
    sums preserve integrality): integer float64 sums are exact, so the
    multithreaded accumulation order cannot change results.  Graphs
    with fractional weights keep the order-fixed _agg_pairs path."""
    import polars as pl

    g = (pl.DataFrame({"v": vids, "l": labels, "c": counts})
         .group_by(["v", "l"]).agg(pl.col("c").sum())
         .sort(["v", "l"]))
    return (g["v"].to_numpy(), g["l"].to_numpy(), g["c"].to_numpy())


def _agg_dispatch(int_w: bool):
    return _agg_pairs_pl if int_w else _agg_pairs


@ray.remote(num_cpus=0)
class LouvainShardActor:
    """Owns partitions: CSR shards, labels c(v), degrees k_v, and
    Sigma_tot for the community ids in its vid ranges."""

    def __init__(self, actor_idx: int, owned: List[int],
                 paths: Dict[int, str], offsets: np.ndarray,
                 part2actor: np.ndarray, num_actors: int, seed: int,
                 selfw_files: Optional[Dict[int, str]] = None):
        self.owned = owned
        self.off = offsets
        self.p2a = part2actor
        self.num_actors = num_actors
        self.seed = seed
        self.shards: Dict[int, Dict] = {}
        self.c: Dict[int, np.ndarray] = {}
        self.k: Dict[int, np.ndarray] = {}
        self.ctot: Dict[int, np.ndarray] = {}
        for p in owned:
            s = load_shard(paths[p])
            if "weights" not in s:
                raise ValueError("louvain needs weighted CSR shards")
            self.shards[p] = s
            lo, hi = s["vid_lo"], s["vid_hi"]
            k = s["wout"].astype(np.float64).copy()
            if selfw_files and p in selfw_files:
                t = pq.read_table(selfw_files[p], columns=["vid", "rank"])
                k[t.column("vid").to_numpy() - lo] += \
                    t.column("rank").to_numpy()
            self.k[p] = k
            self.c[p] = np.arange(lo, hi, dtype=np.int64)
            # init: every vertex its own community, Sigma_tot = k_v
            self.ctot[p] = k.copy()
        self._cand = None
        self._req: List[np.ndarray] = []
        # integer-valued local weights -> eligible for the exact-sum
        # hash aggregation fast path (driver ANDs across actors)
        self._int_w = all(
            not np.any(s["weights"] != np.floor(s["weights"]))
            for s in self.shards.values())
        self._use_fast = False
        # full-graph Sigma_tot mirror (small/medium levels only): every
        # actor answers candidate Sigma_tot locally, fusing the
        # prep_moves/answer_ctot request-answer exchange away (2 actor
        # barriers per sub-round instead of 4).  Deltas arrive as the
        # same broadcast refs on every actor and are applied in fixed
        # actor order, so mirror values stay bitwise equal to the owner
        # protocol's ctot.  None => owner protocol (the 10^12-vertex
        # scale path: O(V) per-actor state is only paid under mirror_cap).
        self.mirror: Optional[np.ndarray] = None

    def k_sum(self) -> float:
        return float(sum(self.k[p].sum() for p in self.owned))

    def k_parts(self):
        """Owned (vid_lo, k) segments — the driver assembles the initial
        Sigma_tot mirror from these (init state: Sigma_tot(v) = k_v)."""
        return [(self.shards[p]["vid_lo"], self.k[p]) for p in self.owned]

    def set_mirror(self, k_full: np.ndarray) -> None:
        # object-store arrays are read-only; np.add.at needs a writable copy
        self.mirror = k_full.copy()

    def int_weights(self) -> bool:
        return self._int_w

    def set_fast_agg(self, use_fast: bool) -> None:
        self._use_fast = bool(use_fast)

    def _route_triples(self, v, c, w):
        dest = self.p2a[np.searchsorted(self.off, v, side="right") - 1]
        order = np.argsort(dest, kind="stable")
        v, c, w, dest = v[order], c[order], w[order], dest[order]
        b = np.searchsorted(dest, np.arange(self.num_actors + 1))
        return [(v[b[j]:b[j + 1]], c[b[j]:b[j + 1]], w[b[j]:b[j + 1]])
                if b[j + 1] > b[j] else None
                for j in range(self.num_actors)]

    def _apply_delta_msgs(self, msgs) -> None:
        """Fold (community, +-k_v) delta messages into Sigma_tot state
        in FIXED message order (bitwise-reproducible accumulation)."""
        for msg in msgs:
            if msg is None:
                continue
            ids, vals = msg
            if self.mirror is not None:
                np.add.at(self.mirror, ids, vals)
                continue
            for p in self.owned:
                lo = self.shards[p]["vid_lo"]
                hi = self.shards[p]["vid_hi"]
                m = (ids >= lo) & (ids < hi)
                if m.any():
                    np.add.at(self.ctot[p], ids[m] - lo, vals[m])

    def flush_deltas(self, *msgs) -> bool:
        """Checkpoint support: apply pending deltas NOW (instead of at
        the next scatter) so dumped state is sub-round-consistent.
        Same message order as scatter_labels -> bitwise identical."""
        self._apply_delta_msgs(msgs)
        return True

    def dump_state(self, paths: Dict[int, str]) -> bool:
        """Write per-owned-part (vid, label, ctot) checkpoint tables
        (atomic tmp+rename).  In mirror mode the owned slice of the
        mirror IS the owner-protocol ctot, so one format serves both."""
        from ..state.checkpoint import IterativeCheckpoint

        for p in self.owned:
            lo = self.shards[p]["vid_lo"]
            hi = self.shards[p]["vid_hi"]
            ct = self.mirror[lo:hi] if self.mirror is not None \
                else self.ctot[p]
            IterativeCheckpoint.write_part(pa.table({
                "vid": pa.array(np.arange(lo, hi, dtype=np.int64)),
                "label": pa.array(self.c[p]),
                "ctot": pa.array(np.asarray(ct, dtype=np.float64)),
            }), paths[p])
        return True

    def load_state(self, paths: Dict[int, str]) -> bool:
        """Restore labels + owner-mode Sigma_tot from checkpoint parts
        (mirror mode reassembles the full array driver-side)."""
        for p in self.owned:
            t = pq.read_table(paths[p], columns=["vid", "label", "ctot"])
            self.c[p] = t.column("label").to_numpy().astype(
                np.int64, copy=True)
            self.ctot[p] = t.column("ctot").to_numpy().astype(
                np.float64, copy=True)
        return True

    def scatter_labels(self, t: int, *ctot_deltas):
        """Apply last sub-round's Sigma_tot deltas, then emit per-owner
        (dst, c(src), w_sum) candidate messages — only for destinations
        ACTIVE at sub-round t (stateless hash coin, ~half the vertices:
        strict parity admits period-2 limit cycles of synchronized
        community hopping inside symmetric structures — a clique's two
        halves hop forever; randomized activation breaks every such
        cycle with probability 1), which also halves the exchange
        (inactive vertices are never evaluated this round)."""
        self._apply_delta_msgs(ctot_deltas)
        vs, cs, ws = [], [], []
        for p in self.owned:
            s = self.shards[p]
            if s["indices"].size == 0:
                continue
            act = (round_priority(s["indices"], t, self.seed)
                   & np.uint64(1)) == 0
            if not act.any():
                continue
            e_lab = np.repeat(self.c[p], s["outdeg"])
            vs.append(s["indices"][act])
            cs.append(e_lab[act])
            ws.append(s["weights"][act])
        if not vs:
            out = [None] * self.num_actors
        else:
            # single hash/sort aggregation over all owned parts (the
            # hash path subsumes the old per-part pre-agg)
            agg = _agg_dispatch(self._use_fast)
            v, l, w = agg(np.concatenate(vs), np.concatenate(cs),
                          np.concatenate(ws))
            out = self._route_triples(v, l, w)
        return tuple(out) if self.num_actors > 1 else out[0]

    def _merge_cands(self, label_msgs):
        msgs = [m for m in label_msgs if m is not None]
        if msgs:
            v = np.concatenate([m[0] for m in msgs])
            l = np.concatenate([m[1] for m in msgs])
            w = np.concatenate([m[2] for m in msgs])
            v, l, w = _agg_dispatch(self._use_fast)(v, l, w)
        else:
            v = np.empty(0, dtype=np.int64)
            l = np.empty(0, dtype=np.int64)
            w = np.empty(0, dtype=np.float64)
        return v, l, w

    def prep_moves(self, *label_msgs):
        """Merge candidate messages; return per-owner Sigma_tot request
        id arrays (candidate communities + own current communities)."""
        v, l, w = self._merge_cands(label_msgs)
        self._cand = (v, l, w)
        need = [l]
        for p in self.owned:
            lo = self.shards[p]["vid_lo"]
            hi = self.shards[p]["vid_hi"]
            m = (v >= lo) & (v < hi)
            if m.any():
                need.append(self.c[p][v[m] - lo])
        ids = np.unique(np.concatenate(need)) if need else \
            np.empty(0, dtype=np.int64)
        dest = self.p2a[np.searchsorted(self.off, ids, side="right") - 1] \
            if ids.size else np.empty(0, dtype=np.int32)
        self._req = [ids[dest == j] for j in range(self.num_actors)]
        out = [r if r.size else None for r in self._req]
        return tuple(out) if self.num_actors > 1 else out[0]

    def answer_ctot(self, *reqs):
        """Answer Sigma_tot for requested community ids (all owned
        here by routing construction), aligned per requester."""
        out = []
        for ids in reqs:
            if ids is None or ids.size == 0:
                out.append(None)
                continue
            vals = np.empty(ids.size, dtype=np.float64)
            for p in self.owned:
                lo = self.shards[p]["vid_lo"]
                hi = self.shards[p]["vid_hi"]
                m = (ids >= lo) & (ids < hi)
                if m.any():
                    vals[m] = self.ctot[p][ids[m] - lo]
            out.append(vals)
        return tuple(out) if self.num_actors > 1 else out[0]

    def apply_moves(self, t: int, resolution: float, m2: float,
                    gain_eps: float, *answers):
        """Evaluate gains for parity-active vertices, apply moves, emit
        (community, +-k_v) Sigma_tot delta messages.  Returns A delta
        msgs + n_moves."""
        req_ids = [r for r in self._req if r.size]
        ans_vals = [a for a in answers if a is not None]
        if req_ids:
            ids = np.concatenate(req_ids)
            vals = np.concatenate(ans_vals)
            order = np.argsort(ids, kind="stable")
            ids_s, vals_s = ids[order], vals[order]
        else:
            ids_s = np.empty(0, dtype=np.int64)
            vals_s = np.empty(0, dtype=np.float64)

        def lookup(x):
            return vals_s[np.searchsorted(ids_s, x)]

        pairs, n_moves = self._gain_moves(t, resolution, m2, gain_eps,
                                          *self._cand, lookup)
        msgs = (self._route_pairs(*pairs) if pairs
                else [None] * self.num_actors)
        return (*msgs, n_moves)

    def move_and_apply(self, t: int, resolution: float, m2: float,
                       gain_eps: float, *label_msgs):
        """Fused prep_moves + answer_ctot + apply_moves for the
        mirrored-Sigma_tot mode: candidate Sigma_tot reads come straight
        off the local mirror, so the request-answer exchange disappears
        and the sub-round is 2 barriers.  Returns (delta_pairs_or_None,
        n_moves); the driver hands the SAME delta ref to every actor
        next round (one object per actor per round, not A)."""
        v, l, w = self._merge_cands(label_msgs)
        pairs, n_moves = self._gain_moves(
            t, resolution, m2, gain_eps, v, l, w,
            lambda x: self.mirror[x])
        return pairs, n_moves

    def _gain_moves(self, t: int, resolution: float, m2: float,
                    gain_eps: float, v, l, w, lookup):
        """Shared gain evaluation + label update.  Returns
        ((community_ids, deltas) or None, n_moves)."""
        active = (round_priority(v, t, self.seed) & np.uint64(1)) == 0 \
            if v.size else np.empty(0, dtype=bool)
        v, l, w = v[active], l[active], w[active]
        n_moves = 0
        dv_list: List[np.ndarray] = []
        dk_list: List[np.ndarray] = []
        if v.size:
            kv = np.empty(v.size, dtype=np.float64)
            cv = np.empty(v.size, dtype=np.int64)
            for p in self.owned:
                lo = self.shards[p]["vid_lo"]
                hi = self.shards[p]["vid_hi"]
                m = (v >= lo) & (v < hi)
                if m.any():
                    kv[m] = self.k[p][v[m] - lo]
                    cv[m] = self.c[p][v[m] - lo]
            ct = lookup(l)
            intra = l == cv
            ct_adj = np.where(intra, ct - kv, ct)
            score = w - resolution * kv * ct_adj / m2
            uv, inv = np.unique(v, return_inverse=True)
            # stay score: the (v, c(v)) row if present, else the
            # no-intra-neighbor default -res*k_v*(Sigma_tot(D)-k_v)/m2
            stay = np.full(uv.size, _NEG)
            stay[inv[intra]] = score[intra]
            kv_u = np.empty(uv.size)
            cv_u = np.empty(uv.size, dtype=np.int64)
            kv_u[inv] = kv
            cv_u[inv] = cv
            miss = np.isneginf(stay)
            if miss.any():
                stay[miss] = -resolution * kv_u[miss] * \
                    (lookup(cv_u[miss]) - kv_u[miss]) / m2
            # best move candidate per vertex: max score, tie smallest C
            mask = ~intra
            if mask.any():
                vm, lm, sm = v[mask], l[mask], score[mask]
                order = np.lexsort((lm, -sm, vm))
                vm, lm, sm = vm[order], lm[order], sm[order]
                first = np.r_[True, vm[1:] != vm[:-1]]
                bv, bl, bs = vm[first], lm[first], sm[first]
                pos = np.searchsorted(uv, bv)
                go = bs > stay[pos] + gain_eps
                mv_v, mv_to = bv[go], bl[go]
                mv_from = cv_u[pos[go]]
                mv_k = kv_u[pos[go]]
                n_moves = int(mv_v.size)
                if n_moves:
                    for p in self.owned:
                        lo = self.shards[p]["vid_lo"]
                        hi = self.shards[p]["vid_hi"]
                        m = (mv_v >= lo) & (mv_v < hi)
                        if m.any():
                            self.c[p][mv_v[m] - lo] = mv_to[m]
                    dv_list = [mv_from, mv_to]
                    dk_list = [-mv_k, mv_k]
        if dv_list:
            dv = np.concatenate(dv_list)
            dk = np.concatenate(dk_list)
            # combine deltas per community before routing
            ud, uinv = np.unique(dv, return_inverse=True)
            sums = np.bincount(uinv, weights=dk, minlength=ud.size)
            keep = sums != 0.0
            if keep.any():
                return (ud[keep], sums[keep]), n_moves
        return None, n_moves

    def _route_pairs(self, ids: np.ndarray, vals: np.ndarray):
        dest = self.p2a[np.searchsorted(self.off, ids, side="right") - 1]
        order = np.argsort(dest, kind="stable")
        ids, vals, dest = ids[order], vals[order], dest[order]
        b = np.searchsorted(dest, np.arange(self.num_actors + 1))
        return [(ids[b[j]:b[j + 1]], vals[b[j]:b[j + 1]])
                if b[j + 1] > b[j] else None
                for j in range(self.num_actors)]

    def label_tables(self):
        out = []
        for p in self.owned:
            s = self.shards[p]
            lo, hi = s["vid_lo"], s["vid_hi"]
            out.append(pa.table({
                "vid": pa.array(np.arange(lo, hi, dtype=np.int64)),
                "label": pa.array(self.c[p]),
            }))
        return out


def _phase1(edges, offsets: np.ndarray, workdir: str, level: int,
            cfg: EngineConfig, *, resolution: float, gain_eps: float,
            max_subrounds: int, num_actors: int, seed: int,
            stop_frac: float = 0.0,
            selfw_files: Optional[Dict[int, str]] = None,
            mirror_cap: int = 8_000_000,
            checkpoint: bool = False, ckpt_every: int = 8,
            _fail_after_commit: int = -1):
    """One local-moving phase.  edges: weighted symmetrized directed
    representation WITHOUT self-loops (their mass arrives via
    selfw_files).  Returns (labels_ds, moves_total, subrounds, m2).

    checkpoint/ckpt_every: dump (label, Sigma_tot) per partition every
    ckpt_every sub-rounds (+ at the stopping round) under
    {workdir}/louvain_ckpt/l{level}; a rerun resumes from the last
    committed sub-round and a finished phase is loaded without spawning
    actors.  Resumed output is bitwise identical (pinned in tests).
    _fail_after_commit: TEST HOOK — raise right after the checkpoint
    commit at/after that sub-round (simulates a crash)."""
    from .csr import build_csr_shards

    num_parts = len(offsets) - 1
    # level-0 shards depend only on the input edge table; every
    # contracted level's edges additionally depend on ALL phase-1
    # parameters of the levels above it — stamp them or a rerun with a
    # different seed/stop_frac would silently adopt stale shards
    lineage = {"kind": "louvain-sym-weighted", "level": level,
               "resolution": resolution}
    if level > 0:
        lineage.update({"seed": seed, "stop_frac": stop_frac,
                        "gain_eps": gain_eps,
                        "max_subrounds": max_subrounds})
    descs = build_csr_shards(
        edges, offsets, f"{workdir}/louvain_csr_l{level}",
        lineage=lineage, weight_col="w")
    paths = {dd["part"]: dd["path"] for dd in descs}
    # per-sub-round checkpointing (north-rule contract: resume
    # MID-iteration after failure).  State = (label, Sigma_tot) per
    # partition, dumped every ckpt_every sub-rounds with deltas flushed
    # first (manifest commits AFTER the part files — the r2 lesson).
    # The checkpoint lineage carries EVERY phase-1 parameter at every
    # level (unlike the shard lineage: level-0 shards don't depend on
    # seed/stop_frac, but phase-1 labels always do).
    ck = None
    if checkpoint:
        from ..state.checkpoint import IterativeCheckpoint

        ck = IterativeCheckpoint(
            f"{workdir}/louvain_ckpt", f"l{level}",
            {"kind": "louvain-phase1", "level": level,
             "resolution": resolution, "seed": seed,
             "stop_frac": stop_frac, "gain_eps": gain_eps,
             "max_subrounds": max_subrounds, "num_parts": num_parts})
        dn = ck.manifest.get("done")
        if dn is not None:
            files = ck.state_files(int(dn["iter"]))
            if len(files) == num_parts:
                # phase already finished under this exact lineage:
                # load final labels, skip the actor pool entirely
                tabs = [pq.read_table(f, columns=["vid", "label"])
                        for f in files]
                return (rd.from_arrow(tabs), int(dn["moves"]),
                        list(dn["moves_hist"]), float(dn["m2"]), descs)
    if num_actors <= 0:
        # auto-size: a 4-barrier protocol on a small graph is actor-call
        # overhead, not compute — collapse the pool (layout-invariant,
        # pinned by tests); one actor per ~8k vertices, capped at parts
        num_actors = max(1, min(num_parts, int(offsets[-1]) // 8192 + 1))
    owned = plan_actors(num_parts, num_actors)
    A = len(owned)
    p2a = part_to_actor_map(owned, num_parts)
    actors = [LouvainShardActor.remote(
        i, owned[i], paths, np.asarray(offsets), p2a, A, seed,
        {p: selfw_files[p] for p in owned[i] if p in selfw_files}
        if selfw_files else None)
        for i in range(A)]
    try:
        # exact-sum hash-agg fast path only if EVERY actor's weights
        # are integer-valued (one AND across the pool; see _agg_pairs_pl)
        use_fast = all(ray.get([a.int_weights.remote() for a in actors]))
        ray.get([a.set_fast_agg.remote(use_fast) for a in actors])
        m2 = float(sum(ray.get([a.k_sum.remote() for a in actors])))
        # mirrored Sigma_tot (2-barrier sub-rounds) while the per-actor
        # O(V) float64 mirror fits comfortably; the owner request-answer
        # protocol (4 barriers, O(V/A) state) is the 10^12-vertex path
        use_mirror = int(offsets[-1]) <= mirror_cap
        moves_hist: List[int] = []
        start_t = 0
        last_ck_t = None
        resume_k = ck.latest_complete() if ck else None
        if resume_k is not None:
            # resume MID-phase: restore labels + Sigma_tot as of the
            # last committed sub-round; deltas were flushed before the
            # dump, so the inboxes restart empty
            pmap = {p: ck.part_path(resume_k, p)
                    for p in range(num_parts)}
            ray.get([actors[i].load_state.remote(
                {p: pmap[p] for p in owned[i]}) for i in range(A)])
            moves_hist = list(ck.manifest["iters"][str(resume_k)]
                              ["metrics"]["moves_hist"])
            start_t = resume_k + 1
            last_ck_t = resume_k
        if use_mirror:
            k_full = np.zeros(int(offsets[-1]), dtype=np.float64)
            if resume_k is not None:
                for p in range(num_parts):
                    tt = pq.read_table(pmap[p], columns=["vid", "ctot"])
                    v = tt.column("vid").to_numpy()
                    if v.size:
                        k_full[v[0]:v[0] + v.size] = \
                            tt.column("ctot").to_numpy()
            else:
                for seg in ray.get([a.k_parts.remote() for a in actors]):
                    for lo, k in seg:
                        k_full[lo:lo + k.size] = k
            ref = ray.put(k_full)
            ray.get([a.set_mirror.remote(ref) for a in actors])
            del k_full, ref
        delta_inbox = [[None] * A for _ in range(A)]
        shared_deltas: List = [None] * A  # mirror mode: same refs for all
        # edgeless graph: every vertex stays a singleton (and the gain
        # formula's /m2 would divide by zero)
        for t in range(start_t, max_subrounds if m2 > 0 else 0):
            if use_mirror:
                outs = [list(actors[i].scatter_labels
                             .options(num_returns=A)
                             .remote(t, *shared_deltas))
                        if A > 1 else
                        [actors[i].scatter_labels.remote(t,
                                                         *shared_deltas)]
                        for i in range(A)]
                label_inbox = transpose_refs(outs)
                mv = [actors[i].move_and_apply
                      .options(num_returns=2)
                      .remote(t, resolution, m2, gain_eps,
                              *label_inbox[i])
                      for i in range(A)]
                n_moves = int(sum(ray.get([m[1] for m in mv])))
                shared_deltas = [m[0] for m in mv]
            else:
                outs = [list(actors[i].scatter_labels
                             .options(num_returns=A)
                             .remote(t, *delta_inbox[i]))
                        if A > 1 else
                        [actors[i].scatter_labels.remote(t,
                                                         *delta_inbox[i])]
                        for i in range(A)]
                label_inbox = transpose_refs(outs)
                reqs = [list(actors[i].prep_moves
                             .options(num_returns=A)
                             .remote(*label_inbox[i]))
                        if A > 1 else
                        [actors[i].prep_moves.remote(*label_inbox[i])]
                        for i in range(A)]
                req_inbox = transpose_refs(reqs)
                ans = [list(actors[j].answer_ctot
                            .options(num_returns=A)
                            .remote(*req_inbox[j]))
                       if A > 1 else
                       [actors[j].answer_ctot.remote(*req_inbox[j])]
                       for j in range(A)]
                ans_inbox = transpose_refs(ans)
                mv = [list(actors[i].apply_moves
                           .options(num_returns=A + 1)
                           .remote(t, resolution, m2, gain_eps,
                                   *ans_inbox[i]))
                      for i in range(A)]
                n_moves = int(sum(ray.get([o[A] for o in mv])))
                delta_inbox = transpose_refs([o[:A] for o in mv])
            moves_hist.append(n_moves)
            # 3 low-move rounds: with ~1/2 hash activation a vertex
            # that still wants to move gets a chance w.p. 7/8 in 3
            # rounds; a stable streak at/below the threshold means
            # (approximate) best-response fixpoint.  stop_frac > 0 is
            # the standard early-termination knob (the long tail of
            # sub-1%-of-V move rounds buys little modularity — the
            # coarser levels re-examine those vertices anyway).
            thr = int(stop_frac * int(offsets[-1]))
            stopping = len(moves_hist) >= 3 and all(
                x <= thr for x in moves_hist[-3:])
            if ck and (stopping or t == max_subrounds - 1
                       or (t + 1 - start_t) % ckpt_every == 0):
                # flush the pending deltas so the dumped Sigma_tot is
                # sub-round-consistent (same message order as the next
                # scatter would use -> bitwise identical), then dump
                # parts, then commit the manifest
                if use_mirror:
                    ray.get([a.flush_deltas.remote(*shared_deltas)
                             for a in actors])
                    shared_deltas = [None] * A
                else:
                    ray.get([actors[i].flush_deltas
                             .remote(*delta_inbox[i]) for i in range(A)])
                    delta_inbox = [[None] * A for _ in range(A)]
                pmap = {p: ck.part_path(t, p) for p in range(num_parts)}
                ray.get([actors[i].dump_state.remote(
                    {p: pmap[p] for p in owned[i]}) for i in range(A)])
                ck.commit_iter(t, {"moves_hist": list(moves_hist),
                                   "moves": n_moves, "m2": m2},
                               list(range(num_parts)))
                last_ck_t = t
                if 0 <= _fail_after_commit <= t:
                    raise RuntimeError(
                        "test-injected failure after checkpoint commit")
            if stopping:
                break
        if ck and last_ck_t is not None and \
                ck.manifest.get("done") is None:
            ck.manifest["done"] = {"iter": last_ck_t,
                                   "moves": int(sum(moves_hist)),
                                   "moves_hist": list(moves_hist),
                                   "m2": m2}
            ck._save()
        tables = [tt for ref in [a.label_tables.remote() for a in actors]
                  for tt in ray.get(ref)]
    finally:
        for a in actors:
            ray.kill(a)
    return (rd.from_arrow(tables), int(sum(moves_hist)),
            moves_hist, m2, descs)


def _dense_ids_np(labels: np.ndarray, parts2: int):
    """NumPy replica of ops/ids.py::assign_dense_ids_hash's id
    assignment (part = stable_hash64(label) % parts2, ids contiguous
    per part, label-ascending within part) — the small-regime
    contraction MUST mint identical community ids to the distributed
    path so the regime gate never changes results."""
    from ..functions.hashing import stable_hash64

    uniq = np.unique(labels)
    part = stable_hash64(uniq) % parts2
    order = np.lexsort((uniq, part))
    sorted_u, sorted_p = uniq[order], part[order]
    counts = np.bincount(sorted_p, minlength=parts2)
    off2 = np.zeros(parts2 + 1, dtype=np.int64)
    np.cumsum(counts, out=off2[1:])
    cid_sorted = np.arange(uniq.size, dtype=np.int64)
    by_lab = np.argsort(sorted_u)
    lab_keys = sorted_u[by_lab]
    cid_by_lab = cid_sorted[by_lab]

    def cid_of(x):
        return cid_by_lab[np.searchsorted(lab_keys, x)]

    return cid_of, off2, int(uniq.size)


def _contract_small(descs, labels_pd, selfw_files, parts2: int,
                    selfw_out: str):
    """Driver-side contraction for the small regime (total shard edges
    under the cap — the union-find-fast-path pattern of
    q_dedup_clusters): reads the deduped weighted edges straight back
    from the CSR shard files the phase just ran on, relabels, folds
    parallel edges and splits self mass in one numpy pass.  Returns
    (labels2_pa, cross_edges_pa, off2, K, selfw_files_next)."""
    srcs, dsts, ws = [], [], []
    for d in descs:
        t = pq.read_table(d["path"])
        row = {k: t.column(k)[0] for k in t.column_names}
        indices = np.asarray(row["indices"].values)
        if indices.size == 0:
            continue
        indptr = np.asarray(row["indptr"].values)
        srcs.append(np.repeat(
            np.arange(d["vid_lo"], d["vid_hi"], dtype=np.int64),
            np.diff(indptr)))
        dsts.append(indices.astype(np.int64))
        ws.append(np.asarray(row["weights"].values, dtype=np.float64))
    if selfw_files:  # current level's self mass joins the fold
        for _, path in sorted(selfw_files.items()):
            t = pq.read_table(path, columns=["vid", "rank"])
            v = t.column("vid").to_numpy().astype(np.int64)
            srcs.append(v)
            dsts.append(v)
            ws.append(t.column("rank").to_numpy().astype(np.float64))
    src = np.concatenate(srcs) if srcs else np.empty(0, dtype=np.int64)
    dst = np.concatenate(dsts) if dsts else np.empty(0, dtype=np.int64)
    w = np.concatenate(ws) if ws else np.empty(0, dtype=np.float64)

    vid = labels_pd["vid"].to_numpy()
    lab = labels_pd["label"].to_numpy()
    n_cur = vid.size
    label_of = np.empty(n_cur, dtype=np.int64)
    label_of[vid] = lab
    cid_of, off2, K = _dense_ids_np(lab, parts2)
    csrc = cid_of(label_of[src]) if src.size else src
    cdst = cid_of(label_of[dst]) if dst.size else dst
    key = csrc * np.int64(K) + cdst
    uk, inv = np.unique(key, return_inverse=True)
    wsum = np.bincount(inv, weights=w, minlength=uk.size)
    ns, nd = uk // K, uk % K
    selfm = ns == nd
    files = {}
    sv, sw = ns[selfm], wsum[selfm]
    if sv.size:
        os.makedirs(selfw_out, exist_ok=True)
        spart = (np.searchsorted(off2, sv, side="right") - 1)
        for p in np.unique(spart):
            m = spart == p
            path = os.path.join(selfw_out, f"part{int(p)}.parquet")
            tmp = path + ".tmp"
            pq.write_table(pa.table({"vid": pa.array(sv[m]),
                                     "rank": pa.array(sw[m])}), tmp)
            os.replace(tmp, path)
            files[int(p)] = path
    cross = pa.table({"src": pa.array(ns[~selfm]),
                      "dst": pa.array(nd[~selfm]),
                      "w": pa.array(wsum[~selfm])})
    labels2 = pa.table({"vid": pa.array(vid.astype(np.int64)),
                        "cid": pa.array(cid_of(lab))})
    return labels2, cross, off2, K, files


def _relabel(ds, col: str, cmap, cfg: EngineConfig, out_col: str = None,
             keep: List[str] = (), schema_cols=None):
    """hash_join ds with the (label -> cid) map on `col`; returns
    columns keep + [out_col or col] with the new id."""
    from ..ops.join import hash_join

    i64 = pa.int64()
    left_schema = pa.schema([(col, i64)] + [(k, schema_cols[k])
                                            for k in keep])
    right_schema = pa.schema([("label", i64), ("cid", i64)])
    j = hash_join(ds, cmap, on=col, right_on="label",
                  num_parts=cfg.num_parts,
                  left_schema=left_schema, right_schema=right_schema)
    oc = out_col or col

    def fin(b: pa.Table) -> pa.Table:
        cols = {k: b.column(k) for k in keep}
        cols[oc] = b.column("cid")
        return pa.table(cols)

    return j.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


def louvain(edges, offsets: np.ndarray, workdir: str,
            cfg: EngineConfig = DEFAULT, *,
            resolution: float = 1.0, gain_eps: float = 1e-9,
            max_subrounds: int = 32, max_levels: int = 6, seed: int = 42,
            stop_frac: float = 0.0, small_edge_cap: int = 4_000_000,
            weight_col: Optional[str] = None,
            num_actors: int = 0,
            mirror_cap: int = 8_000_000,
            checkpoint: bool = False,
            ckpt_every: int = 8) -> Tuple["rd.Dataset", Dict]:
    """Louvain communities over a DIRECTED edge table (symmetrized
    internally; self-loops dropped at level 0).  Returns
    (labels_ds(vid, community), info): community = smallest member vid
    (the components.py canonicalization), info carries per-level
    {n_vertices, n_communities, moves, subrounds, m2}.

    checkpoint=True turns on per-sub-round phase-1 checkpointing
    (see _phase1): a killed job rerun over the same workdir resumes
    from the last committed sub-round with bitwise-identical output,
    and fully finished levels' phases load without spawning actors.
    OFF by default because a resumed rerun is (intentionally) not a
    fresh computation — benchmarks and conformance queries that reuse
    a workdir must keep measuring real compute; the CLI `louvain`
    subcommand (the long-job surface) enables it.

    weight_col: positive edge weights (anchor multiplicity etc.);
    default weight 1 per directed edge after symmetrization."""
    import pyarrow.compute as pc

    from ..ops.agg import grouped_aggregate
    from ..ops.ids import assign_dense_ids_hash
    from ..ops.join import hash_join
    from .pagerank import _write_ranks_by_part

    i64, f64 = pa.int64(), pa.float64()
    N = int(offsets[-1])
    info: Dict = {"levels": []}
    if N == 0:
        import pandas as _pd

        return rd.from_pandas(_pd.DataFrame(
            {"vid": _pd.Series([], dtype="int64"),
             "community": _pd.Series([], dtype="int64")})), info

    # weight-preserving symmetrize (graph/build.py::symmetrize drops
    # payload columns) + self-loop drop — the A + A^T folding with each
    # undirected edge represented in both directions
    def with_w(b: pa.Table) -> pa.Table:
        b = b.filter(pc.not_equal(b.column("src"), b.column("dst")))
        w = (b.column(weight_col).cast(pa.float64()) if weight_col
             else pa.array(np.ones(b.num_rows, dtype=np.float64)))
        return pa.table({"src": b.column("src"), "dst": b.column("dst"),
                         "w": w})

    def swapped(b: pa.Table) -> pa.Table:
        return pa.table({"src": b.column("dst"), "dst": b.column("src"),
                         "w": b.column("w")})

    base = edges.map_batches(with_w, batch_format="pyarrow",
                             zero_copy_batch=True)
    cur_edges = base.union(base.map_batches(
        swapped, batch_format="pyarrow", zero_copy_batch=True))
    cur_offsets = np.asarray(offsets)
    selfw_files = None
    full_map = None  # (ovid, cur) in ORIGINAL vid space
    t0 = time.time()
    for level in range(max_levels):
        t_lvl = time.time()
        n_cur = int(cur_offsets[-1])
        labels, moves, moves_hist, m2, descs = _phase1(
            cur_edges, cur_offsets, workdir, level, cfg,
            resolution=resolution, gain_eps=gain_eps,
            max_subrounds=max_subrounds, num_actors=num_actors,
            seed=seed, stop_frac=stop_frac, selfw_files=selfw_files,
            mirror_cap=mirror_cap, checkpoint=checkpoint,
            ckpt_every=ckpt_every)
        t_p1 = time.time() - t_lvl
        subrounds = len(moves_hist)
        if level == 0:
            info["m2"] = m2
        if moves == 0:
            info["levels"].append({
                "n_vertices": n_cur, "n_communities": n_cur,
                "moves": 0, "subrounds": subrounds, "m2": m2,
                "moves_hist": moves_hist})
            break
        # ---- contraction ----
        # adaptive partition count: a contracted level of a few
        # thousand communities on 16 parts is 4-barrier actor-call
        # overhead, not compute — shrink the id space's partitioning
        # (results are layout-invariant, pinned by test)
        parts2 = max(1, min(cfg.num_parts, n_cur // 8192 + 1))
        selfw_out = os.path.join(workdir, f"louvain_selfw_l{level + 1}")
        n_edges_lvl = sum(
            pq.read_table(d["path"], columns=["n_edges"])
            .column("n_edges")[0].as_py() for d in descs)
        if n_edges_lvl <= small_edge_cap:
            # small regime (q_dedup_clusters' fast-path pattern): one
            # driver numpy pass over the shard files the phase just ran
            # on; id minting is _dense_ids_np == assign_dense_ids_hash,
            # so the gate never changes results
            labels2_pa, cross_pa, off2, K, selfw_files = _contract_small(
                descs, labels.to_pandas(), selfw_files, parts2,
                selfw_out)
            info["levels"].append({
                "n_vertices": n_cur, "n_communities": K,
                "moves": moves, "subrounds": subrounds, "m2": m2,
                "moves_hist": moves_hist, "phase1_sec": round(t_p1, 3),
                "contract": "small"})
            if full_map is None:
                full_map = rd.from_arrow(pa.table(
                    {"ovid": labels2_pa.column("vid"),
                     "cur": labels2_pa.column("cid")})).materialize()
            else:
                from ..ops.join import broadcast_lookup

                j = broadcast_lookup(full_map, "cur", labels2_pa,
                                     "vid", ["cid"])
                full_map = j.map_batches(
                    lambda b: pa.table({"ovid": b.column("ovid"),
                                        "cur": b.column("cid")}),
                    batch_format="pyarrow",
                    zero_copy_batch=True).materialize()
            if K == n_cur:
                break  # no contraction: fixpoint
            cur_edges = rd.from_arrow(cross_pa)
            cur_offsets = off2
            info["levels"][-1]["contract_sec"] = \
                round(time.time() - t_lvl - t_p1, 3)
            continue
        # big regime: pure Ray Data — distributed dense re-id, two
        # bucketed relabel joins, one grouped fold
        cmap, off2 = assign_dense_ids_hash(
            labels.select_columns(["label"]), "label", parts2,
            id_col="cid")
        cmap = cmap.select_columns(["label", "cid"]).materialize()
        K = int(off2[-1])
        info["levels"].append({
            "n_vertices": n_cur, "n_communities": K,
            "moves": moves, "subrounds": subrounds, "m2": m2,
            "moves_hist": moves_hist, "phase1_sec": round(t_p1, 3),
            "contract": "distributed"})
        # labels2: (vid, cid) — current-level vertex -> new community id
        labels2 = _relabel(labels, "label", cmap, cfg, out_col="cid",
                           keep=["vid"],
                           schema_cols={"vid": i64}).materialize()
        # compose the original-space mapping
        if full_map is None:
            full_map = labels2.map_batches(
                lambda b: pa.table({"ovid": b.column("vid"),
                                    "cur": b.column("cid")}),
                batch_format="pyarrow", zero_copy_batch=True).materialize()
        else:
            lmap = labels2.map_batches(
                lambda b: pa.table({"label": b.column("vid"),
                                    "cid": b.column("cid")}),
                batch_format="pyarrow", zero_copy_batch=True)
            full_map = _relabel(full_map, "cur", lmap, cfg,
                                out_col="cur", keep=["ovid"],
                                schema_cols={"ovid": i64}).materialize()
        if K == n_cur:
            break  # no contraction: fixpoint
        # contract edges: relabel both endpoints, fold parallel edges.
        # The contraction input must carry the CURRENT level's self-loop
        # mass too (as (v, v, w) rows) or k/m2 shrink level over level.
        src_map = labels2.map_batches(
            lambda b: pa.table({"label": b.column("vid"),
                                "cid": b.column("cid")}),
            batch_format="pyarrow", zero_copy_batch=True)
        contract_in = cur_edges
        if selfw_files:
            contract_in = contract_in.union(
                rd.read_parquet(sorted(selfw_files.values())).map_batches(
                    lambda b: pa.table({"src": b.column("vid"),
                                        "dst": b.column("vid"),
                                        "w": b.column("rank")}),
                    batch_format="pyarrow", zero_copy_batch=True))
        e1 = _relabel(contract_in, "src", src_map, cfg,
                      keep=["dst", "w"],
                      schema_cols={"dst": i64, "w": f64})
        e2 = _relabel(e1, "dst", src_map, cfg, keep=["src", "w"],
                      schema_cols={"src": i64, "w": f64})
        cedges = grouped_aggregate(e2, ["src", "dst"],
                                   {"w": ("sum", "w")},
                                   num_parts=cfg.num_parts).materialize()
        def selfmass(b: pa.Table) -> pa.Table:
            t = b.filter(pc.equal(b.column("src"), b.column("dst")))
            return pa.table({"vid": t.column("src"),
                             "rank": t.column("w")})

        def crossonly(b: pa.Table) -> pa.Table:
            return b.filter(pc.not_equal(b.column("src"),
                                         b.column("dst")))

        selfw_files = _write_ranks_by_part(
            cedges.map_batches(selfmass, batch_format="pyarrow",
                               zero_copy_batch=True),
            off2, selfw_out)
        cur_edges = cedges.map_batches(crossonly, batch_format="pyarrow",
                                       zero_copy_batch=True)
        cur_offsets = off2
        info["levels"][-1]["contract_sec"] = \
            round(time.time() - t_lvl - t_p1, 3)
    # ---- canonicalize: community = min original vid per community ----
    if full_map is None:  # zero moves at level 0: all singletons
        out = rd.from_arrow(pa.table({
            "vid": pa.array(np.arange(N, dtype=np.int64)),
            "community": pa.array(np.arange(N, dtype=np.int64))}))
        info["n_communities"] = N
        info["wall_sec"] = round(time.time() - t0, 4)
        return out, info
    reps = grouped_aggregate(full_map, ["cur"], {"rep": ("min", "ovid")},
                             num_parts=cfg.num_parts)
    j = hash_join(full_map, reps, on="cur", right_on="cur",
                  num_parts=cfg.num_parts,
                  left_schema=pa.schema([("ovid", i64), ("cur", i64)]),
                  right_schema=pa.schema([("cur", i64), ("rep", i64)]))
    out = j.map_batches(
        lambda b: pa.table({"vid": b.column("ovid"),
                            "community": b.column("rep")}),
        batch_format="pyarrow", zero_copy_batch=True)
    info["n_communities"] = int(info["levels"][-1]["n_communities"]) \
        if info["levels"] else N
    info["wall_sec"] = round(time.time() - t0, 4)
    return out, info
