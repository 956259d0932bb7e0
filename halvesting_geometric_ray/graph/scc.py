"""Strongly connected components: incremental trim + forward coloring +
multi-root backward BFS on the CSR shard engine.

The DIRECTED counterpart of graph/components.py — the full per-vertex
decomposition behind the bow-tie census (graph/bowtie.py classifies
reachability relative to ONE pivot; this labels EVERY SCC).  Reference
conformance anchor: the reference materializes the directed citation
graph and filters on its structure (halvesting_geometric/utils/data/
link_prediction_dataset.py:50-75); SCC labels are the canonical
structural key of such a graph.

Algorithm — the multi-pivot FW-BW / coloring family (Orzan 2004;
Hong, Rodia & Olukotun 2013 "On fast parallel detection of strongly
connected components"), synchronous rounds, one barrier per round:

outer round =
  TRIM      iteratively assign vertices with no remaining active
            in-edges or out-edges as singleton SCCs; each assignment
            sends degree decrements to its fwd/bwd neighbors, which may
            expose new trims (the long IN/OUT tendril mass of a web
            crawl drains here in a few rounds);
  COLOR     color(v) <- vid(v) for active vertices, then propagate
            color(v) = max(color(v), color(u)) along active u->v edges
            to fixpoint (delta scatter: only changed colors are sent);
  PEEL      every active v with color(v) == vid(v) is a root (the
            max-vid vertex of its SCC — see invariant below); backward
            BFS from all roots simultaneously, restricted to vertices
            of the root's color, assigns scc = color;
  SYNC      peeled vertices send degree decrements so the next TRIM
            sees the shrunken active graph.

Invariant (makes labels canonical): at the color fixpoint, color(v) is
the max vid that reaches v through active vertices; a root c therefore
satisfies color(c) = c, every member of SCC(c) has color c, and the
color-restricted backward reach of c is exactly SCC(c).  Since every
member m of SCC(c) reaches c, m <= color(c) = c — the assigned label is
the MAX member vid of its SCC: partitioning/actor-layout independent
and stable across runs (certified by tests/test_scc.py's Tarjan oracle
and the gate-scale mutual-reachability SQL closure, q_scc_urls).

Scale shape: per-vertex state (scc, color, degree counters) lives on
the owning shard actor; every phase exchanges only combined messages
(max per unique destination for colors, unique pairs for the BFS
frontier, counted decrements for trim).  The driver holds O(actors)
scalars per round.  Outer rounds peel >= one SCC per color region —
small-diameter web graphs finish in a handful; pathological long
chains degrade to O(chain) cheap trim rounds, never O(chain) color
fixpoints.
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

_UNSET = np.int64(-1)


def _swap(edges):
    def swap(b: pa.Table) -> pa.Table:
        return pa.table({"src": b.column("dst"), "dst": b.column("src")})

    return edges.map_batches(swap, batch_format="pyarrow",
                             zero_copy_batch=True)


@ray.remote(num_cpus=0)
class SccShardActor:
    def __init__(self, actor_idx: int, owned: List[int],
                 fwd_paths: Dict[int, str], bwd_paths: Dict[int, str],
                 offsets: np.ndarray, part2actor: np.ndarray,
                 num_actors: int):
        self.idx = actor_idx
        self.owned = owned
        self.off = offsets
        self.p2a = part2actor
        self.num_actors = num_actors
        self.fwd = {p: load_shard(fwd_paths[p]) for p in owned}
        self.bwd = {p: load_shard(bwd_paths[p]) for p in owned}
        self.scc: Dict[int, np.ndarray] = {}
        self.color: Dict[int, np.ndarray] = {}
        self.changed: Dict[int, np.ndarray] = {}
        self.indeg: Dict[int, np.ndarray] = {}
        self.outdeg: Dict[int, np.ndarray] = {}
        self.frontier: Dict[int, np.ndarray] = {}
        # vids assigned since the last SYNC (trim emits its own
        # decrements inline; this buffers the PEEL assignments)
        self.pending_dec: List[np.ndarray] = []
        for p in owned:
            n = self.fwd[p]["vid_hi"] - self.fwd[p]["vid_lo"]
            self.scc[p] = np.full(n, _UNSET, dtype=np.int64)
            self.color[p] = np.full(n, _UNSET, dtype=np.int64)
            self.changed[p] = np.zeros(n, dtype=bool)
            self.outdeg[p] = self.fwd[p]["outdeg"].astype(np.int64)
            self.indeg[p] = self.bwd[p]["outdeg"].astype(np.int64)

    # ---- routing ---------------------------------------------------------
    def _route_pairs(self, vids: np.ndarray, vals: np.ndarray):
        """Split aligned (vid, value) arrays by owning actor."""
        part = np.searchsorted(self.off, vids, side="right") - 1
        dest = self.p2a[part]
        order = np.argsort(dest, kind="stable")
        v, w = vids[order], vals[order]
        b = np.searchsorted(dest[order], np.arange(self.num_actors + 1))
        return [(v[b[j]:b[j + 1]], w[b[j]:b[j + 1]])
                if b[j + 1] > b[j] else None
                for j in range(self.num_actors)]

    def _neighbors(self, shard: Dict, local: np.ndarray,
                   vals: Optional[np.ndarray] = None):
        """Neighbor vids of `local` (and, if given, each neighbor's
        originating value repeated along the adjacency slice)."""
        indptr, indices = shard["indptr"], shard["indices"]
        starts, ends = indptr[local], indptr[local + 1]
        cnt = ends - starts
        total = int(cnt.sum())
        if total == 0:
            e = np.empty(0, dtype=np.int64)
            return (e, e) if vals is not None else e
        csum = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        pos = np.repeat(starts - csum, cnt) + np.arange(total)
        nbrs = indices[pos]
        if vals is None:
            return nbrs
        return nbrs, np.repeat(vals, cnt)

    def _dec_messages(self, per_part_locals: Dict[int, np.ndarray]):
        """Degree-decrement messages for newly assigned vertices: each
        sends indeg-- to fwd neighbors, outdeg-- to bwd neighbors.
        Message = (ivids, icnt, ovids, ocnt) per target actor."""
        iv_parts, ov_parts = [], []
        for p, local in per_part_locals.items():
            if local.size == 0:
                continue
            iv_parts.append(self._neighbors(self.fwd[p], local))
            ov_parts.append(self._neighbors(self.bwd[p], local))
        iv = (np.concatenate(iv_parts) if iv_parts
              else np.empty(0, dtype=np.int64))
        ov = (np.concatenate(ov_parts) if ov_parts
              else np.empty(0, dtype=np.int64))
        ivu, ivc = np.unique(iv, return_counts=True)
        ovu, ovc = np.unique(ov, return_counts=True)
        im = self._route_pairs(ivu, ivc)
        om = self._route_pairs(ovu, ovc)
        return [((im[j][0], im[j][1]) if im[j] else (None, None),
                 (om[j][0], om[j][1]) if om[j] else (None, None))
                for j in range(self.num_actors)]

    def _apply_decs(self, incoming) -> None:
        for msg in incoming:
            if msg is None:
                continue
            (iv, ic), (ov, oc) = msg
            for p in self.owned:
                lo = self.fwd[p]["vid_lo"]
                hi = self.fwd[p]["vid_hi"]
                if iv is not None:
                    m = (iv >= lo) & (iv < hi)
                    if m.any():
                        np.subtract.at(self.indeg[p], iv[m] - lo, ic[m])
                if ov is not None:
                    m = (ov >= lo) & (ov < hi)
                    if m.any():
                        np.subtract.at(self.outdeg[p], ov[m] - lo, oc[m])

    def _n_active(self) -> int:
        return int(sum((self.scc[p] == _UNSET).sum() for p in self.owned))

    # ---- TRIM ------------------------------------------------------------
    def trim_pass(self, *incoming):
        """Apply degree decrements, assign zero-in/zero-out active
        vertices as singleton SCCs, emit their decrements.  Returns
        num_actors messages + (n_trimmed, n_active)."""
        self._apply_decs(incoming)
        newly: Dict[int, np.ndarray] = {}
        trimmed = 0
        for p in self.owned:
            lo = self.fwd[p]["vid_lo"]
            active = self.scc[p] == _UNSET
            kill = active & ((self.indeg[p] <= 0) | (self.outdeg[p] <= 0))
            local = np.flatnonzero(kill)
            if local.size:
                self.scc[p][local] = local + lo
                trimmed += int(local.size)
            newly[p] = local
        msgs = self._dec_messages(newly) if trimmed else \
            [None] * self.num_actors
        return (*msgs, (trimmed, self._n_active()))

    # ---- COLOR -----------------------------------------------------------
    def color_start(self):
        """Reset colors of active vertices to their own vid and scatter
        them all (round-0 delta = everything active)."""
        for p in self.owned:
            lo = self.fwd[p]["vid_lo"]
            n = self.color[p].size
            active = self.scc[p] == _UNSET
            self.color[p] = np.where(
                active, np.arange(lo, lo + n, dtype=np.int64), _UNSET)
            self.changed[p] = active
        return (*self._color_scatter(), None)

    def _color_scatter(self):
        """Send max(color) per unique fwd neighbor of changed actives."""
        vparts, cparts = [], []
        for p in self.owned:
            local = np.flatnonzero(self.changed[p])
            self.changed[p][:] = False
            if local.size == 0:
                continue
            nbrs, cols = self._neighbors(self.fwd[p], local,
                                         self.color[p][local])
            if nbrs.size == 0:
                continue
            uv, inv = np.unique(nbrs, return_inverse=True)
            mx = np.full(uv.size, _UNSET, dtype=np.int64)
            np.maximum.at(mx, inv, cols)
            vparts.append(uv)
            cparts.append(mx)
        if not vparts:
            return [None] * self.num_actors
        return self._route_pairs(np.concatenate(vparts),
                                 np.concatenate(cparts))

    def color_step(self, *incoming):
        """Apply round-k max-color messages to active vertices, scatter
        the newly raised colors.  Returns A messages + n_changed."""
        n_changed = 0
        for p in self.owned:
            lo = self.fwd[p]["vid_lo"]
            hi = self.fwd[p]["vid_hi"]
            active = self.scc[p] == _UNSET
            new = self.color[p].copy()
            for msg in incoming:
                if msg is None:
                    continue
                vids, cols = msg
                m = (vids >= lo) & (vids < hi)
                if m.any():
                    np.maximum.at(new, vids[m] - lo, cols[m])
            new = np.where(active, new, self.color[p])
            ch = new != self.color[p]
            self.color[p] = new
            self.changed[p] |= ch
            n_changed += int(ch.sum())
        return (*self._color_scatter(), n_changed)

    # ---- PEEL (multi-root backward BFS) -----------------------------------
    def bwd_start(self):
        """Assign every active root (color == vid) its own SCC label and
        emit the first backward frontier.  Returns A msgs + n_roots."""
        n_roots = 0
        for p in self.owned:
            lo = self.fwd[p]["vid_lo"]
            active = self.scc[p] == _UNSET
            vids = np.arange(lo, lo + active.size, dtype=np.int64)
            root = active & (self.color[p] == vids)
            local = np.flatnonzero(root)
            n_roots += int(local.size)
            self.scc[p][local] = self.color[p][local]
            self.frontier[p] = local
            if local.size:
                self.pending_dec.append(local + lo)
        return (*self._bwd_scatter(), n_roots)

    def _bwd_scatter(self):
        vparts, cparts = [], []
        for p in self.owned:
            local = self.frontier.get(p)
            self.frontier[p] = np.empty(0, dtype=np.int64)
            if local is None or local.size == 0:
                continue
            nbrs, cols = self._neighbors(self.bwd[p], local,
                                         self.scc[p][local])
            if nbrs.size == 0:
                continue
            # dedup exact (vid, color) pairs before shipping
            order = np.lexsort((cols, nbrs))
            nbrs, cols = nbrs[order], cols[order]
            keep = np.ones(nbrs.size, dtype=bool)
            keep[1:] = (nbrs[1:] != nbrs[:-1]) | (cols[1:] != cols[:-1])
            vparts.append(nbrs[keep])
            cparts.append(cols[keep])
        if not vparts:
            return [None] * self.num_actors
        return self._route_pairs(np.concatenate(vparts),
                                 np.concatenate(cparts))

    def bwd_step(self, *incoming):
        """Settle round-k backward arrivals (active + color match ->
        join the root's SCC), emit the next frontier.  Returns A msgs +
        n_settled."""
        settled = 0
        for p in self.owned:
            lo = self.fwd[p]["vid_lo"]
            hi = self.fwd[p]["vid_hi"]
            hits: List[np.ndarray] = []
            for msg in incoming:
                if msg is None:
                    continue
                vids, cols = msg
                m = (vids >= lo) & (vids < hi)
                if not m.any():
                    continue
                local = vids[m] - lo
                cols_m = cols[m]
                ok = (self.scc[p][local] == _UNSET) & \
                     (self.color[p][local] == cols_m)
                if ok.any():
                    self.scc[p][local[ok]] = cols_m[ok]
                    hits.append(local[ok])
            if hits:
                f = np.unique(np.concatenate(hits))
                settled += int(f.size)
                self.frontier[p] = f
                self.pending_dec.append(f + lo)
        return (*self._bwd_scatter(), settled)

    # ---- SYNC ------------------------------------------------------------
    def dec_sync(self):
        """Emit degree decrements for everything the PEEL phase assigned
        (feeds the next outer round's first trim_pass)."""
        per_part: Dict[int, np.ndarray] = {}
        if self.pending_dec:
            allv = np.concatenate(self.pending_dec)
            self.pending_dec = []
            for p in self.owned:
                lo = self.fwd[p]["vid_lo"]
                hi = self.fwd[p]["vid_hi"]
                m = (allv >= lo) & (allv < hi)
                per_part[p] = allv[m] - lo
        else:
            for p in self.owned:
                per_part[p] = np.empty(0, dtype=np.int64)
        msgs = self._dec_messages(per_part)
        return tuple(msgs) if self.num_actors > 1 else msgs[0]

    # ---- results ---------------------------------------------------------
    def result_tables(self):
        out = []
        for p in self.owned:
            lo = self.fwd[p]["vid_lo"]
            s = self.scc[p]
            out.append(pa.table({
                "part": pa.array(np.full(s.size, p, dtype=np.int32)),
                "vid": pa.array(np.arange(lo, lo + s.size, dtype=np.int64)),
                "scc": pa.array(s),
            }))
        return out


def strongly_connected_components(
        edges, offsets: np.ndarray, workdir: str,
        cfg: EngineConfig = DEFAULT, *,
        max_outer: Optional[int] = None,
        num_actors: int = 0,
        fwd_shards_dir: Optional[str] = None,
        bwd_shards_dir: Optional[str] = None) -> Tuple["rd.Dataset", Dict]:
    """Exact SCC labels of a DIRECTED edge table (src, dst).  Returns
    (ds(part, vid, scc), info); every vid in [0, offsets[-1]) appears
    exactly once and scc is the MAX member vid of its component (the
    canonical label — see module docstring invariant).
    """
    from .csr import build_csr_shards

    N = int(offsets[-1])
    num_parts = len(offsets) - 1
    max_outer = max_outer if max_outer is not None else cfg.max_iters

    # forward CSR = the directed shards pagerank/hits build: same dir +
    # same lineage stamp so the cache is shared, not defeated
    fdescs = build_csr_shards(edges, offsets,
                              fwd_shards_dir or f"{workdir}/csr",
                              lineage={"kind": "directed"})
    bdescs = build_csr_shards(_swap(edges), offsets,
                              bwd_shards_dir or f"{workdir}/csr_scc_bwd",
                              lineage={"kind": "scc_bwd"})
    fpaths = {dd["part"]: dd["path"] for dd in fdescs}
    bpaths = {dd["part"]: dd["path"] for dd in bdescs}

    owned = plan_actors(num_parts, num_actors)
    A = len(owned)
    p2a = part_to_actor_map(owned, num_parts)
    actors = [SccShardActor.remote(i, owned[i], fpaths, bpaths,
                                   np.asarray(offsets), p2a, A)
              for i in range(A)]
    info: Dict = {"n": N, "rounds": []}
    t0 = time.time()

    def _phase(method: str, inbox, counter):
        """Run one synchronous message phase to exhaustion.  `counter`
        folds the per-actor scalar tail; stops when it returns 0."""
        total_rounds = 0
        while True:
            outs = [list(getattr(actors[j], method)
                         .options(num_returns=A + 1).remote(*inbox[j]))
                    for j in range(A)]
            tails = ray.get([o[A] for o in outs])
            inbox = transpose_refs([o[:A] for o in outs])
            total_rounds += 1
            if counter(tails) == 0:
                return inbox, total_rounds
            if total_rounds > N + 2:
                raise RuntimeError(
                    f"scc: phase {method} failed to converge in {total_rounds}"
                    f" rounds (N={N}) — inconsistent shard state")

    try:
        trim_inbox = [[] for _ in range(A)]
        assigned = 0
        converged = False
        for outer in range(1, max_outer + 1):
            r: Dict = {"outer": outer}
            # TRIM to fixpoint (first pass also applies last SYNC's decs)
            state = {"active": None, "trimmed": 0}

            def trim_counter(tails):
                state["trimmed"] += sum(t[0] for t in tails)
                state["active"] = sum(t[1] for t in tails)
                return sum(t[0] for t in tails)

            trim_inbox, r["trim_rounds"] = _phase("trim_pass", trim_inbox,
                                                  trim_counter)
            r["trimmed"] = state["trimmed"]
            assigned += state["trimmed"]
            if state["active"] == 0:
                r["active_after_trim"] = 0
                info["rounds"].append(r)
                converged = True
                break
            r["active_after_trim"] = state["active"]

            # COLOR to fixpoint
            starts = [list(a.color_start.options(num_returns=A + 1).remote())
                      for a in actors]
            inbox = transpose_refs([o[:A] for o in starts])
            inbox, r["color_rounds"] = _phase(
                "color_step", inbox, lambda tails: sum(tails))

            # PEEL: multi-root backward BFS
            starts = [list(a.bwd_start.options(num_returns=A + 1).remote())
                      for a in actors]
            n_roots = sum(ray.get([o[A] for o in starts]))
            inbox = transpose_refs([o[:A] for o in starts])
            peeled = {"n": n_roots}

            def bwd_counter(tails):
                s = sum(tails)
                peeled["n"] += s
                return s

            inbox, r["bfs_rounds"] = _phase("bwd_step", inbox, bwd_counter)
            r["n_roots"] = int(n_roots)
            r["peeled"] = int(peeled["n"])
            assigned += peeled["n"]
            info["rounds"].append(r)
            if n_roots == 0:
                raise RuntimeError(
                    "scc: color fixpoint produced no roots with active "
                    "vertices remaining — invariant violated")
            if assigned >= N:
                converged = True
                break
            # SYNC peel decrements -> next outer round's trim
            sync = [list(a.dec_sync.options(num_returns=A).remote())
                    if A > 1 else [a.dec_sync.remote()] for a in actors]
            trim_inbox = transpose_refs(sync)
        if not converged:
            raise RuntimeError(
                f"scc: did not converge within max_outer={max_outer} "
                f"rounds ({assigned}/{N} assigned); raise max_outer for "
                "adversarial chain-heavy graphs")
        tables = [t for ref in [a.result_tables.remote() for a in actors]
                  for t in ray.get(ref)]
    finally:
        for a in actors:
            ray.kill(a)

    info["num_outer"] = len(info["rounds"])
    info["n_sccs"] = int(sum(rr.get("trimmed", 0) + rr.get("n_roots", 0)
                             for rr in info["rounds"]))
    info["wall_sec"] = round(time.time() - t0, 4)
    tables = [t for t in tables if t.num_rows] or [pa.schema(
        [pa.field("part", pa.int32()), pa.field("vid", pa.int64()),
         pa.field("scc", pa.int64())]).empty_table()]
    return rd.from_arrow(tables), info


def condensation(edges, labels, cfg: EngineConfig = DEFAULT):
    """Weighted condensation of a directed graph: contract every SCC to
    one vertex (its label from ``strongly_connected_components``) and
    keep inter-SCC edges with their multiplicity.  The result is a DAG
    — the macro-structure a bow-tie census summarizes, kept exact.

    Scale shape (the host-graph contraction / modularity pattern): two
    bucketed hash joins attach endpoint labels (labels is |V|-sized,
    never broadcast), a per-batch pair combiner pre-counts, and one
    grouped sum reduces to the condensed edge list.  Returns
    ds(src_scc, dst_scc, n_edges) over the DISTINCT input edge set.
    """
    from ..ops.agg import grouped_aggregate
    from ..ops.join import hash_join

    i64 = pa.int64()
    la = labels.map_batches(
        lambda b: pa.table({"vid": b.column("vid"),
                            "l_src": b.column("scc")}),
        batch_format="pyarrow", zero_copy_batch=True)
    lb = labels.map_batches(
        lambda b: pa.table({"vid": b.column("vid"),
                            "l_dst": b.column("scc")}),
        batch_format="pyarrow", zero_copy_batch=True)
    j1 = hash_join(edges, la, on="src", right_on="vid",
                   num_parts=cfg.num_parts,
                   left_schema=pa.schema([("src", i64), ("dst", i64)]),
                   right_schema=pa.schema([("vid", i64), ("l_src", i64)]))
    j2 = hash_join(j1, lb, on="dst", right_on="vid",
                   num_parts=cfg.num_parts,
                   left_schema=pa.schema([("dst", i64), ("src", i64),
                                          ("l_src", i64)]),
                   right_schema=pa.schema([("vid", i64), ("l_dst", i64)]))

    def pairs(b: pa.Table) -> pa.Table:
        ls = b.column("l_src").to_numpy()
        ld = b.column("l_dst").to_numpy()
        keep = ls != ld
        ls, ld = ls[keep], ld[keep]
        if ls.size == 0:
            return pa.schema([("src_scc", i64), ("dst_scc", i64),
                              ("n_edges", i64)]).empty_table()
        order = np.lexsort((ld, ls))
        ls, ld = ls[order], ld[order]
        new = np.ones(ls.size, dtype=bool)
        new[1:] = (ls[1:] != ls[:-1]) | (ld[1:] != ld[:-1])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, ls.size))
        return pa.table({"src_scc": pa.array(ls[starts]),
                         "dst_scc": pa.array(ld[starts]),
                         "n_edges": pa.array(cnt.astype(np.int64))})

    return grouped_aggregate(
        j2.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True),
        ["src_scc", "dst_scc"], {"n_edges": ("sum", "n_edges")},
        num_parts=cfg.num_parts)
