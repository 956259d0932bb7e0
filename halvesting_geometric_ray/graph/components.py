"""Connected components: min-label propagation + pointer jumping.

The exact-label analogue of the reference's message passing
(modules/sage.py:56-82) over the SYMMETRIZED edge table (the reference's
ToUndirected, link_prediction_datamodule.py:124-136).  Invariant: a
vertex's label only ever decreases and is always a vid of its own
component, so the fixpoint is the component-minimum vid — exact, and
order-free (min-reductions commute, so any partitioning gives identical
results, per SURVEY.md section 7.4).

One round =
  LP phase: scatter min(label) per unique destination along sym edges
            (per-shard minimum.at combiner) -> exchange -> gather
            new = min(old, incoming);
  PJ phase (pointer jumping, cf. "Finding connected components in
            map-reduce in logarithmic rounds", ICDE 2013, and the north
            rule): label <- label[label].  Labels are vids, so the owner
            of label l is owner_of(l): each actor queries the owners of
            its distinct labels and rewrites — collapsing label chains
            so convergence needs O(log n) rounds on long paths instead
            of O(diameter).

Terminates when neither phase changes any label.  Checkpoints labels +
per-vertex changed flags per partition per iteration (same lineage
manifest machinery as PageRank) with mid-iteration file reuse.
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
from ..state.checkpoint import IterativeCheckpoint
from .csr import load_shard
from .engine import part_to_actor_map, plan_actors, scatter_refs_matrix, transpose_refs

_INT64_MAX = np.iinfo(np.int64).max


def write_label_parts(labels, offsets: np.ndarray, out_dir: str) -> Dict[int, str]:
    """Re-bucket a (vid, label) Dataset by the CURRENT vid offsets and
    write one parquet file per partition (distributed — labels never
    land on the driver).  Returns {part: path} for the non-empty parts;
    the files feed ``LabelShardActor.load_state`` (warm starts)."""
    os.makedirs(out_dir, exist_ok=True)
    off = np.asarray(offsets, dtype=np.int64)

    def bucket(b: pa.Table) -> pa.Table:
        vid = b.column("vid").to_numpy(zero_copy_only=False)
        part = (np.searchsorted(off, vid, side="right") - 1).astype(np.int32)
        return pa.table({"part": pa.array(part), "vid": b.column("vid"),
                         "label": b.column("label")})

    def dump(g: pa.Table) -> pa.Table:
        p = int(g.column("part")[0].as_py())
        path = os.path.join(out_dir, f"part-{p}.parquet")
        pq.write_table(g.select(["vid", "label"]), path)
        return pa.table({"part": pa.array([p], type=pa.int32()),
                         "path": pa.array([path])})

    out = (labels.select_columns(["vid", "label"])
           .map_batches(bucket, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby("part")
           .map_groups(dump, batch_format="pyarrow",
                       retry_exceptions=True)).to_pandas()
    return {int(r["part"]): r["path"] for _, r in out.iterrows()}


@ray.remote(num_cpus=0)
class LabelShardActor:
    def __init__(self, actor_idx: int, owned: List[int], paths: Dict[int, str],
                 offsets: np.ndarray, part2actor: np.ndarray, num_actors: int):
        self.idx = actor_idx
        self.owned = owned
        self.off = offsets
        self.p2a = part2actor
        self.num_actors = num_actors
        self.shards: Dict[int, Dict] = {}
        self.labels: Dict[int, np.ndarray] = {}
        for p in owned:
            s = dict(load_shard(paths[p]))
            dest = part2actor[s["udst_part"]]
            order = np.argsort(dest, kind="stable")
            s["route_order"] = order
            s["route_udsts"] = s["udsts"][order]
            s["route_bounds"] = np.searchsorted(dest[order],
                                                np.arange(num_actors + 1))
            self.shards[p] = s
            self.labels[p] = np.arange(s["vid_lo"], s["vid_hi"], dtype=np.int64)

    def load_state(self, files: Dict[int, str]) -> bool:
        for p, path in files.items():
            t = pq.read_table(path, columns=["vid", "label"])
            lo = self.shards[p]["vid_lo"]
            lab = self.labels[p].copy()
            lab[t.column("vid").to_numpy() - lo] = t.column("label").to_numpy()
            self.labels[p] = lab
        return True

    # ---- LP phase -------------------------------------------------------
    def scatter(self):
        per_v: List[List[np.ndarray]] = [[] for _ in range(self.num_actors)]
        per_l: List[List[np.ndarray]] = [[] for _ in range(self.num_actors)]
        for p in self.owned:
            s = self.shards[p]
            if s["indices"].size == 0:
                continue
            per_edge = np.repeat(self.labels[p], s["outdeg"])
            mins = np.full(len(s["udsts"]), _INT64_MAX, dtype=np.int64)
            np.minimum.at(mins, s["uinv"], per_edge)
            mins = mins[s["route_order"]]
            b = s["route_bounds"]
            for j in range(self.num_actors):
                if b[j + 1] > b[j]:
                    per_v[j].append(s["route_udsts"][b[j]:b[j + 1]])
                    per_l[j].append(mins[b[j]:b[j + 1]])
        out = [(np.concatenate(per_v[j]), np.concatenate(per_l[j]))
               if per_v[j] else None for j in range(self.num_actors)]
        return tuple(out) if self.num_actors > 1 else out[0]

    def apply_min(self, *incoming) -> int:
        changed = 0
        for p in self.owned:
            lo, hi = self.shards[p]["vid_lo"], self.shards[p]["vid_hi"]
            new = self.labels[p].copy()
            for msg in incoming:
                if msg is None:
                    continue
                vids, labs = msg
                m = (vids >= lo) & (vids < hi)
                if m.any():
                    np.minimum.at(new, vids[m] - lo, labs[m])
            changed += int((new != self.labels[p]).sum())
            self.labels[p] = new
        return changed

    # ---- PJ phase -------------------------------------------------------
    def pj_queries(self):
        """Distinct labels of my vertices, routed to the label's owner."""
        allq = np.unique(np.concatenate([self.labels[p] for p in self.owned])) \
            if self.owned else np.empty(0, dtype=np.int64)
        part = (np.searchsorted(self.off, allq, side="right") - 1)
        dest = self.p2a[part]
        order = np.argsort(dest, kind="stable")
        q = allq[order]
        b = np.searchsorted(dest[order], np.arange(self.num_actors + 1))
        out = [q[b[j]:b[j + 1]] if b[j + 1] > b[j] else None
               for j in range(self.num_actors)]
        return tuple(out) if self.num_actors > 1 else out[0]

    def pj_answers(self, *queries):
        """label[q] for each incoming query vid (I own those vids)."""
        out = []
        for q in queries:
            if q is None:
                out.append(None)
                continue
            ans = np.empty(len(q), dtype=np.int64)
            for p in self.owned:
                lo, hi = self.shards[p]["vid_lo"], self.shards[p]["vid_hi"]
                m = (q >= lo) & (q < hi)
                if m.any():
                    ans[m] = self.labels[p][q[m] - lo]
            out.append((q, ans))
        return tuple(out) if len(out) > 1 else out[0]

    # ---- fused pipelined round steps -----------------------------------
    # One CC round used to be 5 sequential driver barriers (scatter,
    # apply_min, pj_queries, pj_answers, pj_apply).  Fused to 3 actor
    # calls with NO driver blocking inside the round (PageRank's
    # pipelined-step pattern): apply_and_query -> pj_answers ->
    # pj_apply_and_scatter, where the last also emits the NEXT round's
    # min-label messages; the convergence check trails one round behind.

    def apply_and_query(self, *incoming):
        """Apply round-k min messages, then emit pointer-jump queries.
        Returns A query messages + the lp_changed count."""
        lp_changed = self.apply_min(*incoming)
        q = self.pj_queries()
        qs = list(q) if self.num_actors > 1 else [q]
        return (*qs, lp_changed)

    def pj_apply_and_scatter(self, k: int, ckpt_paths: Dict[int, str],
                             reuse: Dict[int, str], *answers):
        """pj_apply + checkpoint, then emit round-(k+1) scatter messages.
        Returns A scatter messages + the pj_changed count."""
        pj_changed = self.pj_apply(k, ckpt_paths, reuse, *answers)
        s = self.scatter()
        msgs = list(s) if self.num_actors > 1 else [s]
        return (*msgs, pj_changed)

    def pj_apply(self, k: int, ckpt_paths: Dict[int, str],
                 reuse: Dict[int, str], *answers) -> int:
        """label <- label[label]; then checkpoint this iteration."""
        qs = [a[0] for a in answers if a is not None]
        vs = [a[1] for a in answers if a is not None]
        changed = 0
        if qs:
            qcat = np.concatenate(qs)
            vcat = np.concatenate(vs)
            order = np.argsort(qcat)
            qcat, vcat = qcat[order], vcat[order]
        for p in self.owned:
            s = self.shards[p]
            lo, hi = s["vid_lo"], s["vid_hi"]
            if p in reuse:
                t = pq.read_table(reuse[p], columns=["vid", "label", "delta"])
                lab = self.labels[p].copy()
                lab[t.column("vid").to_numpy() - lo] = t.column("label").to_numpy()
                self.labels[p] = lab
                changed += int(t.column("delta").to_numpy().sum())
                continue
            if qs:
                idx = np.searchsorted(qcat, self.labels[p])
                new = vcat[idx]
            else:
                new = self.labels[p]
            ch = (new != self.labels[p])
            changed += int(ch.sum())
            self.labels[p] = new
            out = pa.table({
                "part": pa.array(np.full(hi - lo, p, dtype=np.int32)),
                "vid": pa.array(np.arange(lo, hi, dtype=np.int64)),
                "label": pa.array(new),
                "delta": pa.array(ch.astype(np.int64)),
            })
            IterativeCheckpoint.write_part(out, ckpt_paths[p])
        return changed


def connected_components(sym_edges, offsets: np.ndarray, workdir: str,
                         cfg: EngineConfig = DEFAULT, *,
                         max_iters: Optional[int] = None, job: str = "cc",
                         resume: bool = True, pointer_jumping: bool = True,
                         shards_dir: Optional[str] = None,
                         warm_labels=None,
                         num_actors: int = 0) -> Tuple["rd.Dataset", Dict]:
    """Exact min-vid component labels over a SYMMETRIZED edge table
    (callers: use graph.build.symmetrize first).  Returns (labels_ds, info)
    with labels_ds columns (part, vid, label).

    ``warm_labels``: optional (vid, label) Dataset from a PREVIOUS run
    on a subgraph of this one (the incremental-recrawl path,
    graph/incremental.py::extend_graph): edges only ever merge
    components, so any labeling with label(v) = min-vid of v's old
    component is a valid (and much closer) starting point — new
    vertices default to their own vid.  Labels are re-bucketed by the
    CURRENT offsets (the old run's partitioning is irrelevant) and
    convergence yields bitwise the same labels as a cold run, in fewer
    rounds.  Ignored when an own-job checkpoint is resumable (the
    checkpoint is strictly newer state)."""
    from .csr import build_csr_shards

    max_iters = cfg.max_iters if max_iters is None else max_iters
    N = int(offsets[-1])
    num_parts = len(offsets) - 1

    descs = build_csr_shards(sym_edges, offsets, shards_dir or f"{workdir}/csr_sym",
                             lineage={"kind": "sym"})
    paths = {dd["part"]: dd["path"] for dd in descs}
    ckpt = IterativeCheckpoint(
        workdir, job, {"algo": "cc", "n": N, "parts": num_parts,
                       "pj": pointer_jumping})

    def labels_ds(k: int):
        return (rd.read_parquet(ckpt.state_files(k))
                .select_columns(["part", "vid", "label"]))

    k0 = ckpt.latest_complete() if resume else None
    info: Dict = {"resumed_from": k0,
                  "iters": list(ckpt.metrics_history()) if k0 else []}
    if k0 is not None and info["iters"] and info["iters"][-1]["changed"] == 0:
        info["num_iters"] = len(info["iters"])
        info["converged"] = True
        return labels_ds(k0), info

    owned = plan_actors(num_parts, num_actors)
    A = len(owned)
    p2a = part_to_actor_map(owned, num_parts)
    actors = [LabelShardActor.remote(i, owned[i], paths, offsets, p2a, A)
              for i in range(A)]
    last_k = k0 or 0
    try:
        if k0 is not None:
            ray.get([a.load_state.remote(
                {p: ckpt.part_path(k0, p) for p in owned[i]})
                for i, a in enumerate(actors)])
            start = k0 + 1
        else:
            if warm_labels is not None:
                wfiles = write_label_parts(
                    warm_labels, offsets,
                    os.path.join(workdir, job, "warm"))
                info["warm_parts"] = len(wfiles)
                ray.get([a.load_state.remote(
                    {p: wfiles[p] for p in owned[i] if p in wfiles})
                    for i, a in enumerate(actors)])
            start = 1
        inbox = transpose_refs(scatter_refs_matrix(actors, A))
        pending: Dict[int, Tuple[List, List]] = {}
        converged = False
        t_start = time.time()

        def commit(kk: int) -> int:
            lp_refs, pj_refs = pending.pop(kk)
            lp = int(sum(ray.get(lp_refs)))
            pj = int(sum(ray.get(pj_refs)))
            # wall_sec is CUMULATIVE since loop start (same convention
            # as PageRank's pipelined commit — rounds overlap, so
            # per-round walls are not individually observable)
            metrics = {"iter": kk, "changed": lp + pj, "lp_changed": lp,
                       "pj_changed": pj,
                       "wall_sec": round(time.time() - t_start, 4)}
            ckpt.commit_iter(kk, metrics, list(range(num_parts)))
            info["iters"].append(metrics)
            return lp + pj

        for k in range(start, max_iters + 1):
            reuse_all = ckpt.have_parts(k) if resume else set()
            q_outs = [list(a.apply_and_query.options(num_returns=A + 1)
                           .remote(*inbox[j])) for j, a in enumerate(actors)]
            lp_refs = [o[A] for o in q_outs]
            if pointer_jumping:
                q_inbox = transpose_refs([o[:A] for o in q_outs])
                ans = [list(actors[j].pj_answers.options(num_returns=A)
                            .remote(*q_inbox[j]))
                       if A > 1 else [actors[j].pj_answers.remote(*q_inbox[j])]
                       for j in range(A)]
                a_inbox = transpose_refs(ans)
            else:
                a_inbox = [[] for _ in range(A)]
            s_outs = []
            for j, a in enumerate(actors):
                ck = {p: ckpt.part_path(k, p) for p in owned[j]}
                ru = {p: ckpt.part_path(k, p) for p in owned[j] if p in reuse_all}
                s_outs.append(list(a.pj_apply_and_scatter
                                   .options(num_returns=A + 1)
                                   .remote(k, ck, ru, *a_inbox[j])))
            pj_refs = [o[A] for o in s_outs]
            inbox = transpose_refs([o[:A] for o in s_outs])
            pending[k] = (lp_refs, pj_refs)
            last_k = k
            # trailing convergence check (one round of overlap); the
            # overshoot round is a no-op on converged labels (min/pj are
            # idempotent at fixpoint) and its uncommitted part files are
            # bitwise-identical to the committed round's
            if k - 1 in pending and commit(k - 1) == 0:
                last_k = k - 1
                converged = True
                break
        if not converged and last_k in pending:
            commit(last_k)
        pending.clear()
    finally:
        for a in actors:
            ray.kill(a)

    info["num_iters"] = len(info["iters"])
    info["converged"] = bool(info["iters"] and info["iters"][-1]["changed"] == 0)
    info["final_iter"] = last_k
    return labels_ds(last_k), info
