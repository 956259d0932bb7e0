"""Community label propagation — the mode-aggregate variant of the CC
skeleton (SURVEY.md section 2.8).

Synchronous rounds over the symmetrized self-loop-free graph:
    new_label(v) = most frequent label among neighbors of v,
                   ties -> smallest label; isolated vertices keep theirs.
Deterministic by construction (count-then-min tie break), fixed round
count (community LP has no natural fixpoint guarantee).

Scatter pre-aggregates (dst, label) pair COUNTS inside each shard (the
combiner), so exchange volume is bounded by distinct (dst, label) pairs
per shard, not E.  Same actor-pool engine and per-iteration
per-partition checkpoint manifest as PageRank/CC.
"""

from __future__ import annotations

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


def _agg_pairs(vids: np.ndarray, labels: np.ndarray, counts: np.ndarray):
    """Sum counts per (vid, label) pair; returns unique sorted triples."""
    order = np.lexsort((labels, vids))
    v, l, c = vids[order], labels[order], counts[order]
    new_run = np.r_[True, (v[1:] != v[:-1]) | (l[1:] != l[:-1])]
    starts = np.flatnonzero(new_run)
    sums = np.add.reduceat(c, starts)
    return v[starts], l[starts], sums


@ray.remote(num_cpus=0)
class ModeLabelActor:
    def __init__(self, actor_idx: int, owned: List[int], paths: Dict[int, str],
                 offsets: np.ndarray, part2actor: np.ndarray, num_actors: int):
        self.owned = owned
        self.off = offsets
        self.p2a = part2actor
        self.num_actors = num_actors
        self.shards: Dict[int, Dict] = {}
        self.labels: Dict[int, np.ndarray] = {}
        for p in owned:
            self.shards[p] = load_shard(paths[p])
            s = self.shards[p]
            self.labels[p] = np.arange(s["vid_lo"], s["vid_hi"], dtype=np.int64)

    def load_state(self, files: Dict[int, str]) -> bool:
        for p, path in files.items():
            t = pq.read_table(path, columns=["vid", "label"])
            lo = self.shards[p]["vid_lo"]
            lab = self.labels[p].copy()
            lab[t.column("vid").to_numpy() - lo] = t.column("label").to_numpy()
            self.labels[p] = lab
        return True

    def scatter(self):
        per: List[List[Tuple]] = [[] for _ in range(self.num_actors)]
        for p in self.owned:
            s = self.shards[p]
            if s["indices"].size == 0:
                continue
            e_lab = np.repeat(self.labels[p], s["outdeg"])
            v, l, c = _agg_pairs(s["indices"], e_lab,
                                 np.ones(len(e_lab), dtype=np.int64))
            dest = self.p2a[np.searchsorted(self.off, v, side="right") - 1]
            order = np.argsort(dest, kind="stable")
            v, l, c, dest = v[order], l[order], c[order], dest[order]
            b = np.searchsorted(dest, np.arange(self.num_actors + 1))
            for j in range(self.num_actors):
                if b[j + 1] > b[j]:
                    per[j].append((v[b[j]:b[j + 1]], l[b[j]:b[j + 1]],
                                   c[b[j]:b[j + 1]]))
        out = []
        for j in range(self.num_actors):
            if per[j]:
                out.append(tuple(np.concatenate([t[i] for t in per[j]])
                                 for i in range(3)))
            else:
                out.append(None)
        return tuple(out) if self.num_actors > 1 else out[0]

    def gather_and_scatter(self, k: int, ckpt_paths: Dict[int, str],
                           reuse: Dict[int, str], *incoming):
        """Fused pipelined round: apply round-k mode-label messages +
        checkpoint, then emit round-(k+1) scatter messages (PageRank's
        single-call step pattern — no driver barrier inside a round)."""
        changed = self.gather(k, ckpt_paths, reuse, *incoming)
        s = self.scatter()
        msgs = list(s) if self.num_actors > 1 else [s]
        return (*msgs, changed)

    def gather(self, k: int, ckpt_paths: Dict[int, str],
               reuse: Dict[int, str], *incoming) -> int:
        msgs = [m for m in incoming if m is not None]
        changed = 0
        if msgs:
            v = np.concatenate([m[0] for m in msgs])
            l = np.concatenate([m[1] for m in msgs])
            c = np.concatenate([m[2] for m in msgs])
            v, l, c = _agg_pairs(v, l, c)
            # winner per vid: max count, tie -> smallest label
            order = np.lexsort((l, -c, v))
            v, l = v[order], l[order]
            first = np.r_[True, v[1:] != v[:-1]]
            win_v, win_l = v[first], l[first]
        else:
            win_v = np.empty(0, dtype=np.int64)
            win_l = np.empty(0, dtype=np.int64)
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
            new = self.labels[p].copy()
            m = (win_v >= lo) & (win_v < hi)
            new[win_v[m] - lo] = win_l[m]
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


def label_propagation(sym_edges, offsets: np.ndarray, workdir: str,
                      cfg: EngineConfig = DEFAULT, *, rounds: int = 5,
                      job: str = "labelprop", resume: bool = True,
                      shards_dir: Optional[str] = None,
                      num_actors: int = 0) -> Tuple["rd.Dataset", Dict]:
    """Fixed-round community label propagation over a symmetrized
    self-loop-free edge table.  Returns (labels_ds(part, vid, label), info)."""
    from .csr import build_csr_shards

    N = int(offsets[-1])
    num_parts = len(offsets) - 1
    # NOTE: distinct default dir from connected_components' csr_sym —
    # LP runs on the self-loop-free symmetrization, CC keeps self-loops;
    # sharing one shard cache would poison whichever runs second.
    descs = build_csr_shards(sym_edges, offsets,
                             shards_dir or f"{workdir}/csr_sym_simple",
                             lineage={"kind": "sym_noselfloop"})
    paths = {dd["part"]: dd["path"] for dd in descs}
    ckpt = IterativeCheckpoint(
        workdir, job, {"algo": "labelprop", "n": N, "parts": num_parts,
                       "rounds": rounds})

    def labels_ds(k: int):
        return (rd.read_parquet(ckpt.state_files(k))
                .select_columns(["part", "vid", "label"]))

    k0 = ckpt.latest_complete() if resume else None
    info: Dict = {"resumed_from": k0,
                  "iters": list(ckpt.metrics_history()) if k0 else []}
    if k0 is not None and k0 >= rounds:
        info["num_iters"] = len(info["iters"])
        return labels_ds(rounds), info

    owned = plan_actors(num_parts, num_actors)
    A = len(owned)
    p2a = part_to_actor_map(owned, num_parts)
    actors = [ModeLabelActor.remote(i, owned[i], paths, offsets, p2a, A)
              for i in range(A)]
    last_k = k0 or 0
    try:
        if k0 is not None:
            ray.get([a.load_state.remote(
                {p: ckpt.part_path(k0, p) for p in owned[i]})
                for i, a in enumerate(actors)])
            start = k0 + 1
        else:
            start = 1
        inbox = transpose_refs(scatter_refs_matrix(actors, A))
        pending: Dict[int, List] = {}
        t_start = time.time()

        def commit(kk: int) -> None:
            changed = int(sum(ray.get(pending.pop(kk))))
            # wall_sec cumulative since loop start (pipelined rounds)
            metrics = {"iter": kk, "changed": changed,
                       "wall_sec": round(time.time() - t_start, 4)}
            ckpt.commit_iter(kk, metrics, list(range(num_parts)))
            info["iters"].append(metrics)

        for k in range(start, rounds + 1):
            reuse_all = ckpt.have_parts(k) if resume else set()
            outs = []
            for j, a in enumerate(actors):
                ck = {p: ckpt.part_path(k, p) for p in owned[j]}
                ru = {p: ckpt.part_path(k, p) for p in owned[j] if p in reuse_all}
                outs.append(list(a.gather_and_scatter
                                 .options(num_returns=A + 1)
                                 .remote(k, ck, ru, *inbox[j])))
            inbox = transpose_refs([o[:A] for o in outs])
            pending[k] = [o[A] for o in outs]
            last_k = k
            if k - 1 in pending:
                commit(k - 1)
        if last_k in pending:
            commit(last_k)
    finally:
        for a in actors:
            ray.kill(a)

    info["num_iters"] = len(info["iters"])
    return labels_ds(last_k), info
