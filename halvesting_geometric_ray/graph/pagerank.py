"""PageRank as iterative gather-scatter rounds over CSR shard actors.

Semantic anchor: the reference's GNN message-passing loop — rounds of
gather-from-neighbors / aggregate / update over edge_index
(reference halvesting_geometric/modules/sage.py:56-82) — of which
PageRank is the deterministic special case:

    r' = (1-d)/N + d * (sum_in r_u / outdeg_u + dangling_mass / N)
    iterate until  ||r' - r||_1 < tol

Execution model (see graph/engine.py): a pool of shard actors, each
pinning its partitions' CSR shards and rank vectors across rounds.  A
round is ONE actor call (`step` = apply incoming contributions, then
emit the next round's per-destination partial sums) with
``num_returns=A+1`` — each destination actor pulls only its slice, and
the metrics object carries (L1 partial, next dangling-mass partial).
The dangling mass flows between rounds as an ObjectRef reduced by a
tiny remote task, so the driver never blocks inside a round: rounds are
submitted pipelined, with the convergence check trailing one round
behind (the overshoot round is discarded, so results and iteration
counts are identical to sequential execution).

Per-shard contributions are pre-aggregated by UNIQUE destination via
the shard's (udsts, uinv) factorization — one bincount per shard, so
exchange volume is bounded by unique dsts, not E.  All reductions are
order-free float64 sums: results are reproducible under any
partitioning to ~1e-12 noise — compared to the NumPy oracle with
allclose(atol=1e-6) per BASELINE.md.

Checkpoint/resume: every iteration persists per-partition (rank, delta)
parquet with a lineage manifest (state/checkpoint.py); a torn in-flight
iteration's partition files are ADOPTED on resume (compute + write
skipped for those partitions) — mid-iteration resume per the north rule.
Set checkpoint_interval > 1 to trade durability granularity for write
volume on throughput-critical runs.
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
from .engine import (drain_refs, part_to_actor_map, plan_actors,
                     scatter_refs_matrix, transpose_refs)


def _write_ranks_by_part(ranks, offsets: np.ndarray, out_dir: str):
    """Split a (vid, rank) Dataset/Table into one parquet per owning
    partition (atomic rename).  Returns {part: path} for the parts that
    received rows; parts with no rows keep the caller's default init."""
    import os

    from ..ops._util import pre_shuffle
    from ..ops.ids import owner_of

    os.makedirs(out_dir, exist_ok=True)
    if isinstance(ranks, pa.Table):
        ranks = rd.from_arrow(ranks)

    def add_part(b: pa.Table) -> pa.Table:
        vid = b.column("vid").to_numpy()
        part = owner_of(vid, np.asarray(offsets))
        return pa.table({"vid": b.column("vid").cast(pa.int64()),
                         "rank": b.column("rank").cast(pa.float64()),
                         "__wpart": pa.array(part.astype(np.int32))})

    def write_part(g: pa.Table) -> pa.Table:
        pt = int(g.column("__wpart")[0].as_py())
        path = os.path.join(out_dir, f"part{pt}.parquet")
        tmp = path + ".tmp"
        pq.write_table(g.drop_columns(["__wpart"]), tmp)
        os.replace(tmp, path)
        return pa.table({"part": pa.array([pt], type=pa.int32()),
                         "path": pa.array([path])})

    prepped = ranks.select_columns(["vid", "rank"]).map_batches(
        add_part, batch_format="pyarrow", zero_copy_batch=True)
    rows = (pre_shuffle(prepped).groupby("__wpart")
            .map_groups(write_part, batch_format="pyarrow",
                        retry_exceptions=True).to_pandas())
    return {int(r.part): r.path for r in rows.itertuples()}


@ray.remote(num_cpus=0)
def _dm_reduce(*metrics) -> float:
    """Next-round dangling mass from the step metrics (actor order —
    deterministic float accumulation)."""
    return float(sum(m[1] for m in metrics))


@ray.remote(num_cpus=0)
class RankShardActor:
    """Owns a set of partitions: their CSR shards + rank vectors.

    num_cpus=0: rounds are short numpy bursts coordinated by the driver;
    reserving whole CPUs would starve any concurrent Dataset stages (on
    a real cluster, use .options(scheduling_strategy="SPREAD"))."""

    def __init__(self, actor_idx: int, owned: List[int], paths: Dict[int, str],
                 offsets: np.ndarray, part2actor: np.ndarray, num_actors: int,
                 n_vertices: int, damping: float, seed_ref=None):
        self.idx = actor_idx
        self.owned = owned
        self.off = offsets
        self.num_actors = num_actors
        self.N = n_vertices
        self.d = damping
        # restart distribution r0: uniform 1/N (classic PageRank) or
        # uniform over a seed vid set (PERSONALIZED PageRank) — the
        # update below is the same formula either way.  seed_ref is a
        # ray.put ObjectRef at the call site; Ray resolves task/actor
        # arguments, so it arrives here as the array itself.
        seeds = seed_ref
        self.shards: Dict[int, Dict] = {}
        self.r: Dict[int, np.ndarray] = {}
        self.r0: Dict[int, np.ndarray] = {}
        for p in owned:
            s = dict(load_shard(paths[p]))
            # routing: group unique dsts by destination actor, once
            dest = part2actor[s["udst_part"]]
            order = np.argsort(dest, kind="stable")
            s["route_order"] = order
            s["route_udsts"] = s["udsts"][order]
            s["route_bounds"] = np.searchsorted(dest[order],
                                                np.arange(num_actors + 1))
            self.shards[p] = s
            lo, hi = s["vid_lo"], s["vid_hi"]
            size = hi - lo
            if seeds is None:
                r0 = np.full(size, 1.0 / n_vertices, dtype=np.float64)
            else:
                r0 = np.zeros(size, dtype=np.float64)
                mine = seeds[(seeds >= lo) & (seeds < hi)]
                r0[mine - lo] = 1.0 / len(seeds)
            self.r0[p] = r0
            self.r[p] = r0.copy()
        self.r_prev: Dict[int, np.ndarray] = dict(self.r)

    def load_state(self, files: Dict[int, str],
                   fill: float = 0.0) -> bool:
        """Adopt per-part (vid, rank) parquet.  fill=0 is checkpoint
        resume (every vid present); a WARM START from an older/smaller
        graph's ranks passes fill=1/N so vids absent from the file
        (e.g. vertices added by extend_graph) start at the uniform mass
        instead of zero — the fixpoint is init-independent, warm init
        only buys iterations."""
        for p, path in files.items():
            t = pq.read_table(path, columns=["vid", "rank"])
            vid = t.column("vid").to_numpy()
            rank = t.column("rank").to_numpy()
            lo = self.shards[p]["vid_lo"]
            r = np.full_like(self.r[p], fill)
            r[vid - lo] = rank
            self.r[p] = r
        return True

    def rank_sum(self) -> float:
        return float(sum(self.r[p].sum() for p in self.owned))

    def scale_ranks(self, f: float) -> bool:
        for p in self.owned:
            self.r[p] *= f
        return True

    def dangling(self) -> float:
        dm = 0.0
        for p in self.owned:
            dm += float(self.r[p][self.shards[p]["outdeg"] == 0].sum())
        return dm

    def _scatter_msgs(self):
        """Per-destination-actor (vids, partial_sums) from current state.

        Two-level combiner: bincount by unique dst within each shard,
        then re-aggregate ACROSS this actor's shards per destination —
        without the second level a popular dst is shipped once per
        shard, and measured exchange volume approached E per round
        (object-store memcpy became the non-scaling bottleneck).  The
        extra per-actor sort is CPU work that parallelizes with the
        pool, the transfer it saves does not."""
        per_dest_v: List[List[np.ndarray]] = [[] for _ in range(self.num_actors)]
        per_dest_s: List[List[np.ndarray]] = [[] for _ in range(self.num_actors)]
        for p in self.owned:
            s = self.shards[p]
            if s["indices"].size == 0:
                continue
            outdeg = s["outdeg"]
            w = s.get("weights")
            if w is None:
                src_r = np.where(outdeg > 0,
                                 self.r[p] / np.maximum(outdeg, 1), 0.0)
                per_edge = np.repeat(src_r, outdeg)
            else:
                # WEIGHTED scatter: edge (u, v, w) carries
                # r_u * w / wout_u — out-mass split proportional to
                # edge weight instead of uniformly over out-neighbors
                src_r = np.where(outdeg > 0,
                                 self.r[p] / np.where(s["wout"] > 0,
                                                      s["wout"], 1.0), 0.0)
                per_edge = np.repeat(src_r, outdeg) * w
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
        """Bootstrap: messages from the current state (round start)."""
        out = self._scatter_msgs()
        return tuple(out) if self.num_actors > 1 else out[0]

    def step(self, k: int, dm: float, ckpt_paths: Dict[int, str],
             reuse: Dict[int, str], *incoming):
        """One full round: apply round-k contributions, checkpoint, then
        emit round-(k+1) messages.  Returns A message objects + 1 metrics
        object (l1_partial, dm_next_partial).  `reuse` maps part -> an
        existing checkpoint file of THIS iteration to adopt instead of
        recomputing (mid-iteration resume)."""
        # snapshot the pre-update state: with pipelined rounds the driver
        # may detect convergence at k-1 AFTER submitting step(k); the
        # durable finalize then needs state_{k-1}, not the overshoot's.
        self.r_prev = dict(self.r)
        l1 = 0.0
        dm_next = 0.0
        contrib: Dict[int, np.ndarray] = {
            p: np.zeros_like(self.r[p]) for p in self.owned}
        for msg in incoming:
            if msg is None:
                continue
            vids, vals = msg
            for p in self.owned:
                lo, hi = self.shards[p]["vid_lo"], self.shards[p]["vid_hi"]
                m = (vids >= lo) & (vids < hi)
                if m.any():
                    np.add.at(contrib[p], vids[m] - lo, vals[m])
        for p in self.owned:
            s = self.shards[p]
            lo, hi = s["vid_lo"], s["vid_hi"]
            if p in reuse:
                t = pq.read_table(reuse[p], columns=["vid", "rank", "delta"])
                new = np.zeros(hi - lo)
                new[t.column("vid").to_numpy() - lo] = t.column("rank").to_numpy()
                l1 += float(t.column("delta").to_numpy().sum())
            else:
                new = (1.0 - self.d) * self.r0[p] + \
                    self.d * (contrib[p] + dm * self.r0[p])
                delta = np.abs(new - self.r[p])
                l1 += float(delta.sum())
                if ckpt_paths and p in ckpt_paths:
                    out = pa.table({
                        "part": pa.array(np.full(hi - lo, p, dtype=np.int32)),
                        "vid": pa.array(np.arange(lo, hi, dtype=np.int64)),
                        "rank": pa.array(new),
                        "outdeg": pa.array(s["outdeg"].astype(np.int64)),
                        "delta": pa.array(delta),
                    })
                    IterativeCheckpoint.write_part(out, ckpt_paths[p])
            self.r[p] = new
            dm_next += float(new[s["outdeg"] == 0].sum())
        msgs = self._scatter_msgs()
        return (*msgs, (l1, dm_next))

    def write_state(self, ckpt_paths: Dict[int, str],
                    use_prev: bool = False) -> bool:
        """Persist current (or pre-overshoot) state — used when
        checkpoint_interval > 1 skipped the converged iteration's write."""
        src = self.r_prev if use_prev else self.r
        for p, path in ckpt_paths.items():
            s = self.shards[p]
            lo, hi = s["vid_lo"], s["vid_hi"]
            out = pa.table({
                "part": pa.array(np.full(hi - lo, p, dtype=np.int32)),
                "vid": pa.array(np.arange(lo, hi, dtype=np.int64)),
                "rank": pa.array(src[p]),
                "outdeg": pa.array(s["outdeg"].astype(np.int64)),
                "delta": pa.array(np.zeros(hi - lo)),
            })
            IterativeCheckpoint.write_part(out, path)
        return True


def pagerank(edges, offsets: np.ndarray, workdir: str,
             cfg: EngineConfig = DEFAULT, *,
             damping: Optional[float] = None, tol: Optional[float] = None,
             max_iters: Optional[int] = None, job: str = "pagerank",
             resume: bool = True, lineage: Optional[Dict] = None,
             shards_dir: Optional[str] = None,
             num_actors: int = 0,
             checkpoint_interval: int = 1,
             seeds: Optional[np.ndarray] = None,
             weight_col: Optional[str] = None,
             warm_ranks=None) -> Tuple["rd.Dataset", Dict]:
    """Run PageRank over the edge table.  Returns (ranks_ds, info):
    ranks_ds has columns (part, vid, rank); info carries per-iteration
    metrics (l1, dangling mass, wall) and resume provenance.

    `seeds`: vid array -> PERSONALIZED PageRank (teleport + dangling
    mass go uniformly to the seed set instead of all vertices); the
    checkpoint lineage includes a seed fingerprint so classic and
    personalized runs never adopt each other's state.

    `warm_ranks`: Dataset/Table with (vid, rank) -> WARM START: the
    iteration begins from those ranks instead of uniform (vids absent
    from it start at 1/N), converging to the same fixpoint in fewer
    rounds — the incremental-update path after graph.incremental.
    extend_graph (old vids keep their converged rank).  Ignored when a
    resumable checkpoint exists for this job (resume wins).

    `weight_col`: edges column of POSITIVE edge weights -> WEIGHTED
    PageRank (out-mass split w_uv / sum_x w_ux instead of 1/outdeg;
    duplicate (src, dst) pairs sum their weights in the shard build, so
    anchor multiplicity can be fed directly).  Weighted runs use their
    own default shard dir ({workdir}/csr_w) and a distinct lineage so
    they never share the unweighted CSR cache."""
    from .csr import build_csr_shards

    d = cfg.damping if damping is None else damping
    tol = cfg.pagerank_tol if tol is None else tol
    max_iters = cfg.max_iters if max_iters is None else max_iters
    N = int(offsets[-1])
    num_parts = len(offsets) - 1
    if N == 0:
        import pandas as _pd

        return rd.from_pandas(_pd.DataFrame(
            {"part": _pd.Series([], dtype="int32"),
             "vid": _pd.Series([], dtype="int64"),
             "rank": _pd.Series([], dtype="float64")})), \
            {"resumed_from": None, "iters": [], "num_iters": 0,
             "converged": True, "final_iter": 0}

    # Same lineage stamp as hits() — both consume the directed CSR, so
    # alternating pagerank/hits on one workdir reuses one shard cache
    # instead of rebuilding it every run (ADVICE r2).
    if weight_col is None:
        descs = build_csr_shards(edges, offsets, shards_dir or f"{workdir}/csr",
                                 lineage={"kind": "directed"})
    else:
        descs = build_csr_shards(edges, offsets,
                                 shards_dir or f"{workdir}/csr_w",
                                 lineage={"kind": "directed-weighted"},
                                 weight_col=weight_col)
    paths = {dd["part"]: dd["path"] for dd in descs}

    seed_fp = None
    if seeds is not None:
        seeds = np.unique(np.asarray(seeds, dtype=np.int64))
        if seeds.size == 0:
            raise ValueError("seeds must be non-empty")
        if seeds[0] < 0 or seeds[-1] >= N:
            raise ValueError(
                f"seed vids must be in [0, {N}); got min={seeds[0]} "
                f"max={seeds[-1]}")
        seed_fp = [int(seeds.size), int(seeds.min()), int(seeds.max()),
                   int(seeds.sum() % (1 << 61))]
    default_lineage = {"algo": "pagerank", "n": N, "parts": num_parts,
                       "d": d, "tol": tol, "seeds": seed_fp}
    if weight_col is not None:
        default_lineage["weight_col"] = weight_col
    ckpt = IterativeCheckpoint(workdir, job, lineage or default_lineage)

    def ranks_ds(k: int):
        return (rd.read_parquet(ckpt.state_files(k))
                .select_columns(["part", "vid", "rank"]))

    k0 = ckpt.latest_complete() if resume else None
    info: Dict = {"resumed_from": k0,
                  "iters": list(ckpt.metrics_history()) if k0 else []}
    if k0 is not None and info["iters"] and info["iters"][-1]["l1"] < tol:
        info["num_iters"] = len(info["iters"])
        info["converged"] = True
        return ranks_ds(k0), info

    owned = plan_actors(num_parts, num_actors)
    A = len(owned)
    p2a = part_to_actor_map(owned, num_parts)
    seed_ref = None if seeds is None else ray.put(seeds)
    actors = [RankShardActor.remote(i, owned[i], paths, offsets, p2a, A, N, d,
                                    seed_ref)
              for i in range(A)]
    final_k = k0 or 0
    dm_ref = None
    try:
        if k0 is not None:
            ray.get([a.load_state.remote(
                {p: ckpt.part_path(k0, p) for p in owned[i]})
                for i, a in enumerate(actors)])
            start = k0 + 1
        else:
            if warm_ranks is not None:
                wfiles = _write_ranks_by_part(
                    warm_ranks, offsets,
                    os.path.join(workdir, f"{job}_warm"))
                ray.get([a.load_state.remote(
                    {p: wfiles[p] for p in owned[i] if p in wfiles},
                    1.0 / N) for i, a in enumerate(actors)])
                # normalize the warm init to total mass exactly 1 —
                # excess mass decays only as d^k, so an unnormalized
                # start converges to ranks whose sum is off by
                # ~tol * excess
                total = sum(ray.get([a.rank_sum.remote() for a in actors]))
                if total > 0:
                    ray.get([a.scale_ranks.remote(1.0 / total)
                             for a in actors])
                info["warm_start"] = True
            start = 1
        dm_ref = ray.put(sum(ray.get([a.dangling.remote() for a in actors])))
        inbox = transpose_refs(scatter_refs_matrix(actors, A))

        pending: Dict[int, Tuple[List, float]] = {}
        converged = False
        overshoot = False  # actors ran one round past final_k

        def commit(kk: int) -> float:
            ms = ray.get(pending.pop(kk)[0])
            l1 = float(sum(m[0] for m in ms))
            dm_val = float(sum(m[1] for m in ms))
            metrics = {"iter": kk, "l1": l1, "dangling_mass": dm_val,
                       "wall_sec": round(time.time() - t_start, 4)}
            # Only commit when the part files were actually written this
            # round (do_ckpt).  Committing a converged-but-unwritten iter
            # would leave the manifest ahead of the files across a crash;
            # the finalize block below writes state FIRST, then commits.
            if kk % checkpoint_interval == 0:
                ckpt.commit_iter(kk, metrics, list(range(num_parts)))
            info["iters"].append(metrics)
            return l1

        t_start = time.time()
        for k in range(start, max_iters + 1):
            reuse_all = ckpt.have_parts(k) if resume else set()
            do_ckpt = (k % checkpoint_interval == 0)
            outs = []
            for j, a in enumerate(actors):
                ck = {p: ckpt.part_path(k, p) for p in owned[j]} if do_ckpt else {}
                ru = {p: ckpt.part_path(k, p) for p in owned[j]
                      if p in reuse_all}
                o = a.step.options(num_returns=A + 1).remote(
                    k, dm_ref, ck, ru, *inbox[j])
                outs.append(list(o))
            inbox = transpose_refs([o[:A] for o in outs])
            metric_refs = [o[A] for o in outs]
            dm_ref = _dm_reduce.remote(*metric_refs)
            pending[k] = (metric_refs, time.time())
            final_k = k
            # trailing convergence check (one round of overlap)
            if k - 1 in pending:
                if commit(k - 1) < tol:
                    final_k = k - 1
                    converged = True
                    overshoot = True  # step(k) was already submitted
                    break
        if not converged and final_k in pending:
            l1 = commit(final_k)
            converged = l1 < tol
        # discard the overshoot round's refs, if any
        pending.clear()
        # ensure the final state is durably checkpointed even when
        # checkpoint_interval skipped it
        if str(final_k) not in ckpt.manifest["iters"] or \
                not ckpt.have_parts(final_k):
            ray.get([a.write_state.remote(
                {p: ckpt.part_path(final_k, p) for p in owned[i]},
                use_prev=overshoot)
                for i, a in enumerate(actors)])
            last = info["iters"][-1] if info["iters"] else {"iter": final_k}
            ckpt.commit_iter(final_k, last, list(range(num_parts)))
    finally:
        drain_refs(dm_ref)  # overshoot-round reduce: consume, then kill
        for a in actors:
            ray.kill(a)

    info["num_iters"] = len(info["iters"])
    info["converged"] = bool(info["iters"] and info["iters"][-1]["l1"] < tol)
    info["final_iter"] = final_k
    return ranks_ds(final_k), info
