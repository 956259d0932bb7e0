"""Single/multi-source BFS (shortest hop distances) on the CSR shard
engine.

The frontier-expansion special case of the reference's message-passing
skeleton (modules/sage.py:56-82): unlike CC's min-label rounds (O(E)
work every round), BFS relaxes each edge exactly ONCE over the whole
run — round k touches only the edges leaving the round-(k-1) frontier,
so total work is O(E + V) regardless of diameter.  Frontier neighbor
gathering is the same vectorized indptr-slice (repeat/cumsum) expression
as graph/sampling.py.

One round = one fused actor call (`step`: apply round-k arrivals ->
emit round-(k+1) frontier neighbors routed by owner); the driver
barriers once per round.  Web-graph diameters are small (~10-20), so
rounds are few and cheap; there is deliberately NO per-round checkpoint
— a rerun costs diameter cheap rounds while the expensive artifact (the
CSR shards) is already cached on disk, and checkpointing every round
would roughly double BFS cost (contrast PageRank, whose 30+ heavy
rounds justify the manifest machinery).

Exactness: hop distances are the unique fixpoint of frontier expansion
and involve only set unions — partitioning-independent, certified
against a recursive-CTE SQL oracle (queries_graph.q_bfs_hops) and a
NumPy BFS oracle (tests/test_bfs.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..config import DEFAULT, EngineConfig
from .csr import load_shard
from .engine import part_to_actor_map, plan_actors

_UNSET = np.int64(-1)


@ray.remote(num_cpus=0)
class DistShardActor:
    def __init__(self, actor_idx: int, owned: List[int], paths: Dict[int, str],
                 offsets: np.ndarray, part2actor: np.ndarray, num_actors: int):
        self.idx = actor_idx
        self.owned = owned
        self.off = offsets
        self.p2a = part2actor
        self.num_actors = num_actors
        self.shards = {p: load_shard(paths[p]) for p in owned}
        self.dist = {p: np.full(self.shards[p]["vid_hi"] - self.shards[p]["vid_lo"],
                                _UNSET, dtype=np.int64) for p in owned}

    def _route(self, vids: np.ndarray):
        """Split a sorted-unique vid array by owning actor."""
        part = (np.searchsorted(self.off, vids, side="right") - 1)
        dest = self.p2a[part]
        order = np.argsort(dest, kind="stable")
        v = vids[order]
        b = np.searchsorted(dest[order], np.arange(self.num_actors + 1))
        out = [v[b[j]:b[j + 1]] if b[j + 1] > b[j] else None
               for j in range(self.num_actors)]
        return out

    def _neighbors_of(self, p: int, local: np.ndarray) -> np.ndarray:
        s = self.shards[p]
        indptr, indices = s["indptr"], s["indices"]
        starts, ends = indptr[local], indptr[local + 1]
        cnt = ends - starts
        total = int(cnt.sum())
        if total == 0:
            return np.empty(0, dtype=np.int64)
        csum = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        pos = np.repeat(starts - csum, cnt) + np.arange(total)
        return indices[pos]

    def step(self, k: int, *incoming):
        """Settle round-k arrivals (vids whose dist is still unset get
        dist=k), then emit the round-(k+1) frontier's neighbors routed
        by owner.  Returns num_actors message arrays + settled count."""
        nbr_chunks: List[np.ndarray] = []
        settled = 0
        for p in self.owned:
            lo = self.shards[p]["vid_lo"]
            hi = self.shards[p]["vid_hi"]
            frontier_local: List[np.ndarray] = []
            for msg in incoming:
                if msg is None:
                    continue
                m = (msg >= lo) & (msg < hi)
                if not m.any():
                    continue
                local = msg[m] - lo
                fresh = local[self.dist[p][local] == _UNSET]
                if fresh.size:
                    self.dist[p][fresh] = k
                    frontier_local.append(fresh)
            if frontier_local:
                f = np.concatenate(frontier_local)
                settled += int(f.size)
                nbr_chunks.append(self._neighbors_of(p, f))
        if nbr_chunks:
            nbrs = np.unique(np.concatenate(nbr_chunks))
            msgs = self._route(nbrs)
        else:
            msgs = [None] * self.num_actors
        return (*msgs, settled)

    def result_tables(self):
        out = []
        for p in self.owned:
            lo = self.shards[p]["vid_lo"]
            d = self.dist[p]
            m = d != _UNSET
            vids = np.flatnonzero(m) + lo
            out.append(pa.table({
                "part": pa.array(np.full(vids.size, p, dtype=np.int32)),
                "vid": pa.array(vids.astype(np.int64)),
                "dist": pa.array(d[m]),
            }))
        return out


@ray.remote
def _split_seed_block(tbl: pa.Table, offsets: np.ndarray,
                      p2a: np.ndarray, num_actors: int):
    """One seed block -> per-actor vid arrays (round-0 inbox shards).
    Runs as a task so seed vids NEVER land on the driver — the driver
    holds only the per-(block, actor) ObjectRefs."""
    # empty Ray blocks can carry an EMPTY schema (the repo-wide
    # empty-block gotcha) — treat them as zero seeds
    if tbl.num_rows == 0 or "vid" not in tbl.column_names:
        return (None,) * num_actors if num_actors > 1 else None
    vids = np.unique(tbl.column("vid").to_numpy(zero_copy_only=False)
                     .astype(np.int64))
    N = int(offsets[-1])
    if vids.size and (vids[0] < 0 or vids[-1] >= N):
        raise ValueError(f"sources out of range [0, {N})")
    part = np.searchsorted(offsets, vids, side="right") - 1
    dest = p2a[part]
    order = np.argsort(dest, kind="stable")
    v = vids[order]
    b = np.searchsorted(dest[order], np.arange(num_actors + 1))
    out = tuple(v[b[j]:b[j + 1]] if b[j + 1] > b[j] else None
                for j in range(num_actors))
    return out if num_actors > 1 else out[0]


def bfs(sym_edges, offsets: np.ndarray, workdir: str,
        sources: Optional[np.ndarray] = None,
        cfg: EngineConfig = DEFAULT, *,
        max_iters: Optional[int] = None,
        shards_dir: Optional[str] = None,
        num_actors: int = 0,
        sources_ds=None) -> Tuple["rd.Dataset", Dict]:
    """Hop distances from ``sources`` over a SYMMETRIZED edge table
    (callers: graph.build.symmetrize first; pass the directed table for
    forward-reachability BFS).  Returns (dist_ds(part, vid, dist), info);
    unreachable vertices are absent.

    Seeds come from exactly one of ``sources`` (a driver numpy array —
    the bounded-seed-set path) or ``sources_ds`` (a Dataset with a
    ``vid`` column — the O(#components)-seeds path, e.g. every
    component root of a 10^12-page crawl): seed blocks are split into
    per-actor round-0 messages by Ray tasks, so no seed array is ever
    materialized on the driver and ``info`` records only counts.
    An empty ``sources_ds`` yields an empty result (the array path
    keeps raising — a typed seed set of size 0 is caller error there).
    """
    from .csr import build_csr_shards

    if (sources is None) == (sources_ds is None):
        raise ValueError("pass exactly one of sources / sources_ds")
    N = int(offsets[-1])
    if sources is not None:
        sources = np.unique(np.asarray(sources, dtype=np.int64))
        if sources.size == 0:
            raise ValueError("sources must be non-empty")
        if sources.min() < 0 or sources.max() >= N:
            raise ValueError(f"sources out of range [0, {N})")
    max_iters = (cfg.max_iters if max_iters is None else max_iters)
    num_parts = len(offsets) - 1

    descs = build_csr_shards(sym_edges, offsets, shards_dir or f"{workdir}/csr_sym",
                             lineage={"kind": "sym"})
    paths = {dd["part"]: dd["path"] for dd in descs}

    owned = plan_actors(num_parts, num_actors)
    A = len(owned)
    p2a = part_to_actor_map(owned, num_parts)
    actors = [DistShardActor.remote(i, owned[i], paths, np.asarray(offsets),
                                    p2a, A)
              for i in range(A)]
    info: Dict = {"iters": []}
    if sources is not None:
        info["sources"] = [int(s) for s in sources]
    try:
        # round 0: the sources arrive "from nowhere"
        if sources_ds is not None:
            blocks = [r for r in sources_ds.select_columns(["vid"])
                      .to_arrow_refs()]
            info["n_seed_blocks"] = len(blocks)
            if A > 1:
                split = _split_seed_block.options(num_returns=A)
                srefs = [split.remote(r, np.asarray(offsets), p2a, A)
                         for r in blocks]
                inbox = [[srefs[i][j] for i in range(len(srefs))]
                         for j in range(A)]
            else:  # num_returns=1 returns the value itself (WL gotcha)
                inbox = [[_split_seed_block.remote(
                    r, np.asarray(offsets), p2a, A) for r in blocks]]
            if not blocks:
                inbox = [[None] for _ in range(A)]
        else:
            part = (np.searchsorted(np.asarray(offsets), sources, side="right") - 1)
            inbox = [[sources[p2a[part] == j]] if (p2a[part] == j).any() else [None]
                     for j in range(A)]
            inbox = [[x if x is None or x.size else None for x in row]
                     for row in inbox]
        for k in range(max_iters):
            refs = [actors[j].step.options(num_returns=A + 1).remote(
                k, *inbox[j]) for j in range(A)]
            # refs[j] = A message refs + 1 settled ref
            settled = sum(ray.get([r[A] for r in refs]))
            info["iters"].append({"iter": k, "settled": int(settled)})
            if settled == 0:
                break
            inbox = [[refs[i][j] for i in range(A)] for j in range(A)]
            # resolve refs to arrays lazily inside the actor call (Ray
            # resolves ObjectRef args automatically)
        tables = [t for ref in [a.result_tables.remote() for a in actors]
                  for t in ray.get(ref)]
    finally:
        for a in actors:
            ray.kill(a)
    tables = [t for t in tables if t.num_rows] or [pa.schema(
        [pa.field("part", pa.int32()), pa.field("vid", pa.int64()),
         pa.field("dist", pa.int64())]).empty_table()]
    info["num_iters"] = len(info["iters"])
    info["reached"] = int(sum(t.num_rows for t in tables))
    return rd.from_arrow(tables), info


def double_sweep_diameter(sym_edges, offsets: np.ndarray, workdir: str,
                          cfg: EngineConfig = DEFAULT, *,
                          start: int = 0, sweeps: int = 2,
                          shards_dir: Optional[str] = None) -> Dict:
    """Double-sweep diameter LOWER BOUND of the component containing
    ``start`` (classic BFS heuristic: eccentricity from the farthest
    vertex of the previous sweep; exact on trees, empirically tight on
    web-ish graphs).  Deterministic: the next sweep's source is the
    MIN-VID vertex among those at maximum distance.

    Each sweep is one frontier BFS over the shared csr_sym shard cache;
    the per-sweep argmax is a per-batch partial (vid, dist) peak reduced
    over <= num_blocks rows on the driver — the distance table itself is
    never materialized.

    Returns {"diameter_lb", "sweeps": [{source, ecc_lb, peak_vid,
    reached}, ...]}.
    """
    import pyarrow as pa

    src = int(start)
    lb = 0
    out: Dict = {"sweeps": []}
    for _ in range(max(1, sweeps)):
        dist_ds, binfo = bfs(sym_edges, offsets, workdir,
                             np.array([src], dtype=np.int64), cfg,
                             shards_dir=shards_dir)

        def peak(b: pa.Table) -> pa.Table:
            d = b.column("dist").to_numpy()
            if len(d) == 0:
                return pa.table({"vid": pa.array([], type=pa.int64()),
                                 "dist": pa.array([], type=pa.int64())})
            m = int(d.max())
            v = b.column("vid").to_numpy()[d == m]
            return pa.table({"vid": pa.array([int(v.min())], type=pa.int64()),
                             "dist": pa.array([m], type=pa.int64())})

        peaks = dist_ds.map_batches(peak, batch_format="pyarrow",
                                    zero_copy_batch=True).to_pandas()
        ecc = int(peaks["dist"].max())
        peak_vid = int(peaks.loc[peaks["dist"] == ecc, "vid"].min())
        out["sweeps"].append({"source": src, "ecc_lb": ecc,
                              "peak_vid": peak_vid,
                              "reached": binfo["reached"]})
        lb = max(lb, ecc)
        if peak_vid == src and ecc == 0:
            break  # isolated vertex
        src = peak_vid
    out["diameter_lb"] = lb
    return out
