"""Iterative feature propagation over the CSR shard-actor engine.

The deterministic analogue of the reference's GraphSAGE message passing
(modeling_link_prediction.py:115-143 SAGEConv layers aggregate neighbor
features per hop): k rounds of neighbor aggregation over a (V, d)
feature table, without the learned transform.

Two published aggregation modes:

- ``agg="mean"`` — in-neighbor mean, the SAGE-mean aggregator
  (Hamilton et al. 2017):  H'[v] = (1-alpha) * sum_{u->v} H[u] /
  indeg(v)  +  alpha * H0[v]   (indeg 0 -> aggregate 0).
- ``agg="rw"`` — random-walk normalization, the APPNP / personalized-
  PageRank diffusion (Klicpera et al. 2019; alpha=0, k rounds = SGC's
  S^k X, Wu et al. 2019):  H'[v] = (1-alpha) * sum_{u->v} H[u] /
  outdeg(u)  +  alpha * H0[v].

Composes with functions/linear.py::logreg_train for SGC-style node
classification and with the ANN/kNN suite for structure-aware
similarity — the full "propagate then fit a linear head" recipe.

Scale shape: identical to PageRank's (graph/pagerank.py): actors pin
CSR shards + the (V_p, d) feature state across rounds; a round is one
scatter (two-level per-destination combiner, now over d-wide rows) ->
object-store exchange -> apply.  Per-round exchange volume is
O(unique (shard, dst) pairs x d), never O(E x d).  Feature input
arrives as per-partition parquet (one grouped write), so no driver
materialization at any size.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..config import DEFAULT, EngineConfig
from .csr import load_shard
from .engine import part_to_actor_map, plan_actors, transpose_refs


def _write_features_by_part(features, offsets: np.ndarray, out_dir: str,
                            col: str):
    """Split a (vid, <col>) Dataset into one parquet per owning
    partition (atomic rename; the _write_ranks_by_part shape for a
    list-valued column).  Returns {part: path}."""
    from ..ops._util import pre_shuffle
    from ..ops.ids import owner_of

    os.makedirs(out_dir, exist_ok=True)

    def add_part(b: pa.Table) -> pa.Table:
        vid = b.column("vid").to_numpy()
        part = owner_of(vid, np.asarray(offsets))
        return pa.table({"vid": b.column("vid").cast(pa.int64()),
                         "feat": b.column(col),
                         "__wpart": pa.array(part.astype(np.int32))})

    def write_part(g: pa.Table) -> pa.Table:
        pt = int(g.column("__wpart")[0].as_py())
        path = os.path.join(out_dir, f"part{pt}.parquet")
        tmp = path + ".tmp"
        pq.write_table(g.drop_columns(["__wpart"]), tmp)
        os.replace(tmp, path)
        return pa.table({"part": pa.array([pt], type=pa.int32()),
                         "path": pa.array([path])})

    prepped = features.map_batches(add_part, batch_format="pyarrow",
                                   zero_copy_batch=True)
    rows = (pre_shuffle(prepped).groupby("__wpart")
            .map_groups(write_part, batch_format="pyarrow",
                        retry_exceptions=True).to_pandas())
    return {int(r.part): r.path for r in rows.itertuples()}


def _feat_matrix(t: pa.Table, size: int, lo: int, dim: int) -> np.ndarray:
    """(vid, feat) table -> dense (size, dim) float64; absent vids are
    zero rows (the standard missing-feature convention)."""
    H = np.zeros((size, dim), dtype=np.float64)
    if t.num_rows:
        vid = t.column("vid").to_numpy()
        f = t.column("feat")
        if pa.types.is_fixed_size_list(f.type) or pa.types.is_list(f.type):
            arr = f.combine_chunks()
            if pa.types.is_list(arr.type):
                arr = pa.FixedSizeListArray.from_arrays(
                    arr.flatten().cast(pa.float64()), dim)
            mat = np.asarray(arr.flatten().to_numpy(
                zero_copy_only=False), dtype=np.float64).reshape(-1, dim)
        else:
            mat = f.to_numpy().astype(np.float64).reshape(-1, 1)
        H[vid - lo] = mat
    return H


@ray.remote(num_cpus=0)
class FeatureShardActor:
    """Owns partitions: CSR shards + (V_p, d) feature state across
    rounds (num_cpus=0 for the same reason as RankShardActor)."""

    def __init__(self, actor_idx: int, owned: List[int],
                 paths: Dict[int, str], offsets: np.ndarray,
                 part2actor: np.ndarray, num_actors: int,
                 feat_files: Optional[Dict[int, str]], dim: int,
                 alpha: float, agg: str):
        self.idx = actor_idx
        self.owned = owned
        self.off = offsets
        self.num_actors = num_actors
        self.dim = dim
        self.alpha = alpha
        self.agg = agg
        self.shards: Dict[int, Dict] = {}
        self.H: Dict[int, np.ndarray] = {}
        self.H0: Dict[int, np.ndarray] = {}
        self.indeg: Dict[int, np.ndarray] = {}
        for p in owned:
            s = dict(load_shard(paths[p]))
            dest = part2actor[s["udst_part"]]
            order = np.argsort(dest, kind="stable")
            s["route_order"] = order
            s["route_udsts"] = s["udsts"][order]
            s["route_bounds"] = np.searchsorted(dest[order],
                                                np.arange(num_actors + 1))
            # per-edge -> per-unique-dst reduction plan (static):
            # sort edges by their udst group once, reduceat per round
            agg_order = np.argsort(s["uinv"], kind="stable")
            s["agg_order"] = agg_order
            s["agg_bounds"] = np.searchsorted(
                s["uinv"][agg_order], np.arange(len(s["udsts"])))
            self.shards[p] = s
            lo, hi = s["vid_lo"], s["vid_hi"]
            if feat_files and p in feat_files:
                t = pq.read_table(feat_files[p], columns=["vid", "feat"])
            else:
                t = pa.table({"vid": pa.array([], type=pa.int64()),
                              "feat": pa.array([], type=pa.float64())})
            self.H0[p] = _feat_matrix(t, hi - lo, lo, dim)
            self.H[p] = self.H0[p].copy()
            self.indeg[p] = np.zeros(hi - lo, dtype=np.float64)

    def indeg_msgs(self):
        """One-time per-destination in-degree partials (multiplicity of
        each unique dst in this actor's shards; in-WEIGHT sums in
        weighted mode) — unweighted counts are integer sums, so the
        final in-degrees are layout-invariant."""
        out: List = [None] * self.num_actors
        acc_v: List[List[np.ndarray]] = [[] for _ in range(self.num_actors)]
        acc_c: List[List[np.ndarray]] = [[] for _ in range(self.num_actors)]
        for p in self.owned:
            s = self.shards[p]
            if s["indices"].size == 0:
                continue
            cnt = np.bincount(s["uinv"], weights=s.get("weights"),
                              minlength=len(s["udsts"]))[s["route_order"]]
            b = s["route_bounds"]
            for j in range(self.num_actors):
                if b[j + 1] > b[j]:
                    acc_v[j].append(s["route_udsts"][b[j]:b[j + 1]])
                    acc_c[j].append(cnt[b[j]:b[j + 1]])
        for j in range(self.num_actors):
            if acc_v[j]:
                out[j] = (np.concatenate(acc_v[j]),
                          np.concatenate(acc_c[j]))
        return tuple(out) if self.num_actors > 1 else out[0]

    def apply_indeg(self, *msgs) -> bool:
        for m in msgs:
            if m is None:
                continue
            v, c = m
            for p in self.owned:
                lo, hi = self.shards[p]["vid_lo"], self.shards[p]["vid_hi"]
                mk = (v >= lo) & (v < hi)
                if mk.any():
                    np.add.at(self.indeg[p], v[mk] - lo, c[mk])
        return True

    def scatter(self):
        """Per-destination-actor (vids, (n, d) partial sums).  Level 1:
        reduceat over the static per-shard edge->udst plan; level 2:
        re-aggregate across this actor's shards per destination (the
        PageRank combiner bound, d-wide)."""
        per_v: List[List[np.ndarray]] = [[] for _ in range(self.num_actors)]
        per_m: List[List[np.ndarray]] = [[] for _ in range(self.num_actors)]
        for p in self.owned:
            s = self.shards[p]
            if s["indices"].size == 0:
                continue
            outdeg = s["outdeg"]
            w = s.get("weights")
            if self.agg == "rw":
                norm = s["wout"] if w is not None else outdeg
                src = np.where(norm > 0, 1.0 / np.where(norm > 0, norm, 1),
                               0.0)[:, None] * self.H[p]
            else:
                src = self.H[p]
            per_edge = np.repeat(src, outdeg, axis=0)
            if w is not None:
                per_edge = per_edge * w[:, None]
            per_edge = per_edge[s["agg_order"]]
            sums = np.add.reduceat(per_edge, s["agg_bounds"], axis=0) \
                if per_edge.size else \
                np.zeros((len(s["udsts"]), self.dim))
            sums = sums[s["route_order"]]
            b = s["route_bounds"]
            for j in range(self.num_actors):
                if b[j + 1] > b[j]:
                    per_v[j].append(s["route_udsts"][b[j]:b[j + 1]])
                    per_m[j].append(sums[b[j]:b[j + 1]])
        out: List = [None] * self.num_actors
        for j in range(self.num_actors):
            if not per_v[j]:
                continue
            if len(per_v[j]) == 1:
                out[j] = (per_v[j][0], per_m[j][0])
                continue
            v = np.concatenate(per_v[j])
            m = np.concatenate(per_m[j])
            order = np.argsort(v, kind="stable")
            v, m = v[order], m[order]
            first = np.r_[True, v[1:] != v[:-1]]
            starts = np.flatnonzero(first)
            out[j] = (v[first], np.add.reduceat(m, starts, axis=0))
        return tuple(out) if self.num_actors > 1 else out[0]

    def apply(self, *msgs) -> bool:
        for p in self.owned:
            lo, hi = self.shards[p]["vid_lo"], self.shards[p]["vid_hi"]
            M = np.zeros((hi - lo, self.dim), dtype=np.float64)
            for m in msgs:
                if m is None:
                    continue
                v, mat = m
                mk = (v >= lo) & (v < hi)
                if mk.any():
                    M[v[mk] - lo] += mat[mk]
            if self.agg == "mean":
                dgn = self.indeg[p]
                M /= np.where(dgn > 0, dgn, 1.0)[:, None]
            self.H[p] = (1.0 - self.alpha) * M + self.alpha * self.H0[p]
        return True

    def tables(self, out_col: str):
        out = []
        for p in self.owned:
            lo, hi = self.shards[p]["vid_lo"], self.shards[p]["vid_hi"]
            flat = np.ascontiguousarray(self.H[p]).ravel()
            out.append(pa.table({
                "vid": pa.array(np.arange(lo, hi, dtype=np.int64)),
                out_col: pa.FixedSizeListArray.from_arrays(
                    pa.array(flat, type=pa.float64()), self.dim),
            }))
        return out


def page_features(g, cfg: EngineConfig = DEFAULT):
    """(vid, f fixed_size_list<float64>[2]) page features from the
    extracted layer: text byte length + outlink count — the default
    input for corpus-level propagation (CLI `propagate`,
    q_feature_propagation)."""
    import pyarrow.compute as pc

    from ..ops.join import hash_join
    from .build import read_layer

    ext = read_layer(g.extracted, columns=["url", "text", "links"],
                     cfg=cfg)

    def fv(b: pa.Table) -> pa.Table:
        ln = pc.binary_length(b.column("text")).to_numpy().astype(
            np.float64)
        nl = pc.list_value_length(b.column("links")).to_numpy(
            zero_copy_only=False).astype(np.float64)
        m = np.column_stack([ln, nl])
        return pa.table({"url": b.column("url"),
                         "f": pa.FixedSizeListArray.from_arrays(
                             pa.array(m.ravel(), type=pa.float64()), 2)})

    return hash_join(
        ext.map_batches(fv, batch_format="pyarrow", zero_copy_batch=True),
        read_layer(g.vertices, columns=["url", "vid"], cfg=cfg),
        on="url", right_on="url", num_parts=cfg.num_parts,
        left_schema=pa.schema([("url", pa.string()),
                               ("f", pa.list_(pa.float64(), 2))]),
        right_schema=pa.schema([("url", pa.string()),
                                ("vid", pa.int64())]))


def feature_propagation(edges, offsets: np.ndarray, features,
                        workdir: str, cfg: EngineConfig = DEFAULT, *,
                        col: str = "embedding", out_col: str = None,
                        rounds: int = 2, alpha: float = 0.0,
                        agg: str = "mean", dim: Optional[int] = None,
                        weight_col: Optional[str] = None,
                        shards_dir: Optional[str] = None,
                        lineage: Optional[dict] = None,
                        num_actors: int = 0
                        ) -> Tuple["rd.Dataset", Dict]:
    """Propagate a (vid, col) feature table over the DIRECTED edge
    table for `rounds` rounds (see module docstring for the two
    aggregation modes).  `col` may be fixed_size_list/list<float>
    (dim inferred from the first row unless given) or a plain numeric
    column (d=1).  Vertices without a feature row start at the zero
    vector.  Returns (Dataset(vid, out_col), info).

    Reuses PageRank's directed CSR shard cache ({workdir}/csr,
    lineage {"kind": "directed"}) — warm after any pagerank/hits/katz
    run on the same workdir.  `weight_col` (positive edge weights,
    e.g. host-graph n_links) switches to the weighted cache
    ({workdir}/csr_w, the pagerank convention): "rw" normalizes by
    out-WEIGHT, "mean" becomes the weighted in-neighbor mean
    (sum w*x / sum w)."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1]")
    if agg not in ("mean", "rw"):
        raise ValueError("agg must be 'mean' or 'rw'")
    from .csr import build_csr_shards

    out_col = out_col or col
    num_parts = len(offsets) - 1
    if weight_col is None:
        descs = build_csr_shards(edges, offsets,
                                 shards_dir or f"{workdir}/csr",
                                 lineage=lineage or {"kind": "directed"})
    else:
        descs = build_csr_shards(
            edges, offsets, shards_dir or f"{workdir}/csr_w",
            lineage=lineage or {"kind": "directed-weighted"},
            weight_col=weight_col)
    paths = {dd["part"]: dd["path"] for dd in descs}

    # normalize the feature column to (vid, feat) and learn dim
    sch = features.schema()
    ft = dict(zip(sch.names, sch.types))[col]
    if pa.types.is_fixed_size_list(ft):
        d = dim or ft.list_size
    elif pa.types.is_list(ft):
        if dim is None:
            first = features.take(1)
            if not first:
                raise ValueError("cannot infer dim from an empty "
                                 "features dataset; pass dim=")
            d = len(first[0][col])
        else:
            d = dim
    else:
        d = 1

        def widen(b: pa.Table) -> pa.Table:
            v = b.column(col).to_numpy().astype(np.float64)
            return pa.table({"vid": b.column("vid"),
                             col: pa.FixedSizeListArray.from_arrays(
                                 pa.array(v, type=pa.float64()), 1)})

        features = features.map_batches(widen, batch_format="pyarrow",
                                        zero_copy_batch=True)
    feat_files = _write_features_by_part(
        features.select_columns(["vid", col]), offsets,
        os.path.join(workdir, f"featprop_in_{agg}"), col)

    owned = plan_actors(num_parts, num_actors)
    A = len(owned)
    p2a = part_to_actor_map(owned, num_parts)
    actors = [FeatureShardActor.remote(
        i, owned[i], paths, np.asarray(offsets), p2a, A,
        {p: feat_files[p] for p in owned[i] if p in feat_files}, d,
        alpha, agg) for i in range(A)]
    try:
        if agg == "mean":
            outs = [list(actors[i].indeg_msgs.options(num_returns=A)
                         .remote()) if A > 1
                    else [actors[i].indeg_msgs.remote()]
                    for i in range(A)]
            inbox = transpose_refs(outs)
            ray.get([actors[i].apply_indeg.remote(*inbox[i])
                     for i in range(A)])
        for _ in range(rounds):
            outs = [list(actors[i].scatter.options(num_returns=A)
                         .remote()) if A > 1
                    else [actors[i].scatter.remote()] for i in range(A)]
            inbox = transpose_refs(outs)
            ray.get([actors[i].apply.remote(*inbox[i])
                     for i in range(A)])
        tables = [t for ref in [a.tables.remote(out_col) for a in actors]
                  for t in ray.get(ref)]
    finally:
        for a in actors:
            ray.kill(a)
    info = {"rounds": rounds, "alpha": alpha, "agg": agg, "dim": d,
            "num_actors": A, "weight_col": weight_col}
    return rd.from_arrow(tables), info
