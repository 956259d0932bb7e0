"""Landmark-based shortest-path distance oracle.

The standard answer to "distance between two pages" on graphs where
all-pairs is impossible (Potamias et al. 2009, "Fast shortest path
distance estimation in large networks"; Das Sarma et al. 2010 sketch
variant): precompute exact BFS distances from k landmark vertices,
then estimate d(u, v) <= min over landmarks L of d(u, L) + d(L, v) —
an upper bound by the triangle inequality, exact whenever some
shortest u-v path passes a landmark.  High-degree landmarks give the
tightest bounds on web-like graphs (the hubs lie on many shortest
paths), so that is the default selection.

Scale shape: k frontier BFS passes over cached symmetric CSR shards
(graph/bfs.py — each edge relaxed exactly once per pass), a (V x k)
long table as the oracle layer, and estimation as two bucketed joins
+ one grouped min per queried pair batch.  Landmark selection is one
grouped degree count + a k-limit (k is tiny).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..config import DEFAULT, EngineConfig
from ..ops.agg import grouped_aggregate
from ..ops.join import hash_join
from .bfs import bfs


def select_landmarks(sym_edges, k: int, cfg: EngineConfig = DEFAULT
                     ) -> np.ndarray:
    """Top-k vertices by (symmetrized) degree — ties broken by vid for
    determinism.  One grouped count + a driver top-k over per-block
    candidates (each block contributes at most k rows)."""
    deg = grouped_aggregate(sym_edges.select_columns(["src"]), ["src"],
                            {"deg": ("count", None)},
                            num_parts=cfg.num_parts)

    def top(b: pa.Table) -> pa.Table:
        d = b.column("deg").to_numpy()
        v = b.column("src").to_numpy()
        order = np.lexsort((v, -d))[:k]
        return pa.table({"src": pa.array(v[order]),
                         "deg": pa.array(d[order])})

    cands = top(pa.concat_tables(
        [bb for bb in deg.map_batches(top, batch_format="pyarrow",
                                      zero_copy_batch=True)
         .iter_batches(batch_format="pyarrow")]))
    return np.sort(cands.column("src").to_numpy())


def landmark_distances(sym_edges, offsets: np.ndarray, workdir: str,
                       cfg: EngineConfig = DEFAULT, *, k: int = 8,
                       landmarks: Optional[np.ndarray] = None,
                       shards_dir: Optional[str] = None,
                       num_actors: int = 0
                       ) -> Tuple["rd.Dataset", np.ndarray, Dict]:
    """Exact BFS distances from each of k landmarks.  Returns
    (Dataset(vid, landmark, dist) — unreachable (vid, landmark) pairs
    absent —, the landmark array, info)."""
    if landmarks is None:
        if k < 1:
            raise ValueError("k must be >= 1")
        landmarks = select_landmarks(sym_edges, k, cfg)
    landmarks = np.unique(np.asarray(landmarks, dtype=np.int64))
    if landmarks.size == 0:
        raise ValueError("no landmarks")
    outs = []
    info: Dict = {"landmarks": landmarks.tolist(), "per_landmark": []}
    for li in landmarks:
        d, binfo = bfs(sym_edges, offsets, workdir,
                       np.array([li], dtype=np.int64), cfg,
                       shards_dir=shards_dir, num_actors=num_actors)
        lv = int(li)
        outs.append(d.map_batches(
            lambda b, lv=lv: pa.table({
                "vid": b.column("vid"),
                "landmark": pa.array(
                    np.full(b.num_rows, lv, dtype=np.int64)),
                "dist": b.column("dist").cast(pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True))
        info["per_landmark"].append({"landmark": lv,
                                     "rounds": binfo.get("num_iters",
                                                         None)})
    ds = outs[0]
    for o in outs[1:]:
        ds = ds.union(o)
    return ds, landmarks, info


def estimate_distances(dist_ds, pairs, cfg: EngineConfig = DEFAULT):
    """Upper-bound distance estimates for a (src, dst) pair table:
    d_hat = min over landmarks of d(src, L) + d(L, dst).  Pairs where
    either side reaches no landmark are absent (different components
    under the symmetric oracle => truly infinite).  Two bucketed hash
    joins + one grouped min."""
    i64 = pa.int64()
    p_schema = pa.schema([("src", i64), ("dst", i64)])
    d_schema = pa.schema([("vid", i64), ("landmark", i64),
                          ("dist", i64)])
    j = hash_join(pairs, dist_ds, on="src", right_on="vid",
                  num_parts=cfg.num_parts,
                  right_cols=["landmark", "dist"],
                  left_schema=p_schema, right_schema=d_schema)
    j = j.map_batches(lambda b: b.rename_columns(
        ["src", "dst", "landmark", "d_src"]),
        batch_format="pyarrow", zero_copy_batch=True)
    j_schema = pa.schema([("src", i64), ("dst", i64),
                          ("landmark", i64), ("d_src", i64)])
    j2 = hash_join(j, dist_ds, on=["dst", "landmark"],
                   right_on=["vid", "landmark"],
                   num_parts=cfg.num_parts, right_cols=["dist"],
                   left_schema=j_schema, right_schema=d_schema)
    j2 = j2.map_batches(lambda b: b.rename_columns(
        ["dst", "landmark", "src", "d_src", "d_dst"]),
        batch_format="pyarrow", zero_copy_batch=True)

    def add(b: pa.Table) -> pa.Table:
        s = (b.column("d_src").to_numpy()
             + b.column("d_dst").to_numpy())
        return pa.table({"src": b.column("src"), "dst": b.column("dst"),
                         "d_hat": pa.array(s)})

    summed = j2.map_batches(add, batch_format="pyarrow",
                            zero_copy_batch=True)
    return grouped_aggregate(summed, ["src", "dst"],
                             {"d_hat": ("min", "d_hat")},
                             num_parts=cfg.num_parts)
