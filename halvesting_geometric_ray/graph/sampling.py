"""k-hop neighbor sampling over CSR shards (R2 of SURVEY.md section 2.7).

The structural analogue of the reference's LinkNeighborLoader
(link_prediction_datamodule.py:147-191, num_neighbors=[32,16]/[128,16]):
per-hop fan-out-capped neighbor draws, executed as shard-local gathers —
each hop routes the frontier to the partitions owning its vertices
(owner = searchsorted(offsets), same contiguous-range scheme as the
analytics), samples up to k neighbors per vertex with a seeded RNG, and
returns the sampled edge list.  Deterministic given (seed, frontier).

Single-process helper over the shard files (sampling mini-batches is a
training-loop concern, not a Dataset pipeline); for distributed sampling
wrap `sample_hop` in the shard-actor engine like PageRank's scatter.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ..ops.ids import owner_of
from .csr import load_shard


def sample_hop(frontier: np.ndarray, paths: Dict[int, str],
               offsets: np.ndarray, k: int, seed: int) -> Tuple[np.ndarray, np.ndarray]:
    """One hop: for each frontier vertex draw <=k distinct out-neighbors.
    Returns (src, dst) sampled edge arrays."""
    rng = np.random.default_rng(seed)
    parts = owner_of(frontier, offsets)
    out_s: List[np.ndarray] = []
    out_d: List[np.ndarray] = []
    for p in np.unique(parts):
        s = load_shard(paths[int(p)])
        lo = s["vid_lo"]
        for v in frontier[parts == p]:
            a, b = s["indptr"][v - lo], s["indptr"][v - lo + 1]
            nbrs = s["indices"][a:b]
            if nbrs.size == 0:
                continue
            if nbrs.size > k:
                take = rng.choice(nbrs.size, size=k, replace=False)
                nbrs = nbrs[np.sort(take)]
            out_s.append(np.full(nbrs.size, v, dtype=np.int64))
            out_d.append(nbrs)
    if not out_s:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return np.concatenate(out_s), np.concatenate(out_d)


def sample_k_hop(seeds: np.ndarray, paths: Dict[int, str], offsets: np.ndarray,
                 fanouts: List[int], seed: int = 31):
    """Multi-hop neighborhood: returns (nodes, edge_src, edge_dst) of the
    sampled subgraph, reference fan-out semantics (e.g. [32, 16])."""
    nodes = np.unique(seeds)
    frontier = nodes
    es: List[np.ndarray] = []
    ed: List[np.ndarray] = []
    for hop, k in enumerate(fanouts):
        s, d = sample_hop(frontier, paths, offsets, k, seed + hop)
        es.append(s)
        ed.append(d)
        new = np.setdiff1d(np.unique(d), nodes, assume_unique=False)
        nodes = np.union1d(nodes, new)
        frontier = new
        if frontier.size == 0:
            break
    if es:
        return nodes, np.concatenate(es), np.concatenate(ed)
    return nodes, np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
