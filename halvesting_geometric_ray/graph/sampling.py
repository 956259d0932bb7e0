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
    Returns (src, dst) sampled edge arrays.

    Vectorized per-part gather (draw v2): candidate edges for the whole
    part frontier are gathered with one repeat/cumsum index expression,
    then over-capacity vertices get one random key per candidate edge
    and keep the k smallest per segment (one composite-key argsort —
    uniform k-subsets without replacement, same distribution as the v1
    per-vertex rng.choice loop but different concrete draws).
    Deterministic given (seed, frontier order); ~12x the v1 loop on a
    10^5-vertex frontier (measured)."""
    rng = np.random.default_rng(seed)
    parts = owner_of(frontier, offsets)
    out_s: List[np.ndarray] = []
    out_d: List[np.ndarray] = []
    for p in np.unique(parts):
        s = load_shard(paths[int(p)])
        lo = s["vid_lo"]
        indptr, indices = s["indptr"], s["indices"]
        vl = frontier[parts == p] - lo
        starts = indptr[vl]
        cnt = indptr[vl + 1] - starts
        nz = cnt > 0
        vs_, starts_, cnt_ = vl[nz] + lo, starts[nz], cnt[nz]
        if vs_.size == 0:
            continue
        total = int(cnt_.sum())
        csum = np.concatenate([[0], np.cumsum(cnt_)])[:-1]
        seg = np.repeat(np.arange(vs_.size), cnt_)
        pos = np.repeat(starts_ - csum, cnt_) + np.arange(total)
        src = vs_[seg]
        dst = indices[pos]
        if int(cnt_.max()) <= k:
            out_s.append(src)
            out_d.append(dst)
            continue
        # rank-select: sort candidates by (segment, random key); within
        # a segment the rank is position - segment start, so keeping
        # rank < min(cnt, k) takes a uniform k-subset of each oversized
        # segment and every edge of the small ones
        r = rng.random(total)
        # composite float key: one quicksort instead of lexsort's two
        # stable passes (~7x, measured).  seg*2 leaves a >=1.0 gap
        # between segments, so float rounding can never cross a segment
        # boundary; within-segment order is the random key.
        order = np.argsort(seg * 2.0 + r)
        seg_o = seg[order]
        rank = np.arange(total) - csum[seg_o]
        sel = order[rank < np.minimum(cnt_, k)[seg_o]]
        sel.sort()  # restore per-vertex CSR neighbor order (v1 contract)
        out_s.append(src[sel])
        out_d.append(dst[sel])
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
