"""Independent single-process NumPy oracles for the iterative analytics.

These mirror the ENGINE'S pinned semantics exactly (same update formula,
same convergence rule, same tie-breaks) so engine-vs-oracle comparison
isolates distribution/partitioning effects — per BASELINE.md: PageRank
allclose(rtol=0, atol=1e-6); CC labels / triangle counts exact."""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np


def pagerank_oracle(n: int, src: np.ndarray, dst: np.ndarray,
                    d: float = 0.85, tol: float = 1e-6, max_iters: int = 200):
    outdeg = np.bincount(src, minlength=n)
    r = np.full(n, 1.0 / n)
    iters = 0
    for _ in range(max_iters):
        iters += 1
        dm = r[outdeg == 0].sum()
        contrib = np.zeros(n)
        np.add.at(contrib, dst, r[src] / outdeg[src])
        new = (1.0 - d) / n + d * (contrib + dm / n)
        l1 = np.abs(new - r).sum()
        r = new
        if l1 < tol:
            break
    return r, iters


def pagerank_weighted_oracle(n: int, src: np.ndarray, dst: np.ndarray,
                             w: np.ndarray, d: float = 0.85,
                             tol: float = 1e-6, max_iters: int = 200):
    """Weighted PageRank: out-mass split w_uv / sum_x w_ux.  Duplicate
    (src, dst) pairs are summed first (the engine's shard-build
    semantics)."""
    import pandas as pd

    agg = (pd.DataFrame({"src": src, "dst": dst, "w": w})
           .groupby(["src", "dst"], as_index=False)["w"].sum())
    src = agg["src"].to_numpy()
    dst = agg["dst"].to_numpy()
    w = agg["w"].to_numpy(dtype=np.float64)
    wout = np.bincount(src, weights=w, minlength=n)
    outdeg = np.bincount(src, minlength=n)
    r = np.full(n, 1.0 / n)
    iters = 0
    for _ in range(max_iters):
        iters += 1
        dm = r[outdeg == 0].sum()
        contrib = np.zeros(n)
        np.add.at(contrib, dst, r[src] * w / wout[src])
        new = (1.0 - d) / n + d * (contrib + dm / n)
        l1 = np.abs(new - r).sum()
        r = new
        if l1 < tol:
            break
    return r, iters


def components_oracle(n: int, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Exact min-vid component labels over the UNDIRECTED closure."""
    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(src, dst):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = np.array([find(i) for i in range(n)])
    # min-vid label per component
    return out


def triangles_oracle(n: int, src: np.ndarray, dst: np.ndarray):
    """Exact per-vertex + global triangle counts of the undirected simple
    graph (self-loops ignored)."""
    adj = defaultdict(set)
    for a, b in zip(src, dst):
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    per = np.zeros(n, dtype=np.int64)
    total = 0
    for u in range(n):
        nbrs = [v for v in adj[u] if v > u]
        for i in range(len(nbrs)):
            for j in range(i + 1, len(nbrs)):
                v, w = nbrs[i], nbrs[j]
                if w in adj[v]:
                    total += 1
                    per[u] += 1
                    per[v] += 1
                    per[w] += 1
    return per, total


def labelprop_oracle(n: int, src: np.ndarray, dst: np.ndarray,
                     rounds: int = 5) -> np.ndarray:
    """Synchronous community label propagation over the undirected graph:
    new label = most frequent neighbor label, ties -> smallest label;
    isolated vertices keep their label.  Deterministic by construction."""
    adj = defaultdict(set)
    for a, b in zip(src, dst):
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    labels = np.arange(n, dtype=np.int64)
    for _ in range(rounds):
        new = labels.copy()
        for u in range(n):
            if adj[u]:
                c = Counter(labels[v] for v in adj[u])
                best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
                new[u] = best[0]
        labels = new
    return labels


def cliques4_oracle(n: int, src: np.ndarray, dst: np.ndarray):
    """Exact per-vertex + global 4-clique counts of the undirected
    simple graph (self-loops ignored): enumerate triangles u<v<w, then
    apexes x>w adjacent to all three."""
    adj = defaultdict(set)
    for a, b in zip(src, dst):
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    per = np.zeros(n, dtype=np.int64)
    total = 0
    for u in range(n):
        nbrs = sorted(v for v in adj[u] if v > u)
        for i in range(len(nbrs)):
            for j in range(i + 1, len(nbrs)):
                v, w = nbrs[i], nbrs[j]
                if w not in adj[v]:
                    continue
                for x in adj[w]:
                    if x > w and x in adj[u] and x in adj[v]:
                        total += 1
                        for c in (u, v, w, x):
                            per[c] += 1
    return per, total
