"""Spectral embedding / clustering on the CSR shard-actor engine.

Top-k eigenpairs of the symmetric-normalized adjacency

    S = D^{-1/2} A D^{-1/2}        (A symmetric, D = degree diagonal)

by BLOCK ORTHOGONAL ITERATION (simultaneous power iteration, the
classical subspace method — Golub & Van Loan ch. 8; the distributed
formulation is the same gather-scatter as PageRank, just with k
columns in flight).  The spectral embedding X (N x k, orthonormal
columns spanning the dominant eigenspace) is THE classical geometry
for graph clustering: Ng-Jordan-Weiss spectral clustering = row-
normalized X fed to k-means, and S's eigenvectors coincide with the
bottom eigenvectors of the normalized Laplacian L = I - S.

Iteration runs on the HALF-SHIFTED operator  M = (I + S) / 2  whose
spectrum lives in [0, 1] — same eigenvectors as S, order preserved on
the top end, but immune to |negative| eigenvalues outrunning positive
ones on near-bipartite link structures (S's spectrum is [-1, 1]).
Reported eigenvalues are mapped back: mu_S = 2 * theta_M - 1.

One round, all on warm shard actors holding the SYMMETRIZED CSR
({workdir}/csr_sym — shared with connected components):

  1. every actor scales its owned rows Z = D^{-1/2} X and scatters
     per-destination-combined k-column partials of A Z (the PageRank
     exchange with k columns);
  2. receivers scale by their local D^{-1/2} and form
     Y = (X + D^{-1/2} (A Z)) / 2 = M X;
  3. Gram partials G_p = Y_p^T Y_p (k x k) reduce on the driver in
     actor order; Cholesky G = R^T R; actors apply X <- Y R^{-1}
     (thin-QR orthonormalization — only k x k state ever leaves the
     actors);
  4. convergence: P = X_prev^T X_new (k x k, same reduce); the
     subspace is converged when every singular value of P exceeds
     1 - tol (all principal angles ~ 0).

A final Rayleigh-Ritz pass (B = X^T M X, eigh on the driver, rotate
X <- X V) aligns columns to individual Ritz vectors and yields the
eigenvalue estimates.  Driver state is k x k throughout.

Determinism: X_0 is a stateless splitmix64 hash of (vid, column,
seed) — layout-independent by construction; per-destination combines
are order-fixed bincounts; every driver reduce sums in actor order.
Fixed layout reruns are bitwise; across layouts the result agrees to
float-association tolerance (pinned in tests/test_spectral.py, along
with dense-eigh parity on the Ritz values and planted-block recovery
of the composed clustering).

Isolated vertices (degree 0) have zero coupling (their D^{-1/2} row
is defined as 0) and converge out of the dominant subspace.

Semantic anchor: the reference learns node geometry with GNN message
passing (halvesting_geometric/modules/sage.py); the spectral
embedding is the classical, deterministic counterpart over the same
graph, and feeds the engine's certified k-means
(functions/clustering.py) for the clustering composition.
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


def _init_rows(vids: np.ndarray, k: int, seed: int) -> np.ndarray:
    """Stateless uniform(-1, 1) init: splitmix64 of (vid, col, seed) —
    identical for any partitioning/actor layout."""
    out = np.empty((vids.size, k), dtype=np.float64)
    for j in range(k):
        with np.errstate(over="ignore"):
            h = (vids.astype(np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15)
                 + np.uint64(2 * j + 1)
                 + np.uint64(seed) * np.uint64(0xD1342543DE82EF95))
            h ^= h >> np.uint64(30)
            h *= np.uint64(0xBF58476D1CE4E5B9)
            h ^= h >> np.uint64(27)
            h *= np.uint64(0x94D049BB133111EB)
            h ^= h >> np.uint64(31)
        out[:, j] = (h >> np.uint64(11)).astype(np.float64) \
            * 2.0 ** -52 - 1.0
    return out


@ray.remote(num_cpus=0)
class SpectralShardActor:
    """Owns partitions' symmetric CSR shards + the X block rows."""

    def __init__(self, actor_idx: int, owned: List[int],
                 paths: Dict[int, str], offsets: np.ndarray,
                 part2actor: np.ndarray, num_actors: int,
                 k: int, seed: int):
        self.owned = owned
        self.num_actors = num_actors
        self.k = k
        self.shards: Dict[int, Dict] = {}
        self.x: Dict[int, np.ndarray] = {}       # current block rows
        self.y: Dict[int, np.ndarray] = {}       # pre-orthonorm MX
        self.dinv: Dict[int, np.ndarray] = {}    # D^{-1/2} (0 if deg 0)
        for p in owned:
            s = dict(load_shard(paths[p]))
            dest = part2actor[s["udst_part"]]
            order = np.argsort(dest, kind="stable")
            s["route_order"] = order
            s["route_udsts"] = s["udsts"][order]
            s["route_bounds"] = np.searchsorted(
                dest[order], np.arange(num_actors + 1))
            self.shards[p] = s
            lo, hi = s["vid_lo"], s["vid_hi"]
            deg = s["outdeg"].astype(np.float64)
            with np.errstate(divide="ignore"):
                di = 1.0 / np.sqrt(deg)
            di[deg == 0.0] = 0.0
            self.dinv[p] = di
            self.x[p] = _init_rows(np.arange(lo, hi, dtype=np.int64),
                                   k, seed)

    def _scatter(self):
        """Per-destination-actor (vids, k-col partials) of A Z with
        Z = D^{-1/2} X — the PageRank combiner, k columns wide."""
        per_v: List[List[np.ndarray]] = \
            [[] for _ in range(self.num_actors)]
        per_m: List[List[np.ndarray]] = \
            [[] for _ in range(self.num_actors)]
        for p in self.owned:
            s = self.shards[p]
            if s["indices"].size == 0:
                continue
            z = self.x[p] * self.dinv[p][:, None]
            per_edge = np.repeat(z, s["outdeg"], axis=0)
            nu = len(s["udsts"])
            acc = np.empty((nu, self.k), dtype=np.float64)
            for j in range(self.k):
                acc[:, j] = np.bincount(s["uinv"],
                                        weights=per_edge[:, j],
                                        minlength=nu)
            acc = acc[s["route_order"]]
            b = s["route_bounds"]
            for j in range(self.num_actors):
                if b[j + 1] > b[j]:
                    per_v[j].append(s["route_udsts"][b[j]:b[j + 1]])
                    per_m[j].append(acc[b[j]:b[j + 1]])
        out = []
        for j in range(self.num_actors):
            if not per_v[j]:
                out.append(None)
            elif len(per_v[j]) == 1:
                out.append((per_v[j][0], per_m[j][0]))
            else:
                v = np.concatenate(per_v[j])
                m = np.concatenate(per_m[j])
                uv, inv = np.unique(v, return_inverse=True)
                mm = np.empty((uv.size, self.k), dtype=np.float64)
                for c in range(self.k):
                    mm[:, c] = np.bincount(inv, weights=m[:, c],
                                           minlength=uv.size)
                out.append((uv, mm))
        return out

    def scatter0(self):
        out = self._scatter()
        return tuple(out) if self.num_actors > 1 else out[0]

    def gather(self, *incoming):
        """Form Y = (X + D^{-1/2} AZ) / 2 from incoming partials;
        return the k x k Gram partial Y^T Y."""
        g = np.zeros((self.k, self.k), dtype=np.float64)
        for p in self.owned:
            s = self.shards[p]
            lo, hi = s["vid_lo"], s["vid_hi"]
            az = np.zeros((hi - lo, self.k), dtype=np.float64)
            for msg in incoming:
                if msg is None:
                    continue
                vids, vals = msg
                m = (vids >= lo) & (vids < hi)
                if m.any():
                    az[vids[m] - lo] += vals[m]
            y = 0.5 * (self.x[p] + az * self.dinv[p][:, None])
            self.y[p] = y
            g += y.T @ y
        return g

    def orthonormalize(self, rinv: np.ndarray):
        """X <- Y R^{-1}; return the k x k alignment partial
        X_prev^T X_new (convergence: principal angles)."""
        a = np.zeros((self.k, self.k), dtype=np.float64)
        for p in self.owned:
            xn = self.y[p] @ rinv
            a += self.x[p].T @ xn
            self.x[p] = xn
        return a

    def gram_x(self):
        """k x k partial X^T X (init orthonormalization)."""
        g = np.zeros((self.k, self.k), dtype=np.float64)
        for p in self.owned:
            g += self.x[p].T @ self.x[p]
        return g

    def apply_rinv(self, rinv: np.ndarray):
        for p in self.owned:
            self.x[p] = self.x[p] @ rinv

    def xty(self):
        """k x k Rayleigh-quotient partial X^T Y (Y = M X from the
        last gather) — no state mutation."""
        b = np.zeros((self.k, self.k), dtype=np.float64)
        for p in self.owned:
            b += self.x[p].T @ self.y[p]
        return b

    def rotate(self, v: np.ndarray):
        for p in self.owned:
            self.x[p] = self.x[p] @ v

    def result_tables(self):
        out = []
        for p in self.owned:
            s = self.shards[p]
            lo, hi = s["vid_lo"], s["vid_hi"]
            flat = self.x[p].reshape(-1)
            out.append(pa.table({
                "part": pa.array(np.full(hi - lo, p, dtype=np.int32)),
                "vid": pa.array(np.arange(lo, hi, dtype=np.int64)),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(flat, type=pa.float64()), self.k),
            }))
        return out


def spectral_embedding(edges, offsets: np.ndarray, workdir: str,
                       cfg: EngineConfig = DEFAULT, *,
                       k: int = 8, tol: float = 1e-8,
                       max_iters: int = 200, seed: int = 42,
                       shards_dir: Optional[str] = None,
                       num_actors: int = 0
                       ) -> Tuple["rd.Dataset", Dict]:
    """Top-k spectral embedding of the UNDIRECTED link graph (input:
    directed edge table, symmetrized internally).  Returns
    (ds(part, vid, embedding fixed_size_list<f64>[k]), info) with
    info["eigenvalues"] = Ritz estimates for S = D^{-1/2} A D^{-1/2},
    descending (eigenvalues[0] ~ 1.0 on a graph with edges), and
    per-round info["iters"] = {"min_align": smallest principal-angle
    cosine}.  Columns of the embedding are the Ritz vectors, unit-L2,
    aligned to eigenvalue order."""
    from .build import symmetrize
    from .csr import build_csr_shards

    N = int(offsets[-1])
    if k < 1:
        raise ValueError("k must be >= 1")
    if N == 0:
        import pandas as _pd

        return rd.from_pandas(_pd.DataFrame(
            {"part": _pd.Series([], dtype="int32"),
             "vid": _pd.Series([], dtype="int64")})), \
            {"eigenvalues": [], "num_iters": 0, "converged": True}
    if k > N:
        raise ValueError(f"k={k} exceeds n_vertices={N}")
    num_parts = len(offsets) - 1
    descs = build_csr_shards(
        symmetrize(edges, cfg, dedup=False), offsets,
        shards_dir or f"{workdir}/csr_sym", lineage={"kind": "sym"})
    paths = {dd["part"]: dd["path"] for dd in descs}
    owned = plan_actors(num_parts, num_actors)
    A = len(owned)
    p2a = part_to_actor_map(owned, num_parts)
    actors = [SpectralShardActor.remote(i, owned[i], paths,
                                        np.asarray(offsets), p2a, A,
                                        k, seed)
              for i in range(A)]
    info: Dict = {"iters": []}
    t0 = time.time()
    try:
        # orthonormalize the hash init (X^T X reduce + Cholesky) so
        # every later Gram is a true Rayleigh quotient
        g0 = np.zeros((k, k), dtype=np.float64)
        for gp in ray.get([a.gram_x.remote() for a in actors]):
            g0 += gp
        r0 = np.linalg.cholesky(g0).T
        ray.get([a.apply_rinv.remote(np.linalg.inv(r0))
                 for a in actors])
        outs = [list(a.scatter0.options(num_returns=A).remote())
                if A > 1 else [a.scatter0.remote()] for a in actors]
        inbox = transpose_refs(outs)
        converged = False
        theta_prev = None
        for it in range(1, max_iters + 1):
            # Y = M X + Gram reduce (actor order: deterministic)
            grams = ray.get([actors[j].gather.remote(*inbox[j])
                             for j in range(A)])
            g = np.zeros((k, k), dtype=np.float64)
            for gp in grams:
                g += gp
            # thin QR via Cholesky; jitter-free — the iterate stays
            # full-rank because M has >= k nonzero eigenvalues unless
            # the graph is degenerate, where eigh fallback still works
            try:
                r = np.linalg.cholesky(g).T
                rinv = np.linalg.inv(r)
            except np.linalg.LinAlgError:
                w, v = np.linalg.eigh(g)
                w = np.maximum(w, 1e-300)
                rinv = v @ np.diag(1.0 / np.sqrt(w)) @ v.T
            aligns = ray.get([a.orthonormalize.remote(rinv)
                              for a in actors])
            al = np.zeros((k, k), dtype=np.float64)
            for ap in aligns:
                al += ap
            sv = np.linalg.svd(al, compute_uv=False)
            min_align = float(sv.min())
            # Ritz estimates are FREE from the Gram: X orthonormal ->
            # G = X^T M^2 X, so sqrt(eig(G)) are the M^2-quotient Ritz
            # values of M; convergence = their stabilization
            theta_est = np.sqrt(np.maximum(
                np.linalg.eigvalsh(g), 0.0))[::-1]
            dtheta = float(np.abs(theta_est - theta_prev).max()) \
                if theta_prev is not None else float("inf")
            theta_prev = theta_est
            info["iters"].append({"iter": it, "min_align": min_align,
                                  "dtheta": dtheta})
            if dtheta < tol and min_align > 1.0 - np.sqrt(tol):
                converged = True
                break
            outs = [list(a.scatter0.options(num_returns=A).remote())
                    if A > 1 else [a.scatter0.remote()]
                    for a in actors]
            inbox = transpose_refs(outs)
        # Rayleigh-Ritz: one more matvec leaves Y = M X on the
        # actors; B = X^T Y reduces in actor order; rotate X <- X V
        outs = [list(a.scatter0.options(num_returns=A).remote())
                if A > 1 else [a.scatter0.remote()] for a in actors]
        inbox = transpose_refs(outs)
        ray.get([actors[j].gather.remote(*inbox[j])
                 for j in range(A)])
        bs = ray.get([a.xty.remote() for a in actors])
        b = np.zeros((k, k), dtype=np.float64)
        for bp in bs:
            b += bp
        b = 0.5 * (b + b.T)  # symmetrize float noise
        theta, v = np.linalg.eigh(b)
        order = np.argsort(theta)[::-1]
        theta, v = theta[order], v[:, order]
        # deterministic eigenvector sign: first nonzero row positive
        for j in range(k):
            col = v[:, j]
            nz = np.nonzero(np.abs(col) > 1e-12)[0]
            if nz.size and col[nz[0]] < 0:
                v[:, j] = -col
        ray.get([a.rotate.remote(np.ascontiguousarray(v))
                 for a in actors])
        tables = [t for ref in [a.result_tables.remote()
                                for a in actors]
                  for t in ray.get(ref)]
    finally:
        for a in actors:
            ray.kill(a)
    info["eigenvalues"] = [float(2.0 * t - 1.0) for t in theta]
    info["num_iters"] = len(info["iters"])
    info["converged"] = converged
    info["wall_sec"] = round(time.time() - t0, 4)
    return rd.from_arrow(tables), info


def spectral_clustering(edges, offsets: np.ndarray, workdir: str,
                        cfg: EngineConfig = DEFAULT, *,
                        n_clusters: int = 8, dim: Optional[int] = None,
                        tol: float = 1e-8, max_iters: int = 200,
                        seed: int = 42, kmeans_iters: int = 25,
                        num_actors: int = 0
                        ) -> Tuple["rd.Dataset", Dict]:
    """Ng-Jordan-Weiss spectral clustering: spectral_embedding ->
    drop the trivial principal column -> row-L2-normalize -> the
    engine's certified k-means (functions/clustering.py).  Returns
    (ds(vid, cluster), info)."""
    from ..functions.clustering import kmeans, kmeans_assign

    dim = n_clusters if dim is None else dim
    emb, info = spectral_embedding(
        edges, offsets, workdir, cfg, k=dim + 1, tol=tol,
        max_iters=max_iters, seed=seed, num_actors=num_actors)

    def rows(b: pa.Table) -> pa.Table:
        vids = b.column("vid").to_numpy()
        emb = b.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        m = np.asarray(emb.flatten(),
                       dtype=np.float64).reshape(len(vids), dim + 1)
        m = m[:, 1:]  # drop the trivial principal direction
        nrm = np.linalg.norm(m, axis=1)
        nrm[nrm == 0.0] = 1.0
        m = m / nrm[:, None]
        return pa.table({
            "vec_id": pa.array(vids),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.reshape(-1), type=pa.float64()), dim)})

    feats = emb.map_batches(rows, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    cent, kinfo = kmeans(feats, n_clusters, max_iters=kmeans_iters,
                         seed=seed)
    out = kmeans_assign(feats, cent).map_batches(
        lambda b: pa.table({"vid": b.column("vec_id"),
                            "cluster": b.column("cluster")}),
        batch_format="pyarrow", zero_copy_batch=True)
    info["kmeans"] = {"n_iters": len(kinfo["iters"])}
    return out, info
