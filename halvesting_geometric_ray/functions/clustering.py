"""Distributed k-means (Lloyd) over an embedding column.

The clustering primitive the embedding suite was missing: IVF's coarse
quantizer (functions/similarity.py::ivf_centroids) trains on a driver
sample; this runs FULL-corpus Lloyd rounds — the shape that holds when
the corpus no longer fits a sample and cluster balance matters
(semantic dedup shards, topic bucketing, mixture construction).

Round shape: centroids are a tiny (k x d) model shipped once per round
inside the batch closure; each batch assigns vectors with one matmul
(argmin ||x-c||^2 = argmin(|c|^2 - 2 x.c), vectorized) and emits k
PARTIAL rows (vector sum, count, inertia) — so a round's exchange is
k x num_blocks fixed-width rows, independent of corpus size, reduced on
the driver (tree-reduce it past ~10^5 blocks, the HLL-merge argument).

Determinism: initial centroids are the k vectors with the SMALLEST
stable hash of their id — a per-batch partial top-k + driver merge, so
init is block-layout independent (no .limit() order dependence).
Float summation order across blocks varies with layout; centroids are
deterministic to ~1e-12 and assignments are integer-stable (ties broken
by lowest centroid index).  tests/test_clustering.py pins a numpy
reference with identical init.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import pyarrow as pa

from .hashing import stable_hash64


def _mat(b: pa.Table, id_col: str, col: str) -> Tuple[np.ndarray,
                                                      np.ndarray]:
    ids = b.column(id_col).to_numpy()
    emb = b.column(col)
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    # .flatten() (unlike .values) respects a sliced block's offset —
    # shuffled map_groups tasks hand us slices; embeddings are non-null
    flat = np.asarray(emb.flatten(), dtype=np.float64)
    return ids, flat.reshape(len(ids), -1)


def _hash_init(ds, k: int, id_col: str, col: str, seed: int) -> np.ndarray:
    """k init vectors = rows with the smallest stable id hash (layout-
    independent).  Per-batch partial top-k, driver merge."""

    def partial(b: pa.Table) -> pa.Table:
        ids, m = _mat(b, id_col, col)
        h = stable_hash64(b.column(id_col), seed=seed)
        take = np.argsort(h, kind="stable")[:k]
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(m[take].ravel(), type=pa.float64()), m.shape[1])
        return pa.table({"h": pa.array(h[take]), "v": arr})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    order = np.argsort(parts["h"].to_numpy(), kind="stable")[:k]
    return np.stack([np.asarray(parts["v"].iloc[i], dtype=np.float64)
                     for i in order])


def kmeans(embeddings, k: int, *, col: str = "embedding",
           id_col: str = "vec_id", max_iters: int = 20,
           tol: float = 1e-6, seed: int = 13,
           init: "np.ndarray" = None
           ) -> Tuple[np.ndarray, Dict]:
    """Lloyd k-means; returns (centroids (k, d) float64, info) with
    info["iters"] = per-round {shift, inertia}.  Empty clusters keep
    their previous centroid.  Assign the corpus with kmeans_assign.
    ``init``: optional (k, d) start centroids (kmeans_parallel_init's
    k-means|| seeding); default is the stable-hash row pick."""
    if k < 1:
        raise ValueError("k must be >= 1")
    cent = _hash_init(embeddings, k, id_col, col, seed) \
        if init is None else np.asarray(init, dtype=np.float64)
    k_eff = len(cent)
    if k_eff < k:
        raise ValueError(f"corpus has only {k_eff} rows for k={k}")
    info: Dict = {"k": k, "iters": []}
    for it in range(max_iters):
        c = cent  # bind for the closure (ships with the task)
        cc = 0.5 * (c * c).sum(axis=1)

        def partial(b: pa.Table, c=c, cc=cc) -> pa.Table:
            _, m = _mat(b, id_col, col)
            scores = cc[None, :] - m @ c.T  # argmin distance
            assign = scores.argmin(axis=1)
            d = m.shape[1]
            sums = np.zeros((len(c), d), dtype=np.float64)
            np.add.at(sums, assign, m)
            cnt = np.bincount(assign, minlength=len(c)).astype(np.int64)
            # inertia partial: sum ||x||^2 + 2*score at argmin
            x2 = (m * m).sum(axis=1)
            inert = x2 + 2.0 * scores[np.arange(len(m)), assign]
            inert_c = np.zeros(len(c), dtype=np.float64)
            np.add.at(inert_c, assign, inert)
            arr = pa.FixedSizeListArray.from_arrays(
                pa.array(sums.ravel(), type=pa.float64()), d)
            return pa.table({"cid": pa.array(np.arange(len(c),
                                                       dtype=np.int64)),
                             "s": arr, "n": pa.array(cnt),
                             "inertia": pa.array(inert_c)})

        parts = embeddings.map_batches(
            partial, batch_format="pyarrow",
            zero_copy_batch=True).to_pandas()
        d = cent.shape[1]
        sums = np.zeros((k_eff, d), dtype=np.float64)
        cnts = np.zeros(k_eff, dtype=np.int64)
        # deterministic reduce order: by (cid, then stable row order)
        for cid, grp in parts.groupby("cid", sort=True):
            sums[cid] = np.stack([np.asarray(v) for v in grp["s"]]).sum(
                axis=0)
            cnts[cid] = grp["n"].sum()
        inertia = float(parts["inertia"].sum())
        new = cent.copy()
        nz = cnts > 0
        new[nz] = sums[nz] / cnts[nz][:, None]
        shift = float(np.sqrt(((new - cent) ** 2).sum(axis=1)).max())
        cent = new
        info["iters"].append({"iter": it, "shift": shift,
                              "inertia": inertia})
        if shift <= tol:
            break
    info["num_iters"] = len(info["iters"])
    info["converged"] = bool(info["iters"] and
                             info["iters"][-1]["shift"] <= tol)
    return cent, info


def kmeans_assign(embeddings, centroids: np.ndarray, *,
                  col: str = "embedding", id_col: str = "vec_id",
                  out_col: str = "cluster"):
    """One streaming pass: nearest-centroid id per row (ties -> lowest
    centroid index).  Returns ds(id_col, out_col)."""
    c = np.asarray(centroids, dtype=np.float64)
    cc = 0.5 * (c * c).sum(axis=1)

    def assign(b: pa.Table) -> pa.Table:
        ids, m = _mat(b, id_col, col)
        a = (cc[None, :] - m @ c.T).argmin(axis=1)
        return pa.table({id_col: b.column(id_col),
                         out_col: pa.array(a.astype(np.int64))})

    return embeddings.map_batches(assign, batch_format="pyarrow",
                                  zero_copy_batch=True)


def semantic_dedup(embeddings, *, k: int = 64, threshold: float = 0.9,
                   col: str = "embedding", id_col: str = "vec_id",
                   seed: int = 13, max_iters: int = 10,
                   cluster_cap: int = 8192, num_parts: int = 16):
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): k-means clusters as
    the blocking structure, then cosine near-duplicate groups WITHIN
    each cluster, keeping the lowest id of every group.

    Returns ds(vec_id, keeper): keeper == vec_id for survivors; filter
    `vec_id != keeper` for the drop list.  Exact within a cluster
    (all-pairs + local union-find over >= threshold edges); pairs whose
    members land in different clusters are missed by design — that is
    the recall/cost dial every blocking dedup trades on (same contract
    as the MinHash-LSH banding path).

    Skew guard: clusters larger than ``cluster_cap`` compare every
    member against the cap lowest-id members only (the LSH hot-bucket
    star-cap precedent) — bounded O(s * cap) instead of O(s^2).
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold in (0, 1]: {threshold}")
    cent, _ = kmeans(embeddings, k, col=col, id_col=id_col,
                     max_iters=max_iters, seed=seed)
    assigned = kmeans_assign(embeddings, cent, col=col, id_col=id_col)
    from ..ops.join import hash_join

    withc = hash_join(embeddings, assigned, on=id_col, right_on=id_col,
                      num_parts=num_parts)

    def per_cluster(g: pa.Table) -> pa.Table:
        ids, m = _mat(g, id_col, col)
        order = np.argsort(ids, kind="stable")
        ids, m = ids[order], m[order]
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        m = m / n
        s = len(ids)
        parent = np.arange(s)

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        heads = min(s, cluster_cap)
        sims = m @ m[:heads].T  # (s, heads); full all-pairs when small
        ii, jj = np.nonzero(sims >= threshold)
        for i, j in zip(ii, jj):
            if i == j:
                continue
            ri, rj = find(i), find(j)
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)
        roots = np.array([find(i) for i in range(s)])
        return pa.table({id_col: pa.array(ids),
                         "keeper": pa.array(ids[roots])})

    from ..ops._util import pre_shuffle

    return (pre_shuffle(withc).groupby("cluster")
            .map_groups(per_cluster, batch_format="pyarrow",
                        retry_exceptions=True))


def kmeans_parallel_init(embeddings, k: int, *,
                         col: str = "embedding",
                         id_col: str = "vec_id",
                         rounds: int = 5,
                         oversample: float = None,
                         seed: int = 13) -> np.ndarray:
    """k-means|| seeding (Bahmani et al. 2012, "Scalable k-means++"):
    ``rounds`` distributed oversampling passes, each keeping every row
    independently with probability min(1, l * d^2(x, C) / phi(C))
    (l = ``oversample``, default 2k), then weighted sequential
    k-means++ over the <= ~l*rounds candidates on the driver.

    Two streaming passes per round (phi reduce + hash-draw sample) +
    one final weighting pass; driver state is the candidate set only.
    All draws are stateless splitmix hashes of (row id, round, seed)
    — deterministic and layout-independent.  Returns (k, d) centroids
    for kmeans(init=...).
    """
    from .hashing import stable_hash64

    if k < 1:
        raise ValueError("k must be >= 1")
    ell = 2.0 * k if oversample is None else float(oversample)

    # first center: the stable-hash row pick (same rule as _hash_init
    # at k=1) — deterministic, no data-order dependence
    cand = _hash_init(embeddings, 1, id_col, col, seed)

    def d2_parts(b: pa.Table, c) -> pa.Table:
        _, m = _mat(b, id_col, col)
        cc = 0.5 * (c * c).sum(axis=1)
        s = cc[None, :] - m @ c.T
        best = s.min(axis=1)
        d2 = np.maximum((m * m).sum(axis=1) + 2.0 * best, 0.0)
        return pa.table({"phi": pa.array([float(d2.sum())])})

    def sample(b: pa.Table, c, phi, r) -> pa.Table:
        ids, m = _mat(b, id_col, col)
        cc = 0.5 * (c * c).sum(axis=1)
        s = cc[None, :] - m @ c.T
        best = s.min(axis=1)
        d2 = np.maximum((m * m).sum(axis=1) + 2.0 * best, 0.0)
        p = np.minimum(1.0, ell * d2 / phi) if phi > 0 else \
            np.zeros(len(ids))
        h = stable_hash64(pa.array(ids), seed=seed + 1000 * (r + 1))
        # stable_hash64 is 63-bit (top bit clear): >>11 leaves 52
        # random bits, so the scale is 2^-52 for U[0,1)
        u = (h.astype(np.uint64) >> np.uint64(11)).astype(
            np.float64) * 2.0 ** -52
        keep = u < p
        d = m.shape[1]
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(m[keep].ravel(), type=pa.float64()), d)
        return pa.table({id_col: pa.array(ids[keep]), col: arr})

    for r in range(rounds):
        c = cand
        phi = float(embeddings.map_batches(
            lambda b, c=c: d2_parts(b, c), batch_format="pyarrow",
            zero_copy_batch=True).to_pandas()["phi"].sum())
        if phi <= 0.0:
            break  # every row is already a candidate (exact cover)
        picked = embeddings.map_batches(
            lambda b, c=c, phi=phi, r=r: sample(b, c, phi, r),
            batch_format="pyarrow", zero_copy_batch=True).to_pandas()
        if len(picked):
            new = np.vstack([np.asarray(v, dtype=np.float64)
                             for v in picked[col]])
            ids = picked[id_col].to_numpy()
            order = np.argsort(ids, kind="stable")
            cand = np.vstack([cand, new[order]])

    # weight candidates by the size of their nearest-assignment cell
    c = cand
    cc = 0.5 * (c * c).sum(axis=1)

    def wparts(b: pa.Table) -> pa.Table:
        _, m = _mat(b, id_col, col)
        a = (cc[None, :] - m @ c.T).argmin(axis=1)
        w = np.bincount(a, minlength=len(c)).astype(np.int64)
        return pa.table({"cid": pa.array(np.arange(len(c),
                                                   dtype=np.int64)),
                         "w": pa.array(w)})

    wp = embeddings.map_batches(wparts, batch_format="pyarrow",
                                zero_copy_batch=True).to_pandas()
    w = wp.groupby("cid", sort=True)["w"].sum().to_numpy()

    # sequential weighted k-means++ over the tiny candidate set
    if len(cand) <= k:
        return cand
    rng_u = lambda i, salt: (  # stateless draws, candidate-indexed
        (stable_hash64(pa.array(np.asarray([i], dtype=np.int64)),
                       seed=seed + 7777 + salt).astype(np.uint64)
         >> np.uint64(11)).astype(np.float64) * 2.0 ** -52)[0]
    chosen = [int(np.argmax(w))]  # heaviest candidate first
    d2c = ((cand - cand[chosen[0]]) ** 2).sum(axis=1)
    for t in range(1, k):
        probs = w * d2c
        tot = probs.sum()
        if tot <= 0:
            # degenerate: all remaining mass at chosen points — take
            # heaviest unchosen
            rest = [i for i in range(len(cand)) if i not in chosen]
            chosen.append(int(rest[int(np.argmax(w[rest]))]))
        else:
            u = rng_u(t, 0) * tot
            nxt = int(np.searchsorted(np.cumsum(probs), u,
                                      side="right"))
            nxt = min(nxt, len(cand) - 1)
            chosen.append(nxt)
        d2c = np.minimum(d2c,
                         ((cand - cand[chosen[-1]]) ** 2).sum(axis=1))
    return cand[np.asarray(chosen, dtype=np.int64)]


def _dbscan_past_cap(emb, pairs, *, min_pts: int, num_parts: int,
                     workdir: Optional[str]):
    """The >``pair_cap`` DBSCAN regime: identical label semantics to
    the driver union-find path, with every stage distributed — degree
    aggregation as a grouped count, core-core connected components on
    the shard-actor CC engine (graph/components.py, the same engine
    the curation near-dup past-cap path uses), border resolution as a
    bucketed join + grouped min, and final assignment as two left
    joins.  Driver state is O(1) scalars; labels are exact integer
    quantities, so the output is bitwise equal to the under-cap path
    on any layout (pinned in tests/test_dbscan.py)."""
    import os
    import shutil
    import tempfile

    import pyarrow.compute as pc

    from ..fixtures import even_offsets
    from ..graph.components import connected_components
    from ..ops.agg import grouped_aggregate
    from ..ops.join import hash_join

    vid_only = emb.select_columns(["vec_id"]).materialize()
    n = int(vid_only.max("vec_id") or 0) + 1

    def sym(b: pa.Table) -> pa.Table:
        a = b.column("a").to_numpy()
        bb = b.column("b").to_numpy()
        return pa.table({
            "v": pa.array(np.concatenate([a, bb]), type=pa.int64()),
            "w": pa.array(np.concatenate([bb, a]), type=pa.int64())})

    sym_pairs = pairs.map_batches(sym, batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()

    vid_schema = pa.schema([("vec_id", pa.int64())])
    if min_pts <= 1:
        # every point's neighborhood (itself included) >= 1: all core
        core = vid_only
    else:
        deg = grouped_aggregate(
            sym_pairs.select_columns(["v"]), ["v"],
            {"deg": ("count", None)}, num_parts=num_parts)
        core = deg.map_batches(
            lambda b: pa.table({"vec_id": b.filter(
                pc.greater_equal(b.column("deg"),
                                 pa.scalar(min_pts - 1, pa.int64()))
            ).column("v")}),
            batch_format="pyarrow", zero_copy_batch=True).materialize()

    vw_schema = pa.schema([("v", pa.int64()), ("w", pa.int64())])
    # core-core edges: two bucketed semi joins (core can be ~corpus
    # sized — never broadcast)
    cc_half = hash_join(sym_pairs, core, on="v", right_on="vec_id",
                        join_type="semi", num_parts=num_parts,
                        left_schema=vw_schema, right_schema=vid_schema)
    cc_edges = hash_join(cc_half, core, on="w", right_on="vec_id",
                         join_type="semi", num_parts=num_parts,
                         left_schema=vw_schema,
                         right_schema=vid_schema).map_batches(
        lambda b: pa.table({"src": b.column("v"),
                            "dst": b.column("w")}),
        batch_format="pyarrow", zero_copy_batch=True)

    wd = workdir or tempfile.mkdtemp(prefix="hgr_dbscan_",
                                     dir="/tmp")
    cc_wd = os.path.join(wd, "dbscan_cc")
    # CC lineage does not fingerprint edge content; never adopt a
    # stale checkpoint from a previous pair set
    shutil.rmtree(cc_wd, ignore_errors=True)
    cc_parts = min(16, max(1, n // 64))
    labels, _ = connected_components(
        cc_edges, even_offsets(n, cc_parts), cc_wd, job="dbscan_cc")
    # restrict CC's full [0, n) vertex range to actual core points
    # (isolated cores keep label == self, as in the union-find path)
    lab_schema = pa.schema([("vid", pa.int64()),
                            ("label", pa.int64())])
    core_lab = hash_join(
        labels.map_batches(
            lambda b: pa.table({"vid": b.column("vid"),
                                "label": b.column("label")}),
            batch_format="pyarrow", zero_copy_batch=True),
        core, on="vid", right_on="vec_id", join_type="semi",
        num_parts=num_parts, left_schema=lab_schema,
        right_schema=vid_schema).materialize()

    # border: non-core endpoint v of a pair whose other end w is core
    # -> min label among its core neighbors
    cand = hash_join(
        sym_pairs, core_lab, on="w", right_on="vid",
        join_type="inner", num_parts=num_parts,
        left_schema=vw_schema, right_schema=lab_schema,
        right_cols=["label"])
    cand_schema = pa.schema([("w", pa.int64()), ("v", pa.int64()),
                             ("label", pa.int64())])
    noncore_cand = hash_join(
        cand, core, on="v", right_on="vec_id", join_type="anti",
        num_parts=num_parts, left_schema=cand_schema,
        right_schema=vid_schema)
    border = grouped_aggregate(
        noncore_cand.select_columns(["v", "label"]), ["v"],
        {"blabel": ("min", "label")}, num_parts=num_parts)

    # assignment: two left joins over the id column, then a stateless
    # coalesce into (cluster, role)
    with_core = hash_join(
        vid_only, core_lab, on="vec_id", right_on="vid",
        join_type="left", num_parts=num_parts,
        left_schema=vid_schema, right_schema=lab_schema,
        right_cols=["label"])
    wc_schema = pa.schema([("vec_id", pa.int64()),
                           ("label", pa.int64())])
    with_border = hash_join(
        with_core, border, on="vec_id", right_on="v",
        join_type="left", num_parts=num_parts,
        left_schema=wc_schema,
        right_schema=pa.schema([("v", pa.int64()),
                                ("blabel", pa.int64())]),
        right_cols=["blabel"])

    def finish(b: pa.Table) -> pa.Table:
        lab = b.column("label")
        blab = b.column("blabel")
        is_core = pc.is_valid(lab)
        is_border = pc.and_(pc.invert(is_core), pc.is_valid(blab))
        cluster = pc.coalesce(lab, blab,
                              pa.scalar(-1, pa.int64()))
        role = pc.if_else(is_core, pa.scalar("core"),
                          pc.if_else(is_border, pa.scalar("border"),
                                     pa.scalar("noise")))
        return pa.table({"vec_id": b.column("vec_id"),
                         "cluster": cluster,
                         "role": role})

    return with_border.map_batches(finish, batch_format="pyarrow",
                                   zero_copy_batch=True)


def dbscan_cosine(embeddings, *, threshold: float = 0.8,
                  min_pts: int = 4, col: str = "embedding",
                  pair_cap: int = 2_000_000, num_parts: int = 16,
                  workdir: Optional[str] = None):
    """DBSCAN over the cosine eps-neighbor graph (Ester 1996), the
    density companion to kmeans/SemDeDup: arbitrary-shape clusters +
    an explicit NOISE class (kmeans forces every junk vector into some
    cluster; DBSCAN names it).

    eps-neighborhood = cosine >= ``threshold``; a point is CORE when
    its neighborhood (itself included) holds >= ``min_pts`` points;
    clusters = connected components of the core-core graph, labeled by
    min core vec_id; non-core points with a core neighbor are BORDER
    (assigned the min label among their core neighbors — the
    deterministic resolution of DBSCAN's border ambiguity); the rest
    is NOISE (cluster = -1).

    Plan: one exact pair pass (functions/similarity.py::cosine_pairs —
    swap in the LSH variant for the 100 TB path), one degree
    aggregation, core-core CC via the driver union-find under
    ``pair_cap`` (the curation-pipeline regime split,
    pipelines/curation.py:162-228; past the cap the shard-actor CC
    engine takes over — see _dbscan_past_cap — with every label stage
    a grouped aggregate or bucketed join, nothing pair- or
    corpus-proportional on the driver).  Both regimes yield bitwise
    the same labels (tests/test_dbscan.py pins pair_cap=0 parity).
    ``workdir`` holds the past-cap CC engine's shard layer (a temp dir
    under /tmp when unset).  Returns a Dataset
    (vec_id, cluster, role).
    """
    import pandas as pd
    import ray
    import ray.data as rd

    from .similarity import cosine_pairs

    if min_pts < 1:
        raise ValueError("min_pts must be >= 1")

    emb = embeddings.select_columns(["vec_id", col]).materialize()
    pairs = cosine_pairs(emb, threshold, col=col).materialize()

    # cap check FIRST (before any work proportional to pair volume)
    n_pairs = pairs.count()
    if n_pairs > pair_cap:
        return _dbscan_past_cap(emb, pairs, min_pts=min_pts,
                                num_parts=num_parts, workdir=workdir)
    if n_pairs:
        tbl = pa.concat_tables([t for t in
                                ray.get(pairs.to_arrow_refs())
                                if t.num_rows])
        a = tbl.column("a").to_numpy()
        b2 = tbl.column("b").to_numpy()
    else:
        a = b2 = np.array([], dtype=np.int64)
    # degrees on the (under-cap) driver arrays — the distributed
    # aggregate would duplicate this exact work
    ends, cnts = np.unique(np.concatenate([a, b2]),
                           return_counts=True)
    if min_pts <= 1:
        # every point's neighborhood (itself included) >= 1: ALL
        # points are core — including isolated ones absent from pairs
        core_ids = np.sort(emb.select_columns(["vec_id"]).to_pandas()
                           ["vec_id"].to_numpy().astype(np.int64))
    else:
        core_ids = np.sort(ends[cnts >= min_pts - 1].astype(np.int64))
    is_core_a = np.isin(a, core_ids)
    is_core_b = np.isin(b2, core_ids)
    cc_a, cc_b = a[is_core_a & is_core_b], b2[is_core_a & is_core_b]
    parent = np.arange(len(core_ids))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ia = np.searchsorted(core_ids, cc_a)
    ib = np.searchsorted(core_ids, cc_b)
    for x, y in zip(ia, ib):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    core_label = core_ids[np.array([find(i)
                                    for i in range(len(core_ids))],
                                   dtype=np.int64)] \
        if len(core_ids) else np.array([], dtype=np.int64)
    lab = dict(zip(core_ids.tolist(), core_label.tolist()))

    # border: min core-neighbor label per non-core endpoint
    border: dict = {}
    for v, w in zip(np.concatenate([a, b2]), np.concatenate([b2, a])):
        if v not in lab and w in lab:
            cand = lab[int(w)]
            if int(v) not in border or cand < border[int(v)]:
                border[int(v)] = cand

    lab_ref = ray.put((lab, border))

    def assign(b: pa.Table) -> pa.Table:
        labs, borders = ray.get(lab_ref)
        vid = b.column("vec_id").to_pylist()
        cl = np.empty(len(vid), dtype=np.int64)
        role = []
        for i, v in enumerate(vid):
            if v in labs:
                cl[i] = labs[v]
                role.append("core")
            elif v in borders:
                cl[i] = borders[v]
                role.append("border")
            else:
                cl[i] = -1
                role.append("noise")
        return pa.table({"vec_id": b.column("vec_id"),
                         "cluster": pa.array(cl),
                         "role": pa.array(role, type=pa.string())})

    return emb.select_columns(["vec_id"]).map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True)
