"""Approximate triangle counting by wedge sampling.

Seshadhri, Pinar & Kolda 2013 ("Triadic measures on graphs: the power
of wedge sampling") — the published scale path when the exact
orientation plan (graph/triangles.py) is too expensive: at 10^12
edges the exact wedge semi-join moves sum-of-d^2 rows, while the
estimator's cost is ONE degree pass + K sampled wedges + one bucketed
closure semi-join, for any K.

    total wedges  W = sum_v d(v) (d(v) - 1) / 2
    kappa         = P[uniform random wedge is closed]
    triangles     = kappa * W / 3      (each triangle closes 3 wedges)

Sampling K wedges uniformly is exactly: center v with probability
W(v)/W, then a uniform unordered pair of distinct neighbors of v.
stderr(kappa) <= 1/(2 sqrt(K)), independent of graph size — K is an
accuracy knob, not a scale knob.

Distributed + deterministic:
  - degrees come from the symmetrized CSR shards (shared csr_sym
    cache); per-partition wedge mass reduces to P driver rows;
  - the K global sample slots are allocated to partitions by exact
    largest-remainder apportionment of the wedge masses (deterministic
    integer math on P rows);
  - within a partition, slot t draws its center by inverse-CDF over
    the local per-vertex wedge masses and its neighbor pair (i < j)
    by two stateless splitmix64 hash draws of (seed, global slot) —
    no RNG state.  Reruns at a FIXED (num_parts, seed) are bitwise
    identical; num_parts is a sampling HYPERPARAMETER (the slot ->
    partition apportionment depends on the partition boundaries),
    the same convention as the SGNS shard count and LDG chunking.
    Actor/parallelism layout within a partitioning never matters;
  - closure: the sampled (endpoint_a, endpoint_b) pairs
    (canonicalized min/max) semi-join the canonical undirected edge
    list in one bucketed exchange; kappa = matches / K.

Reference anchor: the exact counter reproduces the reference's
triangle tests (graph/triangles.py); this estimator is its
beyond-reference 100 TB companion, accuracy-pinned against it.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray

from ..config import DEFAULT, EngineConfig
from .csr import load_shard

_I64 = pa.int64()


def _mix(idx: np.ndarray, salt: int, seed: int) -> np.ndarray:
    """U[0,1) per slot index — splitmix64 of (idx, salt, seed)."""
    with np.errstate(over="ignore"):
        h = (idx.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             + np.uint64(2 * salt + 1)
             + np.uint64(seed) * np.uint64(0xD1342543DE82EF95))
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    return (h >> np.uint64(11)).astype(np.float64) * 2.0 ** -53


@ray.remote(num_cpus=1)
def _wedge_mass(path: str) -> float:
    s = load_shard(path)
    d = s["outdeg"].astype(np.float64)
    return float((d * (d - 1.0)).sum() / 2.0)


@ray.remote(num_cpus=1)
def _sample_part(path: str, slot_lo: int, slot_hi: int,
                 seed: int) -> pa.Table:
    """Draw slots [slot_lo, slot_hi) in this partition: inverse-CDF
    center + two hash draws for the unordered neighbor pair."""
    s = load_shard(path)
    lo = s["vid_lo"]
    d = s["outdeg"].astype(np.int64)
    wm = (d * (d - 1)) // 2
    cdf = np.cumsum(wm.astype(np.float64))
    total = cdf[-1] if len(cdf) else 0.0
    k = slot_hi - slot_lo
    if k <= 0 or total <= 0.0:
        return pa.table({"slot": pa.array([], type=_I64),
                         "a": pa.array([], type=_I64),
                         "b": pa.array([], type=_I64)})
    slots = np.arange(slot_lo, slot_hi, dtype=np.int64)
    u = _mix(slots, 0, seed) * total
    centers = np.searchsorted(cdf, u, side="right")
    dv = d[centers]
    # unordered pair (i < j) out of dv neighbors: draw pair index
    # p in [0, dv*(dv-1)/2) and invert the triangular index
    npairs = (dv * (dv - 1)) // 2
    p = np.floor(_mix(slots, 1, seed)
                 * npairs.astype(np.float64)).astype(np.int64)
    p = np.minimum(p, npairs - 1)
    # j = smallest j with j*(j-1)/2 > p  (row of the triangular grid)
    j = np.floor((1.0 + np.sqrt(1.0 + 8.0 * p.astype(np.float64)))
                 / 2.0).astype(np.int64)
    # float-sqrt edge correction
    j = np.where((j * (j - 1)) // 2 > p, j - 1, j)
    j = np.where(((j + 1) * j) // 2 <= p, j + 1, j)
    i = p - (j * (j - 1)) // 2
    indptr, indices = s["indptr"], s["indices"]
    base = indptr[centers]
    a = indices[base + i]
    b = indices[base + j]
    aa = np.minimum(a, b).astype(np.int64)
    bb = np.maximum(a, b).astype(np.int64)
    return pa.table({"slot": pa.array(slots), "a": pa.array(aa),
                     "b": pa.array(bb)})


def approx_triangles(edges, offsets: np.ndarray, workdir: str,
                     cfg: EngineConfig = DEFAULT, *,
                     k_samples: int = 100_000, seed: int = 42,
                     shards_dir: Optional[str] = None
                     ) -> Tuple[Dict, "object"]:
    """Wedge-sampling triangle estimate over the DIRECTED edge table
    (symmetrized internally; shares the csr_sym shard cache).

    Returns (info, closed_wedges_ds): info carries n_wedges, kappa,
    triangles_est, stderr_kappa and the exact-mode comparison fields;
    closed_wedges_ds is the sampled closed wedges (slot, a, b) for
    downstream inspection."""
    import pyarrow.compute as pc

    from ..ops.agg import grouped_aggregate
    from ..ops.join import hash_join
    from .build import symmetrize
    from .csr import build_csr_shards

    if k_samples < 1:
        raise ValueError("k_samples must be >= 1")
    N = int(offsets[-1])
    sym = symmetrize(edges, cfg, dedup=False)
    descs = build_csr_shards(sym, offsets,
                             shards_dir or f"{workdir}/csr_sym",
                             lineage={"kind": "sym"})
    paths = [dd["path"] for dd in sorted(descs,
                                         key=lambda d: d["part"])]
    masses = ray.get([_wedge_mass.remote(p) for p in paths])
    w_total = float(sum(masses))
    info: Dict = {"n_wedges": w_total, "k_samples": k_samples,
                  "seed": seed}
    if w_total <= 0.0:
        info.update(n_closed=0, kappa=0.0, triangles_est=0.0,
                    stderr_kappa=0.0)
        import ray.data as rd

        return info, rd.from_arrow(pa.table(
            {"slot": pa.array([], type=_I64),
             "a": pa.array([], type=_I64),
             "b": pa.array([], type=_I64)}))
    # largest-remainder apportionment of K slots to partitions
    quota = np.asarray(masses, dtype=np.float64) / w_total * k_samples
    base = np.floor(quota).astype(np.int64)
    rem = k_samples - int(base.sum())
    if rem > 0:
        frac = quota - base
        order = np.lexsort((np.arange(len(frac)), -frac))
        base[order[:rem]] += 1
    bounds = np.concatenate([[0], np.cumsum(base)])
    tables = ray.get([
        _sample_part.remote(paths[p], int(bounds[p]),
                            int(bounds[p + 1]), seed)
        for p in range(len(paths)) if bounds[p + 1] > bounds[p]])
    import ray.data as rd

    wedges = rd.from_arrow([t for t in tables if t.num_rows])
    # closure: semi-join against the canonical undirected edge list
    canon = sym.map_batches(
        lambda b: b.filter(pc.less(b.column("src"), b.column("dst"))),
        batch_format="pyarrow", zero_copy_batch=True)

    def pack(b: pa.Table, cols) -> pa.Table:
        x = b.column(cols[0]).to_numpy().astype(np.int64)
        y = b.column(cols[1]).to_numpy().astype(np.int64)
        t = pa.table({"key": pa.array((x << 32) | y)})
        for c in b.column_names:
            t = t.append_column(c, b.column(c))
        return t

    wk = wedges.map_batches(lambda b: pack(b, ("a", "b")),
                            batch_format="pyarrow",
                            zero_copy_batch=True)
    ek = canon.map_batches(
        lambda b: pack(b, ("src", "dst")).select(["key"]),
        batch_format="pyarrow", zero_copy_batch=True)
    closed = hash_join(
        wk, grouped_aggregate(ek, ["key"], {"one": ("count", "key")},
                              num_parts=cfg.num_parts),
        on="key", num_parts=cfg.num_parts,
        left_schema=pa.schema([("key", _I64), ("slot", _I64),
                               ("a", _I64), ("b", _I64)]),
        right_schema=pa.schema([("key", _I64), ("one", _I64)]))
    closed = closed.select_columns(["slot", "a", "b"]).materialize()
    n_closed = closed.count()
    kappa = n_closed / k_samples
    info.update(
        n_closed=int(n_closed), kappa=kappa,
        triangles_est=kappa * w_total / 3.0,
        stderr_kappa=float(np.sqrt(max(kappa * (1 - kappa), 0.0)
                                   / k_samples)))
    return info, closed
