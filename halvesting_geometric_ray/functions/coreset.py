"""Facility-location coreset selection — pick the k most
REPRESENTATIVE vectors: greedy maximization of the submodular
facility-location objective

    F(S) = sum over all points v of  max_{s in S} sim(v, s)

the standard data-subset-selection method for efficient training
(CRAIG / submodular coreset line of work; greedy gives the (1 - 1/e)
guarantee).  Where SemDeDup REMOVES redundancy, this SELECTS coverage
— the complementary curation operator.

Distributed plan, one exchange-free pass per selected item:

  state: per-point best-similarity-so-far ``gain cache`` kept as a
  column on the (materialized) embedding Dataset;
  round: broadcast the CANDIDATE batch (ray.put), one map_batches
  computes each candidate's total marginal gain as per-block partials
  (candidates x 1 floats per block), driver picks the argmax
  (deterministic tie-break on vec_id), appends it to S and updates
  the gain cache with one more map_batches.

``candidates_per_round`` implements stochastic-greedy (Mirzasoleiman
2015): each round evaluates a layout-invariant hash-drawn candidate
subset of size m instead of all n — the (1 - 1/e - eps) guarantee at
k*m gain evaluations total; m=None evaluates every point (exact
greedy, the certification path).

Scale shape: NO shuffle at any point; per round the traffic is one
candidate-matrix broadcast (m x dim floats) + blocks x m partial
floats to the driver.  Driver state is the selected set (k rows).

Reference anchor: the reference samples training neighborhoods
uniformly (link_prediction_datamodule.py:147-191); facility location
is the coverage-aware replacement for exactly that uniform choice.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

import ray

from .hashing import stable_hash64
from .similarity import _mat, _norm


def facility_location_select(embeddings, k: int, *,
                             col: str = "embedding",
                             candidates_per_round: Optional[int] = None,
                             seed: int = 5):
    """Greedy facility-location selection of ``k`` vectors.
    Returns (selected pandas DataFrame (rnk, vec_id, gain), info).
    sim = cosine, clipped at 0 (a facility never hurts coverage)."""
    import pandas as pd

    if k < 1:
        raise ValueError("k must be >= 1")

    emb = embeddings.select_columns(["vec_id", col]).materialize()
    n = emb.count()
    if n == 0:
        raise ValueError("empty embedding table")
    k = min(k, n)

    # gain cache: best similarity to the selected set so far, per point
    cache = emb.map_batches(
        lambda b: b.append_column(
            "__best", pa.array(np.zeros(b.num_rows), type=pa.float64())),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    selected = []
    gains = []
    sel_ids: set = set()
    redraws = 0
    for rnd in range(k):
        # candidate pool: all points, or a hash-drawn subset
        # (hash of (vec_id, seed, round, attempt) -> layout-invariant
        # draw).  Already-selected points are excluded INSIDE the draw
        # (sel set broadcast once per round — k ids, bounded) and the
        # keep modulus tracks the REMAINING pool size, so draws stay
        # ~m-sized however much of the pool is already selected.  An
        # empty draw redraws with a new salt (bounded attempts), then
        # falls to a deterministic min-hash pick — the full pool is
        # NEVER materialized on the driver.
        sel_ref = ray.put(np.fromiter(sel_ids, dtype=np.int64,
                                      count=len(sel_ids))) \
            if sel_ids else None

        def _unsel_mask(b: pa.Table) -> np.ndarray:
            if sel_ref is None:
                return np.ones(b.num_rows, dtype=bool)
            return ~np.isin(b.column("vec_id").to_numpy(),
                            ray.get(sel_ref))

        if candidates_per_round is None:
            cpd = cache.to_pandas()  # exact greedy: the documented
            cpd = cpd[~cpd["vec_id"].isin(sel_ids)]  # certification path
        else:
            m = candidates_per_round
            r_left = n - len(sel_ids)
            mod = max(1, round(r_left / m))
            cpd = None
            for attempt in range(4):
                def draw(b: pa.Table, r=rnd, a=attempt,
                         mod_=mod) -> pa.Table:
                    h = stable_hash64(b.column("vec_id"),
                                      seed=seed + 1000 * r + 7919 * a)
                    keep = (h % mod_ == 0) & _unsel_mask(b)
                    return b.filter(pa.array(keep))

                cpd = cache.map_batches(
                    draw, batch_format="pyarrow",
                    zero_copy_batch=True).to_pandas()
                if len(cpd):
                    break
                redraws += 1
            if cpd is None or len(cpd) == 0:
                # deterministic last resort: global min-(hash, vid)
                # unselected point via per-block 1-row partials
                def min1(b: pa.Table, r=rnd) -> pa.Table:
                    mask = _unsel_mask(b)
                    if not mask.any():
                        return b.slice(0, 0)
                    h = stable_hash64(b.column("vec_id"),
                                      seed=seed + 1000 * r)
                    idx = np.flatnonzero(mask)
                    vid = b.column("vec_id").to_numpy()[idx]
                    j = idx[np.lexsort((vid, h[idx]))[0]]
                    return b.take(pa.array([j], type=pa.int64()))

                cpd = cache.map_batches(
                    min1, batch_format="pyarrow",
                    zero_copy_batch=True).to_pandas()
                h = stable_hash64(pa.array(
                    cpd["vec_id"].to_numpy(), type=pa.int64()),
                    seed=seed + 1000 * rnd)
                cpd = cpd.iloc[[int(np.lexsort(
                    (cpd["vec_id"].to_numpy(), h))[0])]]
        c_ids = cpd["vec_id"].to_numpy()
        c_mat = _norm(np.asarray(
            [np.asarray(v, dtype=np.float64) for v in cpd[col]]))
        cref = ray.put((c_ids, c_mat))

        def gain_part(b: pa.Table) -> pa.Table:
            ids_c, mat_c = ray.get(cref)
            _ids, m_ = _mat(b, col)
            best = b.column("__best").to_numpy()
            sims = np.clip(_norm(m_) @ mat_c.T, 0.0, None)
            # marginal gain of candidate j = sum max(sim - best, 0)
            g = np.maximum(sims - best[:, None], 0.0).sum(axis=0)
            return pa.table({"j": pa.array(
                np.arange(len(ids_c), dtype=np.int64)),
                "g": pa.array(g, type=pa.float64())})

        # gains scan ALL points (the objective sums over the corpus);
        # only the candidate set is restricted
        gp = cache.map_batches(gain_part, batch_format="pyarrow",
                               zero_copy_batch=True)
        tot = gp.to_pandas().groupby("j")["g"].sum()
        g_arr = np.zeros(len(c_ids))
        g_arr[tot.index.to_numpy()] = tot.to_numpy()
        # deterministic pick: max gain, ties -> smallest vec_id
        order = np.lexsort((c_ids, -g_arr))
        best_j = order[0]
        chosen = int(c_ids[best_j])
        selected.append(chosen)
        gains.append(float(g_arr[best_j]))
        sel_ids.add(chosen)
        wref = ray.put(c_mat[best_j])

        def update(b: pa.Table) -> pa.Table:
            w = ray.get(wref)
            _ids, m_ = _mat(b, col)
            s = np.clip(_norm(m_) @ w, 0.0, None)
            best = np.maximum(b.column("__best").to_numpy(), s)
            return b.set_column(
                b.column_names.index("__best"), "__best",
                pa.array(best, type=pa.float64()))

        cache = cache.map_batches(update, batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()

    out = pd.DataFrame({"rnk": np.arange(1, len(selected) + 1,
                                         dtype=np.int64),
                        "vec_id": np.asarray(selected, dtype=np.int64),
                        "gain": np.round(np.asarray(gains), 9)})
    info = {"n": int(n), "k": int(k),
            "objective": float(np.sum(gains)),
            "redraws": int(redraws)}
    return out, info
