"""Monte-Carlo SimRank (Fogaras & Racz, WWW 2005 "Scaling link-based
similarity search"): s(u, v) = E[c^tau] where tau is the FIRST MEETING
TIME of two independent reverse random walks started at u and v — the
scalable estimator for Jeh & Widom's SimRank

    s(u, v) = c / (|I(u)||I(v)|) * sum_{i in I(u), j in I(v)} s(i, j),
    s(u, u) = 1,

whose exact fixpoint carries O(n^2) state and is intractable beyond
toy graphs.  The MC estimator needs only walk storage: SimRank's
recursion over IN-neighbor pairs is exactly the coupling of two
uniform in-edge walks, and walks that leave an in-degree-0 vertex
stop (tau = infinity contributes 0, matching |I| = 0 => s = 0).

Scale shape for a seed set of k vertices (the honest regime — all-pairs
SimRank over 10^12 pages is off the table for ANY engine):

- k * R reverse walks of length L ride the existing walk engine
  (graph/walks.py — stateless-hash draws on cached CSR shards of the
  REVERSED edge table), O(k R L) rows total;
- meetings are found by ONE key-partitioned exchange on (walk repeat
  r, step, vid) — walks from different seeds sharing all three met
  there; per-bucket pair emission is bounded by k per group;
- first-meeting times reduce via exact integer grouped mins/counts;
  the final fold (<= k^2 L count rows) runs on the driver in sorted
  (a, b, tau) order, so scores are BITWISE independent of
  partitioning and actor layout.

Estimator bias/variance: truncation adds at most c^L (walks longer
than L never meet); per-pair standard error <= 0.5/sqrt(R).  Both are
pinned against an exact O(n^2) fixpoint oracle in tests/test_simrank.py.

Reference anchor: link-similarity search over the citation graph the
reference builds (link_prediction_dataset.py:50-75); Jeh & Widom 2002
for the recursion, Fogaras & Racz 2005 theorem 2 for E[c^tau].
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..config import DEFAULT, EngineConfig
from ..ops._util import pre_shuffle
from ..ops.agg import grouped_aggregate
from ..ops.dedup import _PART_COL, _add_key_part


def simrank_mc(edges, offsets: np.ndarray, workdir: str,
               seeds, cfg: EngineConfig = DEFAULT, *,
               c: float = 0.6, walk_len: int = 12,
               walks_per_seed: int = 128, seed: int = 42,
               include_diagonal: bool = True,
               num_actors: int = 0) -> Tuple[pd.DataFrame, Dict]:
    """SimRank estimates for all pairs within a bounded seed set.

    Returns ``(DataFrame(a, b, simrank) with a < b (vids), info)``;
    pairs whose walks never met are omitted (estimate 0).  With
    ``include_diagonal`` the exact s(u,u)=1 rows are appended.
    """
    from .walks import random_walks

    if not 0.0 < c < 1.0:
        raise ValueError("c must be in (0, 1)")
    seeds = np.unique(np.asarray(list(seeds), dtype=np.int64))
    if seeds.size < 2:
        raise ValueError("need at least 2 seed vertices")
    R = int(walks_per_seed)

    def rev(b: pa.Table) -> pa.Table:
        return pa.table({"src": b.column("dst"), "dst": b.column("src")})

    walks, winfo = random_walks(
        edges.map_batches(rev, batch_format="pyarrow",
                          zero_copy_batch=True),
        offsets, workdir, cfg, starts=seeds, walks_per_vertex=R,
        walk_len=walk_len, seed=seed,
        shards_dir=os.path.join(workdir, "csr_rev"),
        lineage={"kind": "reversed"}, num_actors=num_actors)

    def tag(b: pa.Table) -> pa.Table:
        wid = b.column("walk_id").to_numpy(zero_copy_only=False)
        t = pa.table({
            "r": pa.array(wid % R),
            "step": b.column("step"),
            "vid": b.column("vid"),
            "s": pa.array(wid // R),
        })
        return _add_key_part(t, ["r", "step", "vid"], cfg.num_parts)

    tagged = walks.map_batches(tag, batch_format="pyarrow",
                               zero_copy_batch=True)

    def meet_pairs(g: pa.Table) -> pa.Table:
        df = (g.select(["r", "step", "vid", "s"]).to_pandas()
              .sort_values(["r", "step", "vid", "s"], kind="stable"))
        r = df["r"].to_numpy()
        st = df["step"].to_numpy()
        vid = df["vid"].to_numpy()
        s = df["s"].to_numpy()
        new = np.flatnonzero(np.r_[True, (r[1:] != r[:-1]) |
                                   (st[1:] != st[:-1]) |
                                   (vid[1:] != vid[:-1])])
        ends = np.r_[new[1:], r.size]
        a_out, b_out, r_out, t_out = [], [], [], []
        for g0, g1 in zip(new, ends):
            k = g1 - g0
            if k < 2:
                continue
            mem = s[g0:g1]          # each seed appears at most once
            ii, jj = np.triu_indices(k, 1)
            a_out.append(mem[ii])
            b_out.append(mem[jj])
            r_out.append(np.full(ii.size, r[g0], dtype=np.int64))
            t_out.append(np.full(ii.size, st[g0], dtype=np.int64))
        if not a_out:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64()),
                             "r": pa.array([], type=pa.int64()),
                             "step": pa.array([], type=pa.int64())})
        return pa.table({"a": pa.array(np.concatenate(a_out)),
                         "b": pa.array(np.concatenate(b_out)),
                         "r": pa.array(np.concatenate(r_out)),
                         "step": pa.array(np.concatenate(t_out))})

    meets = (pre_shuffle(tagged).groupby(_PART_COL)
             .map_groups(meet_pairs, batch_format="pyarrow",
                         retry_exceptions=True))
    tau = grouped_aggregate(meets, ["a", "b", "r"],
                            {"tau": ("min", "step")},
                            num_parts=cfg.num_parts)
    cnt = grouped_aggregate(
        tau.select_columns(["a", "b", "tau"]), ["a", "b", "tau"],
        {"n": ("count", None)}, num_parts=cfg.num_parts)
    # final fold: <= k^2 * walk_len exact-integer rows, post-reduction
    pdf = cnt.to_pandas()
    info: Dict = {"n_seeds": int(seeds.size), "walks_per_seed": R,
                  "walk_len": walk_len, "c": c,
                  "meet_rows": int(len(pdf)),
                  "walk_rounds": winfo.get("num_rounds",
                                           winfo.get("iters"))}
    if len(pdf):
        pdf = pdf.sort_values(["a", "b", "tau"], kind="stable")
        w = pdf["n"].to_numpy() * np.power(c, pdf["tau"].to_numpy(
            dtype=np.float64))
        pdf = pdf.assign(w=w)
        score = (pdf.groupby(["a", "b"], sort=True)["w"].sum() / R)
        out = score.reset_index().rename(columns={"w": "simrank"})
        out["a"] = seeds[out["a"].to_numpy()]
        out["b"] = seeds[out["b"].to_numpy()]
    else:
        out = pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                            "b": pd.Series([], dtype=np.int64),
                            "simrank": pd.Series([], dtype=np.float64)})
    if include_diagonal:
        diag = pd.DataFrame({"a": seeds, "b": seeds,
                             "simrank": np.ones(seeds.size)})
        out = pd.concat([out, diag], ignore_index=True)
    out = out.sort_values(["a", "b"], kind="stable").reset_index(drop=True)
    return out, info
