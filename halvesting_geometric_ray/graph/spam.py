"""TrustRank / spam mass — link-spam detection (Gyongyi et al. 2004,
"Combating Web Spam with TrustRank").

TrustRank is personalized PageRank restarted on a vetted seed set of
good pages: trust flows OUT along links, so pages reachable only
through spam structures accumulate little of it.  Spam mass compares a
page's PageRank with the fraction of it that is trust-backed:

    spam_mass(v) = (pr(v) - trust(v)) / pr(v)

~1 for pages whose rank comes from spam structures (link farms), ~<=0
for seed-adjacent pages.  Both vectors come from the SAME
graph/pagerank.py engine (classic run + seeds= run), so the operator is
a pure composition of two certified fixpoints plus one bucketed join —
no new iteration machinery, and the two runs share the directed CSR
shard cache.

Scale note: trust is computed with the same damping as pr and the
seed-uniform restart; the relative-mass variant of the paper.  Vertices
with pr == 0 cannot occur (PageRank lower-bounds every vertex at
(1-d)/N > 0).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..config import DEFAULT, EngineConfig


def spam_mass(edges, offsets: np.ndarray, workdir: str,
              seeds: np.ndarray, cfg: EngineConfig = DEFAULT, *,
              damping: Optional[float] = None,
              tol: Optional[float] = None,
              num_actors: int = 0) -> Tuple["rd.Dataset", Dict]:
    """Returns (ds(vid, pr, trust, spam_mass), info) over the directed
    edge table; `seeds` is the vetted good-page vid set.  info carries
    both PageRank runs' convergence records."""
    from ..ops.join import hash_join
    from .pagerank import pagerank

    seeds = np.unique(np.asarray(seeds, dtype=np.int64))
    pr_ds, pr_info = pagerank(edges, offsets, workdir, cfg,
                              damping=damping, tol=tol, job="pagerank",
                              num_actors=num_actors)
    tr_ds, tr_info = pagerank(edges, offsets, workdir, cfg,
                              damping=damping, tol=tol, job="trustrank",
                              seeds=seeds, num_actors=num_actors)
    i64, f64 = pa.int64(), pa.float64()
    pr2 = pr_ds.map_batches(
        lambda b: pa.table({"vid": b.column("vid"),
                            "pr": b.column("rank")}),
        batch_format="pyarrow", zero_copy_batch=True)
    tr2 = tr_ds.map_batches(
        lambda b: pa.table({"vid": b.column("vid"),
                            "trust": b.column("rank")}),
        batch_format="pyarrow", zero_copy_batch=True)
    j = hash_join(pr2, tr2, on="vid", right_on="vid",
                  num_parts=cfg.num_parts,
                  left_schema=pa.schema([("vid", i64), ("pr", f64)]),
                  right_schema=pa.schema([("vid", i64), ("trust", f64)]))

    def fin(b: pa.Table) -> pa.Table:
        pr = b.column("pr").to_numpy()
        tr = b.column("trust").to_numpy()
        return pa.table({"vid": b.column("vid"), "pr": b.column("pr"),
                         "trust": b.column("trust"),
                         "spam_mass": pa.array((pr - tr) / pr)})

    out = j.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)
    info = {"seeds": [int(s) for s in seeds],
            "pagerank_iters": pr_info["num_iters"],
            "trustrank_iters": tr_info["num_iters"]}
    return out, info
