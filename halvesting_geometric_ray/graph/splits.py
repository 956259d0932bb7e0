"""Edge splits + negative sampling (R1 of SURVEY.md section 2.7).

The reference's RandomLinkSplit + negative sampling
(link_prediction_datamodule.py:127-134, ratio 2.0) re-expressed
deterministically: split membership is a pure function of the edge via a
seeded stable hash (order/parallelism-independent — no global shuffle),
and negative samples are seeded non-edge pairs verified by an anti-join
against the edge table.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..config import DEFAULT, EngineConfig
from ..functions.hashing import stable_hash_pair64
from ..ops.join import hash_join

_BUCKETS = 10_000


def split_edges(edges, fractions: Optional[Dict[str, float]] = None,
                seed: int = 17):
    """Adds a `split` column ('train'/'val'/'test') — deterministic per
    edge under any parallelism (hash-bucketed, not sampled)."""
    fr = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    names = list(fr.keys())
    cuts = np.cumsum([fr[n] for n in names])
    assert abs(cuts[-1] - 1.0) < 1e-9
    thresholds = (cuts * _BUCKETS).astype(np.int64)

    def assign(b: pa.Table) -> pa.Table:
        h = stable_hash_pair64(b.column("src"), b.column("dst"),
                               seed=seed) % _BUCKETS
        idx = np.searchsorted(thresholds, h, side="right")
        lab = np.array(names, dtype=object)[idx]
        return b.append_column("split", pa.array(list(lab), type=pa.string()))

    return edges.map_batches(assign, batch_format="pyarrow",
                             zero_copy_batch=True)


def negative_sample(edges, n_vertices: int, n_samples: int,
                    seed: int = 23, cfg: EngineConfig = DEFAULT,
                    oversample: float = 2.5):
    """n_samples seeded (src, dst) pairs that are NOT edges (and not
    self-loops): candidate pairs -> anti-join against the edge table ->
    deterministic head (ordered by pair hash).  Oversamples to cover
    anti-join losses; on dense graphs raise `oversample`."""
    rng = np.random.default_rng(seed)
    k = int(n_samples * oversample)
    src = rng.integers(0, n_vertices, size=k, dtype=np.int64)
    dst = rng.integers(0, n_vertices, size=k, dtype=np.int64)
    m = src != dst
    cand = pa.table({"src": pa.array(src[m]), "dst": pa.array(dst[m])})
    cand_ds = rd.from_arrow(cand)
    pair_schema = pa.schema([pa.field("src", pa.int64()),
                             pa.field("dst", pa.int64())])
    non_edges = hash_join(cand_ds, edges, on=["src", "dst"],
                          join_type="anti", num_parts=cfg.num_parts,
                          left_schema=pair_schema, right_schema=pair_schema)

    def order_key(b: pa.Table) -> pa.Table:
        h = stable_hash_pair64(b.column("src"), b.column("dst"), seed=seed + 1)
        return b.append_column("__h", pa.array(h))

    out = (non_edges.map_batches(order_key, batch_format="pyarrow",
                                 zero_copy_batch=True)
           .sort("__h").limit(n_samples))
    return out.drop_columns(["__h"])
