"""Reciprocal rank fusion of per-group rankings.

The standard zero-training method for combining retrieval rankings
(Cormack, Clarke & Buettcher 2009): item score = sum over input
rankings of 1 / (k + rank), k=60 canonical.  Here the "query" is any
partition column — fuse per-host page rankings, per-query ANN candidate
lists, per-language quality orderings.

Scale shape: each input ranking is one key-partitioned exchange
(ops/window.py::row_number — rankings live inside their partition, no
global sort), the fusion is one grouped float sum.  With two input
rankings the fused score is a two-term IEEE sum (commutative), so
results are bitwise partition-order-independent — the gate query
exploits that for a check_exact DuckDB oracle.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import pyarrow as pa

from ..config import DEFAULT, EngineConfig
from .agg import grouped_aggregate
from .window import row_number


def reciprocal_rank_fusion(inputs: Sequence[Tuple["object", str, bool]],
                           *, partition_by: str, key: str, k: int = 60,
                           out_col: str = "rrf",
                           cfg: EngineConfig = DEFAULT):
    """inputs: sequence of (dataset, score_col, descending) — each
    dataset carries (partition_by, key, score_col); items are ranked
    within each partition by score (ties broken by key ascending, so
    every ranking is total and deterministic).  Returns
    (partition_by, key, out_col) with out_col = sum_i 1/(k + rank_i);
    keys absent from a ranking contribute no term (the RRF convention).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if not inputs:
        raise ValueError("need at least one input ranking")
    parts: List = []
    for ds, score_col, desc in inputs:
        ranked = row_number(
            ds.select_columns([partition_by, key, score_col]),
            partition_by, [score_col], descending=bool(desc),
            tie_break=[key], out_col="__rank",
            num_parts=cfg.num_parts)

        def to_term(b: pa.Table) -> pa.Table:
            r = b.column("__rank").to_numpy().astype(np.float64)
            return pa.table({
                partition_by: b.column(partition_by),
                key: b.column(key),
                out_col: pa.array(1.0 / (k + r), type=pa.float64())})

        parts.append(ranked.map_batches(to_term, batch_format="pyarrow",
                                        zero_copy_batch=True))
    u = parts[0]
    for p in parts[1:]:
        u = u.union(p)
    return grouped_aggregate(u, [partition_by, key],
                             {out_col: ("sum", out_col)},
                             num_parts=cfg.num_parts)
