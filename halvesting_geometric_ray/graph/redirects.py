"""Redirect-chain resolution: iterated pointer doubling over a
functional mapping.

A crawl's redirect table (url -> target) is a FUNCTIONAL graph: every
vertex has at most one out-pointer.  Resolving each url to its terminal
target (the page that actually serves content) is the canonical
pre-join normalization pass of a web corpus — link edges, dedup keys
and rank mass all want the terminal url.  The reference normalizes
citation targets by exact-title joins (reference
link_prediction_metadata.py:193-339); redirect resolution is the web
analogue over Common-Crawl-style pages.

Algorithm: pointer DOUBLING (the pointer-jumping half of the CC engine,
graph/components.py, specialised to out-degree 1): with m the partial
mapping and missing keys implicit identity (terminals),

    m_{k+1}(v) = m_k(m_k(v)),   h_{k+1}(v) = h_k(v) + h_k(m_k(v))

so after r rounds every v sits at its position after exactly
min(2^r, hops-to-terminal) steps, with the hop count carried along.
Cycles (redirect loops — they exist in real crawls) never reach a
terminal and deterministically report hops = 2^r; callers treat
hops == 2^r as "loop or chain longer than the bound".

Each round is ONE bucketed self-join of the mapping table (string
keys — no id assignment needed), so resolving chains up to length
2^r costs r joins over |mapping| rows: the all-to-all volume is
r * |mapping|, never |mapping| * chain-length.  No driver state.
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa

from ..config import DEFAULT, EngineConfig
from ..ops.join import hash_join

_I64 = pa.int64()


def resolve_pointers(mapping, cfg: EngineConfig = DEFAULT, *,
                     key: str = "src", val: str = "dst",
                     rounds: int = 5) -> "object":
    """mapping: Dataset with (key, val) string or int columns, at most
    one row per key (a functional graph; callers derive it, e.g.
    min-target per source).  Self-pointers are treated as terminals
    and dropped from the chase.  Returns a Dataset
    (key, final, hops:int64) over every non-self mapping key: the
    position after min(2^rounds, hops-to-terminal) steps (rounds
    SQUARINGS on top of the 1-hop init)."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")


    def init(b: pa.Table) -> pa.Table:
        k = b.column(key)
        v = b.column(val)
        import pyarrow.compute as pc

        keep = pc.invert(pc.equal(k, v))
        t = pa.table({"k": k, "t": v}).filter(keep)
        return t.append_column(
            "hops", pa.array(np.ones(t.num_rows, dtype=np.int64)))

    cur = mapping.map_batches(init, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    kt = cur.schema().base_schema.field("k").type
    c_schema = pa.schema([pa.field("k", kt), pa.field("t", kt),
                          pa.field("hops", _I64)])

    r_schema = pa.schema([pa.field("k2", kt), pa.field("t2", kt),
                          pa.field("h2", _I64)])
    for _ in range(rounds):
        rhs = cur.map_batches(
            lambda b: b.rename_columns(["k2", "t2", "h2"]),
            batch_format="pyarrow", zero_copy_batch=True)
        # output columns: join key first, then left payload, then
        # right payload -> (t, k, hops, t2, h2)
        nxt = hash_join(cur, rhs, on="t", right_on="k2",
                        join_type="left", num_parts=cfg.num_parts,
                        left_schema=c_schema, right_schema=r_schema)

        def step(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            t2 = b.column("t2")
            adv = pc.is_valid(t2)
            t = pc.if_else(adv, t2, b.column("t"))
            h = pc.add(b.column("hops"),
                       pc.if_else(adv, b.column("h2"),
                                  pa.scalar(0, type=_I64)))
            return pa.table({"k": b.column("k"), "t": t, "hops": h})

        cur = nxt.map_batches(step, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    return cur.map_batches(
        lambda b: pa.table({"k": b.column("k"), "final": b.column("t"),
                            "hops": b.column("hops")}),
        batch_format="pyarrow", zero_copy_batch=True)
