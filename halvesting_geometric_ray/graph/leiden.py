"""Leiden-style connectivity refinement for community labelings.

Louvain's known defect (Traag, Waltman & van Eck 2019, "From Louvain
to Leiden: guaranteeing well-connected communities"): local moving +
contraction can leave communities whose induced subgraph is
DISCONNECTED (up to ~25% of communities in their measurements; the
synchronous-hash scheduling graph/louvain.py uses is just as exposed).
Leiden's headline guarantee is that every returned community is
internally connected.  This module delivers that guarantee as a
refinement pass over ANY (vid, community) labeling:

    refined(v) = connected component of v within the subgraph
                 induced by v's community

Splitting a disconnected community into its pieces P1..Pk strictly
INCREASES Newman modularity: intra-edge mass is unchanged (there are
no edges between pieces, by definition of the pieces), while the
degree penalty falls from (sum_i d_i)^2 / (2m)^2 to
sum_i d_i^2 / (2m)^2.  So the pass is a pure quality improvement plus
the Leiden connectivity guarantee, for the price of one CC run over
the intra-community edge subset (tests/test_leiden.py pins both the
guarantee and the monotonicity on adversarial labelings).

Plan shape — compositions of certified machinery only:
  - two bucketed ``hash_join``s tag each directed edge with its
    endpoint communities (the |V|-sized label table is never
    broadcast or driver-materialized);
  - filter c_src == c_dst, project (src, dst), symmetrize with
    dedup=False (build_csr_shards dedups (src, dst) in-shard);
  - graph/components.py min-label CC + pointer jumping over the
    induced subgraph.  Vertices with no intra-community edge become
    singletons (their own vid) — exactly the induced-subgraph
    semantics.

Because louvain() canonicalizes community = min member vid and CC
labels are min vid per connected piece, refinement is the IDENTITY on
communities that are already connected — refined labels differ only
where Louvain's output violates the Leiden guarantee.

Reference anchor: community structure over the harvested citation
graph is the reference's clustering use case
(halvesting_geometric/modules/sage.py); graph/louvain.py is the
classical counterpart and this pass upgrades its output to Leiden's
connectivity guarantee.
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Tuple

import numpy as np
import pyarrow as pa

from ..config import DEFAULT, EngineConfig

_I64 = pa.int64()


def intra_community_edges(edges, labels, cfg: EngineConfig = DEFAULT, *,
                          label_col: str = "community"):
    """(src, dst) rows of ``edges`` whose endpoints share a community.

    Two bucketed hash_joins (labels attach by ownership, never
    broadcast) + one vectorized equality filter.  Output is directed,
    same multiplicity as the input subset.
    """
    import pyarrow.compute as pc

    from ..ops.join import hash_join

    la = labels.map_batches(
        lambda b: pa.table({"vid": b.column("vid"),
                            "c_src": b.column(label_col)}),
        batch_format="pyarrow", zero_copy_batch=True)
    lb = labels.map_batches(
        lambda b: pa.table({"vid": b.column("vid"),
                            "c_dst": b.column(label_col)}),
        batch_format="pyarrow", zero_copy_batch=True)
    j1 = hash_join(edges.select_columns(["src", "dst"]), la,
                   on="src", right_on="vid", num_parts=cfg.num_parts,
                   left_schema=pa.schema([("src", _I64), ("dst", _I64)]),
                   right_schema=pa.schema([("vid", _I64),
                                           ("c_src", _I64)]))
    j2 = hash_join(j1, lb, on="dst", right_on="vid",
                   num_parts=cfg.num_parts,
                   left_schema=pa.schema([("dst", _I64), ("src", _I64),
                                          ("c_src", _I64)]),
                   right_schema=pa.schema([("vid", _I64),
                                           ("c_dst", _I64)]))

    def same(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("c_src"), b.column("c_dst")))
        return pa.table({"src": t.column("src"), "dst": t.column("dst")})

    return j2.map_batches(same, batch_format="pyarrow",
                          zero_copy_batch=True)


def refine_connectivity(edges, labels, offsets: np.ndarray, workdir: str,
                        cfg: EngineConfig = DEFAULT, *,
                        label_col: str = "community",
                        job: str = "leiden",
                        stats: bool = True) -> Tuple["object", Dict]:
    """Split every community of ``labels`` into the connected
    components of its induced subgraph (the Leiden guarantee).

    Returns (refined_labels_ds(vid, community), info) with
    ``community`` = min member vid of each refined (connected) piece.
    ``info``: n_before / n_after distinct communities and — with
    ``stats=True`` — n_split, the number of input communities whose
    induced subgraph was disconnected (0 means the input already
    satisfied the guarantee and the labels are unchanged).

    ``job`` keys the CC checkpoint AND the induced-subgraph CSR shard
    directory under ``workdir``: reuse the same job name only for the
    same (edges, labels) pair — a different label set needs a fresh
    job (or workdir), like every resumable operator in the engine.
    """
    from ..ops.agg import grouped_aggregate
    from ..ops.join import hash_join
    from .build import symmetrize
    from .components import connected_components

    t0 = time.time()
    # labels feeds two joins (three with stats=True): materialize or
    # every reference re-runs the caller's upstream plan (the repo's
    # materialize-twice-referenced-inputs rule)
    labels = labels.materialize()
    intra = intra_community_edges(edges, labels, cfg,
                                  label_col=label_col)
    cc, cc_info = connected_components(
        symmetrize(intra, cfg, dedup=False), offsets, workdir,
        cfg, job=f"cc_{job}", shards_dir=f"{workdir}/csr_{job}")
    refined = cc.map_batches(
        lambda b: pa.table({"vid": b.column("vid"),
                            "community": b.column("label")}),
        batch_format="pyarrow", zero_copy_batch=True)
    info: Dict = {"cc_iters": cc_info.get("iters"),
                  "wall_sec": None}
    if stats:
        refined = refined.materialize()
        old = labels.map_batches(
            lambda b: pa.table({"vid": b.column("vid"),
                                "c_old": b.column(label_col)}),
            batch_format="pyarrow", zero_copy_batch=True)
        pairs = hash_join(
            refined, old, on="vid", right_on="vid",
            num_parts=cfg.num_parts,
            left_schema=pa.schema([("vid", _I64),
                                   ("community", _I64)]),
            right_schema=pa.schema([("vid", _I64), ("c_old", _I64)]))
        upairs = grouped_aggregate(
            pairs.select_columns(["c_old", "community"]),
            ["c_old", "community"], {"n": ("count", "community")},
            num_parts=cfg.num_parts)
        percomm = grouped_aggregate(
            upairs.select_columns(["c_old"]), ["c_old"],
            {"pieces": ("count", "c_old")}, num_parts=cfg.num_parts)
        def psum(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            p = b.column("pieces")
            return pa.table({
                "nb": pa.array([b.num_rows], type=_I64),
                "na": pa.array([int(pc.sum(p).as_py() or 0)], type=_I64),
                "ns": pa.array([int(pc.sum(pc.cast(
                    pc.greater(p, 1), _I64)).as_py() or 0)], type=_I64)})

        # one scalar row per block lands on the driver, never the
        # per-community table itself
        parts = percomm.map_batches(psum, batch_format="pyarrow",
                                    zero_copy_batch=True).take_all()
        info.update(
            n_before=sum(r["nb"] for r in parts),
            n_after=sum(r["na"] for r in parts),
            n_split=sum(r["ns"] for r in parts))
    info["wall_sec"] = round(time.time() - t0, 4)
    return refined, info


def louvain_leiden(edges, offsets: np.ndarray, workdir: str,
                   cfg: EngineConfig = DEFAULT, *,
                   stats: bool = True,
                   **louvain_kw) -> Tuple["object", Dict]:
    """Louvain + the Leiden connectivity refinement: run
    graph/louvain.py, then guarantee every community is internally
    connected.  Returns (labels_ds(vid, community), info) where info
    carries the Louvain per-level record plus the refinement stats
    (n_split > 0 quantifies how often plain Louvain violated the
    guarantee on this graph)."""
    from .louvain import louvain

    lv, info = louvain(edges, offsets, workdir, cfg, **louvain_kw)
    lv = lv.materialize()  # feeds both refinement joins
    refined, rinfo = refine_connectivity(
        edges, lv, offsets, workdir, cfg, job="leiden", stats=stats)
    info["refine"] = rinfo
    return refined, info
