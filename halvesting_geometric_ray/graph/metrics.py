"""Structural / link-prediction metrics over the link graph.

The reference's whole purpose is link prediction on a citation graph
(reference link_prediction.py:33-106): its GNN scores candidate
(paper, paper) pairs.  The classical, deterministic analogues of those
scores — common-neighbor counts and neighborhood Jaccard — plus the
standard structure diagnostics (local clustering coefficient,
reciprocity, degree assortativity) are implemented here as one-shot
Dataset pipelines on the same canonical-undirected machinery as
triangle counting (graph/triangles.py):

- clustering_coefficients: per-vertex lcc = 2*tri(v) / (deg(v)*(deg(v)-1))
  from the exact per-vertex triangle counts + canonical degrees.
- common_neighbor_scores: per unordered vertex pair with >=1 shared
  neighbor, the common-neighbor count and neighborhood Jaccard
  cn / (deg_a + deg_b - cn) — the link-prediction candidate scorer.
  Pair generation is the same per-center vectorized expansion as wedge
  generation, run over the full symmetrized adjacency (every center
  emits its neighbor pairs, so each shared neighbor is counted exactly
  once per pair).  ``max_center_degree`` caps hub fan-out (a center of
  degree d emits d*(d-1)/2 pairs; at web scale hubs are uninformative
  for CN scoring and are excluded, logged, not silently truncated).
- reciprocity: fraction of directed non-loop edges whose reverse edge
  exists (semi-join against the swapped edge set).
- degree_assortativity: Pearson correlation of endpoint degrees over
  the undirected edges, returned as exact int64 sufficient statistics
  (m, sx, sxy, sxx) plus the coefficient — the final value is ONE
  double division of exactly-computed integers, so it is bitwise
  reproducible under any partitioning (and SQL-certifiable).

All floats produced here are single IEEE-754 divisions of exactly
representable integers — identical bit patterns in numpy and DuckDB —
which is what lets the gate hash-certify them.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

from ..config import DEFAULT, EngineConfig
from ..ops.agg import grouped_aggregate
from ..ops.join import hash_join
from .triangles import (_degrees_canonical, _wedges, canonical_undirected,
                        triangles_canonical)

_E_SCHEMA = pa.schema([pa.field("src", pa.int64()),
                       pa.field("dst", pa.int64())])
_DEG_SCHEMA = pa.schema([pa.field("vid", pa.int64()),
                         pa.field("deg", pa.int64())])


def clustering_coefficients(edges, cfg: EngineConfig = DEFAULT):
    """Per-vertex local clustering coefficient from the DIRECTED edge
    table.  Returns a Dataset (vid, degree, n_triangles, lcc) over every
    vertex with canonical degree >= 1; lcc = 0.0 when degree < 2."""
    und = canonical_undirected(edges, cfg).materialize()
    deg = _degrees_canonical(und)
    per_tri, _total = triangles_canonical(und, cfg)
    tri_schema = pa.schema([pa.field("vid", pa.int64()),
                            pa.field("triangles", pa.int64())])
    j = hash_join(deg, per_tri, on="vid", right_on="vid", join_type="left",
                  num_parts=cfg.num_parts, left_schema=_DEG_SCHEMA,
                  right_schema=tri_schema)

    def fin(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        d = b.column("deg").to_numpy(zero_copy_only=False)
        t = pc.fill_null(b.column("triangles"), 0).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        lcc = np.zeros(len(d), dtype=np.float64)
        m = d >= 2
        # one division of exactly-representable ints (bitwise stable)
        lcc[m] = (2 * t[m]).astype(np.float64) / (d[m] * (d[m] - 1)).astype(np.float64)
        return pa.table({"vid": b.column("vid"),
                         "degree": pa.array(d, type=pa.int64()),
                         "n_triangles": pa.array(t, type=pa.int64()),
                         "lcc": pa.array(lcc, type=pa.float64())})

    return j.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


def common_neighbor_scores(edges, cfg: EngineConfig = DEFAULT,
                           max_center_degree: Optional[int] = None):
    """Link-prediction candidate scores from the DIRECTED edge table.

    Returns a Dataset (a, b, common_neighbors, jaccard) with a < b, one
    row per unordered vertex pair sharing >= 1 neighbor in the canonical
    undirected graph.  jaccard = cn / (deg_a + deg_b - cn) (neighborhood
    union size in the denominator).

    ``max_center_degree``: exclude centers whose degree exceeds the cap
    from pair generation (hub guard — pair volume is sum over centers of
    deg^2/2).  The number of excluded centers is logged by the caller via
    the returned dataset's lineage; exclusion changes cn counts for pairs
    adjacent to hubs, so the cap is OFF by default and must be an
    explicit caller decision.
    """
    und = canonical_undirected(edges, cfg).materialize()
    deg = _degrees_canonical(und).materialize()

    def sym(b: pa.Table) -> pa.Table:
        s, d = b.column("src").to_numpy(), b.column("dst").to_numpy()
        return pa.table({"src": pa.array(np.concatenate([s, d])),
                         "dst": pa.array(np.concatenate([d, s]))})

    centers = und.map_batches(sym, batch_format="pyarrow",
                              zero_copy_batch=True)
    if max_center_degree is not None:
        import pyarrow.compute as pc

        small = deg.filter(expr=f"deg <= {int(max_center_degree)}")
        small_schema = _DEG_SCHEMA
        centers_schema = _E_SCHEMA
        centers = hash_join(centers, small, on="src", right_on="vid",
                            join_type="semi", num_parts=cfg.num_parts,
                            left_schema=centers_schema,
                            right_schema=small_schema)

    # reuse the wedge generator: ordering key = neighbor vid (pass dst as
    # deg_dst) so every emitted pair already satisfies a < b
    ordered = centers.map_batches(
        lambda b: pa.table({"src": b.column("src"), "dst": b.column("dst"),
                            "deg_dst": b.column("dst")}),
        batch_format="pyarrow", zero_copy_batch=True)
    pairs = _wedges(ordered, cfg)
    cn = grouped_aggregate(pairs.select_columns(["a", "b"]), ["a", "b"],
                           {"common_neighbors": ("count", None)},
                           num_parts=cfg.num_parts)

    cn_schema = pa.schema([pa.field("a", pa.int64()), pa.field("b", pa.int64()),
                           pa.field("common_neighbors", pa.int64())])
    j = hash_join(cn, deg, on="a", right_on="vid", num_parts=cfg.num_parts,
                  right_cols=["deg"], left_schema=cn_schema,
                  right_schema=_DEG_SCHEMA)
    j = j.map_batches(lambda b: b.rename_columns(
        ["a", "b", "common_neighbors", "deg_a"]),
        batch_format="pyarrow", zero_copy_batch=True)
    j_schema = pa.schema([pa.field("a", pa.int64()), pa.field("b", pa.int64()),
                          pa.field("common_neighbors", pa.int64()),
                          pa.field("deg_a", pa.int64())])
    j = hash_join(j, deg, on="b", right_on="vid", num_parts=cfg.num_parts,
                  right_cols=["deg"], left_schema=j_schema,
                  right_schema=_DEG_SCHEMA)
    j = j.map_batches(lambda b: b.rename_columns(
        ["b", "a", "common_neighbors", "deg_a", "deg_b"]),
        batch_format="pyarrow", zero_copy_batch=True)

    def fin(b: pa.Table) -> pa.Table:
        cn_ = b.column("common_neighbors").to_numpy()
        da = b.column("deg_a").to_numpy()
        db = b.column("deg_b").to_numpy()
        jac = cn_.astype(np.float64) / (da + db - cn_).astype(np.float64)
        return pa.table({"a": b.column("a"), "b": b.column("b"),
                         "common_neighbors": b.column("common_neighbors"),
                         "jaccard": pa.array(jac, type=pa.float64())})

    return j.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


def cocitation_scores(edges, cfg: EngineConfig = DEFAULT, *,
                      mode: str = "cocitation",
                      max_center_degree: Optional[int] = None):
    """The two classical citation-similarity measures over the DIRECTED
    edge table (the reference domain is a citation graph —
    link_prediction_dataset.py builds exactly such edges):

    - ``mode="cocitation"`` (Small 1973): score(a, b) = number of pages
      citing BOTH a and b (shared in-neighbors).
    - ``mode="coupling"`` (Kessler 1963, bibliographic coupling):
      score(a, b) = number of pages cited by BOTH a and b (shared
      out-neighbors).

    Returns (a, b, score) with a < b, one row per unordered pair with
    score >= 1.  Pair volume is sum over centers of deg^2/2 (center =
    the citing page for co-citation, the cited page for coupling);
    ``max_center_degree`` is the same explicit hub guard as
    common_neighbor_scores (excluding a hub center removes its wedges
    from every adjacent pair's count — an explicit caller decision).

    Exact integer counts, one wedge pass + one grouped sum — the
    triangles.py machinery on the unsymmetrized graph."""
    import pyarrow.compute as pc

    if mode not in ("cocitation", "coupling"):
        raise ValueError("mode must be 'cocitation' or 'coupling'")

    def orient(b: pa.Table) -> pa.Table:
        b = b.filter(pc.not_equal(b.column("src"), b.column("dst")))
        c, n = (("src", "dst") if mode == "cocitation"
                else ("dst", "src"))
        return pa.table({"src": b.column(c), "dst": b.column(n),
                         "deg_dst": b.column(n)})

    centers = edges.map_batches(orient, batch_format="pyarrow",
                                zero_copy_batch=True)
    if max_center_degree is not None:
        deg = grouped_aggregate(centers.select_columns(["src"]), ["src"],
                                {"deg": ("count", None)},
                                num_parts=cfg.num_parts)
        small = deg.filter(expr=f"deg <= {int(max_center_degree)}")
        centers = hash_join(
            centers, small, on="src", right_on="src", join_type="semi",
            num_parts=cfg.num_parts,
            left_schema=pa.schema([("src", pa.int64()),
                                   ("dst", pa.int64()),
                                   ("deg_dst", pa.int64())]),
            right_schema=pa.schema([("src", pa.int64()),
                                    ("deg", pa.int64())]))
    pairs = _wedges(centers, cfg)
    return grouped_aggregate(pairs.select_columns(["a", "b"]), ["a", "b"],
                             {"score": ("count", None)},
                             num_parts=cfg.num_parts)


def adamic_adar_scores(edges, cfg: EngineConfig = DEFAULT,
                       max_center_degree: Optional[int] = None):
    """Adamic-Adar and resource-allocation link-prediction scores per
    unordered vertex pair with >= 1 shared neighbor:

        AA(a, b) = sum over shared z of 1/ln(deg_z)
        RA(a, b) = sum over shared z of 1/deg_z

    (Adamic & Adar 2003; Zhou et al. 2009 — the strongest classical
    baselines for the reference's link-prediction task,
    link_prediction.py:33-106.)  Same wedge machinery and hub guard as
    common_neighbor_scores; every shared neighbor z has deg_z >= 2, so
    ln(deg_z) > 0 always.  Returns (a, b, common_neighbors, adamic_adar,
    resource_allocation).  Float sums are order-dependent in the last
    ulps under re-partitioning — certified by allclose pytest oracles,
    not SQL hashes."""
    und = canonical_undirected(edges, cfg).materialize()
    deg = _degrees_canonical(und)

    def sym(b: pa.Table) -> pa.Table:
        s, d = b.column("src").to_numpy(), b.column("dst").to_numpy()
        return pa.table({"src": pa.array(np.concatenate([s, d])),
                         "dst": pa.array(np.concatenate([d, s]))})

    centers = und.map_batches(sym, batch_format="pyarrow",
                              zero_copy_batch=True)
    if max_center_degree is not None:
        small = deg.filter(expr=f"deg <= {int(max_center_degree)}")
        centers = hash_join(centers, small, on="src", right_on="vid",
                            join_type="semi", num_parts=cfg.num_parts,
                            left_schema=_E_SCHEMA, right_schema=_DEG_SCHEMA)

    ordered = centers.map_batches(
        lambda b: pa.table({"src": b.column("src"), "dst": b.column("dst"),
                            "deg_dst": b.column("dst")}),
        batch_format="pyarrow", zero_copy_batch=True)
    pairs = _wedges(ordered, cfg)  # (a, b, u): u = shared neighbor
    w_schema = pa.schema([pa.field("a", pa.int64()), pa.field("b", pa.int64()),
                          pa.field("u", pa.int64())])
    j = hash_join(pairs, deg, on="u", right_on="vid", num_parts=cfg.num_parts,
                  right_cols=["deg"], left_schema=w_schema,
                  right_schema=_DEG_SCHEMA)

    def weights(b: pa.Table) -> pa.Table:
        d = b.column("deg").to_numpy().astype(np.float64)
        return pa.table({"a": b.column("a"), "b": b.column("b"),
                         "aa": pa.array(1.0 / np.log(d)),
                         "ra": pa.array(1.0 / d),
                         "one": pa.array(np.ones(len(d), dtype=np.int64))})

    scored = j.map_batches(weights, batch_format="pyarrow",
                           zero_copy_batch=True)
    return grouped_aggregate(
        scored, ["a", "b"],
        {"common_neighbors": ("sum", "one"),
         "adamic_adar": ("sum", "aa"),
         "resource_allocation": ("sum", "ra")}, num_parts=cfg.num_parts)


def reciprocity(edges, cfg: EngineConfig = DEFAULT) -> dict:
    """Directed-edge reciprocity: share of distinct non-loop edges
    (u, v) for which (v, u) also exists.  Returns
    {n_edges, n_reciprocal, reciprocity}."""
    import pyarrow.compute as pc

    from ..ops.dedup import distinct

    de = distinct(
        edges.map_batches(
            lambda b: b.filter(pc.invert(pc.equal(b["src"], b["dst"]))),
            batch_format="pyarrow", zero_copy_batch=True),
        ["src", "dst"], num_parts=cfg.num_parts).materialize()
    swapped = de.map_batches(
        lambda b: pa.table({"src": b.column("dst"), "dst": b.column("src")}),
        batch_format="pyarrow", zero_copy_batch=True)
    recip = hash_join(de, swapped, on=["src", "dst"],
                      right_on=["src", "dst"], join_type="semi",
                      num_parts=cfg.num_parts, left_schema=_E_SCHEMA,
                      right_schema=_E_SCHEMA)
    n_edges = int(de.count())
    n_recip = int(recip.count())
    return {"n_edges": n_edges, "n_reciprocal": n_recip,
            "reciprocity": float(n_recip) / float(n_edges) if n_edges else 0.0}


def degree_assortativity(edges, cfg: EngineConfig = DEFAULT) -> dict:
    """Degree assortativity of the canonical undirected graph (Newman
    2002): Pearson correlation of endpoint degrees with each edge
    counted in both orientations.

    Returns exact int64 sufficient statistics plus the coefficient:
    {m, sx, sxy, sxx, assortativity} where m = 2E, sx = sum(deg_u+deg_v),
    sxy = 2*sum(deg_u*deg_v), sxx = sum(deg_u^2+deg_v^2) and
    r = (m*sxy - sx^2) / (m*sxx - sx^2)  (symmetry makes sy=sx, syy=sxx,
    collapsing the usual sqrt product into one integer denominator).

    The partial sums are exact int64 per batch (valid while
    batch_rows * max_deg^2 < 2^63 — i.e. max degree ~3e6 at 1k-row
    batches; beyond that, pre-split hub batches), accumulated as exact
    Python ints on the driver (num_blocks scalar rows, not data)."""
    und = canonical_undirected(edges, cfg).materialize()
    deg = _degrees_canonical(und)

    j = hash_join(und, deg, on="src", right_on="vid", num_parts=cfg.num_parts,
                  right_cols=["deg"], left_schema=_E_SCHEMA,
                  right_schema=_DEG_SCHEMA)
    j = j.map_batches(lambda b: b.rename_columns(["src", "dst", "deg_src"]),
                      batch_format="pyarrow", zero_copy_batch=True)
    j1_schema = pa.schema([pa.field("src", pa.int64()),
                           pa.field("dst", pa.int64()),
                           pa.field("deg_src", pa.int64())])
    j = hash_join(j, deg, on="dst", right_on="vid", num_parts=cfg.num_parts,
                  right_cols=["deg"], left_schema=j1_schema,
                  right_schema=_DEG_SCHEMA)
    j = j.map_batches(lambda b: b.rename_columns(
        ["dst", "src", "deg_src", "deg_dst"]),
        batch_format="pyarrow", zero_copy_batch=True)

    def partial(b: pa.Table) -> pa.Table:
        x = b.column("deg_src").to_numpy()
        y = b.column("deg_dst").to_numpy()
        return pa.table({
            "n": pa.array([len(x)], type=pa.int64()),
            "sx": pa.array([int(x.sum() + y.sum())], type=pa.int64()),
            "sxy": pa.array([int((x * y).sum())], type=pa.int64()),
            "sxx": pa.array([int((x * x).sum() + (y * y).sum())],
                            type=pa.int64())})

    parts = j.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()
    m = 2 * int(parts["n"].sum())
    sx = int(parts["sx"].sum())
    sxy = 2 * int(parts["sxy"].sum())
    sxx = int(parts["sxx"].sum())
    num = m * sxy - sx * sx
    den = m * sxx - sx * sx
    r = float(num) / float(den) if den != 0 else 0.0
    return {"m": m, "sx": sx, "sxy": sxy, "sxx": sxx, "assortativity": r}


def degree_histogram(edges, cfg: EngineConfig = DEFAULT):
    """Canonical undirected degree histogram as a SORTED list of
    (degree, n_vertices) tuples — the O(#distinct degrees) summary
    that answers Gini / rich-club / power-law questions without a
    global sort."""
    und = canonical_undirected(edges, cfg)
    deg = _degrees_canonical(und)
    from ..ops.agg import grouped_aggregate

    hist = grouped_aggregate(
        deg.map_batches(lambda b: pa.table({
            "d": b.column("deg"),
            "n": pa.array(np.ones(len(b), dtype=np.int64))}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["d"], {"n": ("sum", "n")}, num_parts=cfg.num_parts).to_pandas()
    return sorted(zip(hist["d"].astype(int), hist["n"].astype(int)))


def rich_club(edges, ks, cfg: EngineConfig = DEFAULT):
    """Rich-club coefficients of the canonical undirected graph (Zhou
    & Mondragon 2004): phi(k) = 2*E_k / (N_k*(N_k-1)) with N_k the
    vertices of degree > k and E_k the edges between them — the
    hub-interconnection statistic (do high-degree pages link each
    other more than chance?).

    Scale shape: degrees attach via the same two bucketed joins as
    degree_assortativity, then EVERYTHING reduces to two degree-
    bounded histograms — counts of min(deg_u, deg_v) per edge and of
    deg per vertex — whose suffix sums answer ALL thresholds at once
    on the driver (O(max_degree) state, no per-k passes).  Returns a
    pyarrow Table (k, n_k:int64, e_k:int64, phi:float64 rounded 9dp;
    phi = 0.0 when n_k < 2)."""
    import pyarrow.compute as _pc

    ks = sorted(set(int(k) for k in ks))
    if not ks or ks[0] < 0:
        raise ValueError("ks must be non-negative ints")
    und = canonical_undirected(edges, cfg).materialize()
    deg = _degrees_canonical(und).materialize()

    j = hash_join(und, deg, on="src", right_on="vid",
                  num_parts=cfg.num_parts, right_cols=["deg"],
                  left_schema=_E_SCHEMA, right_schema=_DEG_SCHEMA)
    j = j.map_batches(lambda b: b.rename_columns(["src", "dst",
                                                  "deg_src"]),
                      batch_format="pyarrow", zero_copy_batch=True)
    j1_schema = pa.schema([pa.field("src", pa.int64()),
                           pa.field("dst", pa.int64()),
                           pa.field("deg_src", pa.int64())])
    j = hash_join(j, deg, on="dst", right_on="vid",
                  num_parts=cfg.num_parts, right_cols=["deg"],
                  left_schema=j1_schema, right_schema=_DEG_SCHEMA)
    j = j.map_batches(lambda b: b.rename_columns(
        ["dst", "src", "deg_src", "deg_dst"]),
        batch_format="pyarrow", zero_copy_batch=True)

    def min_hist(b: pa.Table) -> pa.Table:
        m = np.minimum(b.column("deg_src").to_numpy(),
                       b.column("deg_dst").to_numpy())
        v, c = np.unique(m, return_counts=True)
        return pa.table({"m": pa.array(v, type=pa.int64()),
                         "n": pa.array(c, type=pa.int64())})

    from ..ops.agg import grouped_aggregate

    ehist = grouped_aggregate(
        j.map_batches(min_hist, batch_format="pyarrow",
                      zero_copy_batch=True),
        ["m"], {"n": ("sum", "n")}, num_parts=cfg.num_parts).to_pandas()
    dhist = grouped_aggregate(
        deg.map_batches(lambda b: pa.table({
            "d": b.column("deg"),
            "n": pa.array(np.ones(len(b), dtype=np.int64))}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["d"], {"n": ("sum", "n")}, num_parts=cfg.num_parts).to_pandas()

    em = ehist["m"].to_numpy()
    en = ehist["n"].to_numpy()
    dm = dhist["d"].to_numpy()
    dn = dhist["n"].to_numpy()
    rows = []
    for k in ks:
        n_k = int(dn[dm > k].sum())
        e_k = int(en[em > k].sum())
        phi = round(2.0 * e_k / (n_k * (n_k - 1)), 9) if n_k >= 2 else 0.0
        rows.append((k, n_k, e_k, phi))
    return pa.table({
        "k": pa.array([r[0] for r in rows], type=pa.int64()),
        "n_k": pa.array([r[1] for r in rows], type=pa.int64()),
        "e_k": pa.array([r[2] for r in rows], type=pa.int64()),
        "phi": pa.array([r[3] for r in rows], type=pa.float64())})


def modularity(edges, labels, cfg: EngineConfig = DEFAULT):
    """Newman modularity Q of a community labeling over an UNDIRECTED
    canonical edge list (each edge once): Q = sum_c [e_c/m -
    (d_c/2m)^2] with e_c intra-community edges, d_c community degree
    sum, m total edges.  The quality score for label_propagation's
    output (community detection without a fitness metric is
    unfalsifiable).

    Scale shape — the host-graph contraction pattern: two bucketed
    hash_joins attach endpoint labels to every edge (labels is
    |V|-sized, never broadcast), then ONE batch-level combiner emits
    per-label partial (intra-edge, degree) counts and a label-grouped
    sum reduces to the (tiny) per-community table; Q folds on the
    driver.  Returns (Q, per_community dataset (label, e_in, deg)).
    """
    i64 = pa.int64()
    la = labels.map_batches(
        lambda b: pa.table({"vid": b.column("vid"),
                            "l_src": b.column("label")}),
        batch_format="pyarrow", zero_copy_batch=True)
    lb = labels.map_batches(
        lambda b: pa.table({"vid": b.column("vid"),
                            "l_dst": b.column("label")}),
        batch_format="pyarrow", zero_copy_batch=True)
    j1 = hash_join(edges, la, on="src", right_on="vid",
                   num_parts=cfg.num_parts,
                   left_schema=pa.schema([("src", i64), ("dst", i64)]),
                   right_schema=pa.schema([("vid", i64), ("l_src", i64)]))
    j2 = hash_join(j1, lb, on="dst", right_on="vid",
                   num_parts=cfg.num_parts,
                   left_schema=pa.schema([("dst", i64), ("src", i64),
                                          ("l_src", i64)]),
                   right_schema=pa.schema([("vid", i64), ("l_dst", i64)]))

    def partial(b: pa.Table) -> pa.Table:
        ls = b.column("l_src").to_numpy()
        ld = b.column("l_dst").to_numpy()
        both = np.concatenate([ls, ld])
        ulab, inv = np.unique(both, return_inverse=True)
        deg = np.bincount(inv, minlength=len(ulab)).astype(np.int64)
        intra = np.zeros(len(ulab), dtype=np.int64)
        eq = ls == ld
        if eq.any():
            pos = np.searchsorted(ulab, ls[eq])
            np.add.at(intra, pos, 1)
        return pa.table({"label": pa.array(ulab),
                         "e_in": pa.array(intra),
                         "deg": pa.array(deg)})

    per_label = grouped_aggregate(
        j2.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["label"], {"e_in": ("sum", "e_in"), "deg": ("sum", "deg")},
        num_parts=cfg.num_parts)

    import ray as _ray

    tbls = [t for t in map(_ray.get, per_label.to_arrow_refs())
            if t.num_rows]
    if not tbls:
        return 0.0, per_label
    t = pa.concat_tables(tbls)
    e_in = t.column("e_in").to_numpy().astype(np.float64)
    deg = t.column("deg").to_numpy().astype(np.float64)
    m = float(deg.sum()) / 2.0  # every edge contributes 2 endpoints
    q = float(np.sum(e_in / m - (deg / (2.0 * m)) ** 2))
    return q, per_label


def edge_cut_report(edges, offsets, num_actors: int = 0) -> dict:
    """Partitioning diagnostic for the CSR layout: what fraction of
    edges crosses partition boundaries (each crossing edge is one
    exchange message every iterative round), plus per-partition edge /
    out-degree balance — the numbers that decide whether a different
    ``offsets`` split or a num_parts change is worth it before a long
    PageRank/CC campaign.

    One streaming pass: per-batch searchsorted part assignment +
    bincount partials, driver sums <= num_blocks tiny rows.  Returns
    {n_edges, n_cut, cut_fraction, parts: [{part, src_edges,
    dst_edges}], max_part_share, imbalance} where imbalance =
    max_part_edges / mean_part_edges (1.0 = perfectly even).
    """
    off = np.asarray(offsets, dtype=np.int64)
    num_parts = len(off) - 1

    def partial(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy()
        d = b.column("dst").to_numpy()
        ps = np.searchsorted(off, s, side="right") - 1
        pd_ = np.searchsorted(off, d, side="right") - 1
        return pa.table({
            "part": pa.array(np.arange(num_parts, dtype=np.int64)),
            "src_edges": pa.array(np.bincount(ps, minlength=num_parts)
                                  .astype(np.int64)),
            "dst_edges": pa.array(np.bincount(pd_, minlength=num_parts)
                                  .astype(np.int64)),
            "cut": pa.array(np.full(num_parts, int((ps != pd_).sum()) if
                                    num_parts else 0, dtype=np.int64)),
        })

    pdf = edges.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
    agg = pdf.groupby("part", sort=True)[["src_edges", "dst_edges"]].sum()
    # "cut" repeats the per-batch total on every part row: sum one row
    # per batch = total over batches
    n_cut = int(pdf.groupby("part")["cut"].sum().iloc[0]) if len(pdf) else 0
    n_edges = int(agg["src_edges"].sum())
    src = agg["src_edges"].to_numpy()
    mean = src.mean() if num_parts else 0.0
    return {
        "n_edges": n_edges,
        "n_cut": n_cut,
        "cut_fraction": (n_cut / n_edges) if n_edges else 0.0,
        "parts": [{"part": int(p), "src_edges": int(r.src_edges),
                   "dst_edges": int(r.dst_edges)}
                  for p, r in agg.iterrows()],
        "max_part_share": float(src.max() / n_edges) if n_edges else 0.0,
        "imbalance": float(src.max() / mean) if mean > 0 else 1.0,
    }


def powerlaw_alpha(edges, dmin: int = 1, round_to: int = 6,
                   cfg: EngineConfig = DEFAULT):
    """Continuous-MLE power-law exponent of the undirected degree
    distribution (Clauset, Shalizi & Newman 2009, eq. 3.1):
    alpha = 1 + n / sum(ln(deg / dmin)) over vertices with deg >= dmin
    — the one-number heavy-tail summary of a web crawl.

    One grouped degree exchange, then a per-block (n, sum-ln) partial
    folded on the driver; returns a single-row pyarrow table
    (n, alpha), rounded (float summation order differs between
    engines — same discipline as the moments oracle)."""
    und = canonical_undirected(edges, cfg)
    deg = _degrees_canonical(und)

    def partial(b: pa.Table) -> pa.Table:
        d = b.column("deg").to_numpy(zero_copy_only=False).astype(
            np.float64)
        d = d[d >= dmin]
        return pa.table({"n": pa.array([int(d.size)], type=pa.int64()),
                         "s": pa.array([float(np.log(d / dmin).sum())],
                                       type=pa.float64())})

    pdf = deg.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()
    n = int(pdf["n"].sum())
    s = float(pdf["s"].sum())
    alpha = 1.0 + n / s if s > 0 else float("nan")
    return pa.table({"n": pa.array([n], type=pa.int64()),
                     "alpha": pa.array([round(alpha, round_to)],
                                       type=pa.float64())})


def community_conductance(edges, labels, cfg: EngineConfig = DEFAULT):
    """Per-community conductance over an UNDIRECTED canonical edge list:

        cut(C) = deg(C) - 2 * e_in(C)          (boundary edges)
        phi(C) = cut(C) / min(vol(C), 2m - vol(C))

    The second community-fitness metric next to modularity (a good
    community has HIGH modularity contribution and LOW conductance —
    modularity can be gamed by resolution limits, conductance cannot).
    Reuses modularity's one-pass per-label (e_in, deg) table (the
    labels table is joined, never broadcast), then one vectorized
    finish over the community-cardinality result.  Returns
    (ds(label, cut, volume, conductance), info{q, m}).  Whole-graph
    communities (vol == 2m) get conductance 0 by convention; isolated
    communities (vol == cut == 0) too."""
    import ray.data as rd

    q, per_label = modularity(edges, labels, cfg)

    import ray as _ray

    tbls = [t for t in map(_ray.get, per_label.to_arrow_refs())
            if t.num_rows]
    if not tbls:
        import pandas as _pd

        return rd.from_pandas(_pd.DataFrame(
            {"label": _pd.Series([], dtype="int64"),
             "cut": _pd.Series([], dtype="int64"),
             "volume": _pd.Series([], dtype="int64"),
             "conductance": _pd.Series([], dtype="float64")})), \
            {"q": q, "m": 0}
    t = pa.concat_tables(tbls)
    lab = t.column("label").to_numpy()
    e_in = t.column("e_in").to_numpy().astype(np.int64)
    deg = t.column("deg").to_numpy().astype(np.int64)
    m2 = int(deg.sum())  # = 2m
    cut = deg - 2 * e_in
    other = m2 - deg
    den = np.minimum(deg, other)
    with np.errstate(divide="ignore", invalid="ignore"):
        phi = np.where(den > 0, cut / np.maximum(den, 1), 0.0)
    order = np.argsort(lab, kind="stable")
    out = pa.table({"label": pa.array(lab[order]),
                    "cut": pa.array(cut[order]),
                    "volume": pa.array(deg[order]),
                    "conductance": pa.array(phi[order].astype(np.float64))})
    return rd.from_arrow(out), {"q": q, "m": m2 // 2}


def scan_similarity(edges, cfg: EngineConfig = DEFAULT):
    """SCAN structural similarity per undirected edge (Xu et al., KDD
    2007): sigma(u, v) = |G(u) n G(v)| / sqrt(|G(u)| * |G(v)|) with
    CLOSED neighborhoods G(x) = N(x) u {x}.  For an edge (u, v) of a
    simple graph the closed intersection is the edge's triangle support
    plus the two endpoints themselves, so

        sigma = (support(u,v) + 2) / sqrt((deg_u + 1) * (deg_v + 1))

    and everything reduces to machinery we already have: the k-truss
    per-edge support pass (graph/truss.py::_edge_support — one oriented
    wedge/semi-join triangle plan) plus two degree joins.  Returns a
    Dataset (src, dst, support, sigma) over every canonical undirected
    edge; sigma is rounded to 9 dp (one sqrt + one division of
    exactly-representable integers, then round — the same SQL-parity
    recipe as rich_club/degree_gini).

    This is the classic community/hub/outlier edge scorer: thresholding
    sigma >= eps gives the eps-neighborhood graph SCAN clusters on, and
    unlike modularity methods it separates hubs (low sigma to every
    cluster) from members.  Scale shape: support is the triangle plan
    (orientation-bounded wedges), joins are bucketed — no new physics.
    """
    from .truss import _edge_support

    und = canonical_undirected(edges, cfg).materialize()
    deg = _degrees_canonical(und).materialize()
    sup = _edge_support(und, cfg)
    sup_schema = pa.schema([pa.field("src", pa.int64()),
                            pa.field("dst", pa.int64()),
                            pa.field("support", pa.int64())])
    # left join: edges in no triangle carry support 0
    j = hash_join(und, sup, on=["src", "dst"], right_on=["src", "dst"],
                  join_type="left", num_parts=cfg.num_parts,
                  left_schema=_E_SCHEMA, right_schema=sup_schema)

    def fill(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"src": b.column("src"), "dst": b.column("dst"),
                         "support": pc.fill_null(b.column("support"),
                                                 0).cast(pa.int64())})

    j = j.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)
    j_schema = sup_schema
    j = hash_join(j, deg, on="src", right_on="vid", num_parts=cfg.num_parts,
                  right_cols=["deg"], left_schema=j_schema,
                  right_schema=_DEG_SCHEMA)
    j = j.map_batches(lambda b: b.rename_columns(
        ["src", "dst", "support", "deg_u"]),
        batch_format="pyarrow", zero_copy_batch=True)
    j_schema = pa.schema([pa.field("src", pa.int64()),
                          pa.field("dst", pa.int64()),
                          pa.field("support", pa.int64()),
                          pa.field("deg_u", pa.int64())])
    j = hash_join(j, deg, on="dst", right_on="vid", num_parts=cfg.num_parts,
                  right_cols=["deg"], left_schema=j_schema,
                  right_schema=_DEG_SCHEMA)
    j = j.map_batches(lambda b: b.rename_columns(
        ["dst", "src", "support", "deg_u", "deg_v"]),
        batch_format="pyarrow", zero_copy_batch=True)

    def fin(b: pa.Table) -> pa.Table:
        s = b.column("support").to_numpy()
        du = b.column("deg_u").to_numpy()
        dv = b.column("deg_v").to_numpy()
        # (du+1)*(dv+1) is an exact int64; sqrt and the division are
        # single correctly-rounded IEEE ops; round(9) matches DuckDB
        sig = np.round((s + 2).astype(np.float64)
                       / np.sqrt(((du + 1) * (dv + 1)).astype(np.float64)),
                       9)
        return pa.table({"src": b.column("src"), "dst": b.column("dst"),
                         "support": b.column("support"),
                         "sigma": pa.array(sig, type=pa.float64())})

    return j.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


def avg_neighbor_degree(edges, cfg: EngineConfig = DEFAULT):
    """Degree-correlation curve knn(k) (Pastor-Satorras et al. 2001):
    for each undirected degree value k, the mean degree of the
    neighbors of degree-k vertices, averaged over EDGE ENDPOINTS
    (stub-weighted: knn(k) = sum over degree-k vertices of
    sum-of-neighbor-degrees, divided by k * n_k).  The stub-weighted
    form keeps the sufficient statistics exact int64s so the final
    value is ONE double division — bitwise SQL-certifiable, and the
    standard form used for assortativity-curve plots.

    Returns a Dataset (deg, n_vertices, sum_neighbor_deg, knn) with knn
    rounded to 9 dp.  Scale shape: one symmetrize pass, one bucketed
    degree join, two grouped integer aggregations — no per-vertex state
    on the driver.
    """
    und = canonical_undirected(edges, cfg).materialize()
    deg = _degrees_canonical(und).materialize()

    def sym(b: pa.Table) -> pa.Table:
        s, d = b.column("src").to_numpy(), b.column("dst").to_numpy()
        return pa.table({"src": pa.array(np.concatenate([s, d])),
                         "dst": pa.array(np.concatenate([d, s]))})

    half = und.map_batches(sym, batch_format="pyarrow", zero_copy_batch=True)
    j = hash_join(half, deg, on="dst", right_on="vid",
                  num_parts=cfg.num_parts, right_cols=["deg"],
                  left_schema=_E_SCHEMA, right_schema=_DEG_SCHEMA)
    # (src, nbr_deg) -> per-vertex sum of neighbor degrees
    per_v = grouped_aggregate(
        j.map_batches(lambda b: b.rename_columns(["dst", "src", "nbr_deg"]),
                      batch_format="pyarrow", zero_copy_batch=True)
        .select_columns(["src", "nbr_deg"]),
        ["src"], {"sum_nbr": ("sum", "nbr_deg")}, num_parts=cfg.num_parts)
    pv_schema = pa.schema([pa.field("src", pa.int64()),
                           pa.field("sum_nbr", pa.int64())])
    pv = hash_join(per_v, deg, on="src", right_on="vid",
                   num_parts=cfg.num_parts, right_cols=["deg"],
                   left_schema=pv_schema, right_schema=_DEG_SCHEMA)
    curve = grouped_aggregate(
        pv.select_columns(["deg", "sum_nbr"]), ["deg"],
        {"n_vertices": ("count", None),
         "sum_neighbor_deg": ("sum", "sum_nbr")}, num_parts=cfg.num_parts)

    def fin(b: pa.Table) -> pa.Table:
        k = b.column("deg").to_numpy()
        n = b.column("n_vertices").to_numpy()
        s = b.column("sum_neighbor_deg").to_numpy()
        knn = np.round(s.astype(np.float64) / (k * n).astype(np.float64), 9)
        return pa.table({"deg": b.column("deg"),
                         "n_vertices": b.column("n_vertices"),
                         "sum_neighbor_deg": b.column("sum_neighbor_deg"),
                         "knn": pa.array(knn, type=pa.float64())})

    return curve.map_batches(fin, batch_format="pyarrow",
                             zero_copy_batch=True)


def categorical_assortativity(pairs, col_a: str = "la",
                              col_b: str = "lb",
                              cfg: EngineConfig = DEFAULT) -> dict:
    """Newman's discrete assortativity coefficient (Newman 2003,
    "Mixing patterns in networks" eq. 2) over a dataset of per-edge
    endpoint attribute pairs (one row per directed edge):

        r = (sum_i e_ii - sum_i a_i b_i) / (1 - sum_i a_i b_i)

    with e the normalized mixing matrix, a/b its row/column sums.
    r = 1 is perfect homophily, 0 random mixing, negative
    disassortative.  Computed from EXACT integer counts: the grouped
    mixing matrix reduces distributedly to |categories|^2 rows (tiny:
    languages, TLDs, ...), the scalar folds on the driver as
    (tr*t - sab) / (t*t - sab) — integer products, ONE division, so
    any SQL engine reproduces it bitwise at gate scale.

    Returns {"n_edges", "n_same", "assortativity"}.
    """
    m = grouped_aggregate(pairs.select_columns([col_a, col_b]),
                          [col_a, col_b], {"n": ("count", col_a)},
                          num_parts=cfg.num_parts).to_pandas()
    if not len(m):
        return {"n_edges": 0, "n_same": 0, "assortativity": 0.0}
    t = int(m["n"].sum())
    tr = int(m.loc[m[col_a] == m[col_b], "n"].sum())
    a = m.groupby(col_a)["n"].sum()
    b = m.groupby(col_b)["n"].sum()
    cats = a.index.union(b.index)
    sab = int((a.reindex(cats, fill_value=0).astype(object)
               * b.reindex(cats, fill_value=0).astype(object)).sum())
    denom = t * t - sab
    r = float(tr * t - sab) / float(denom) if denom else 1.0
    return {"n_edges": t, "n_same": tr, "assortativity": r}


def _codeg_stats(cn, *, pair_mult: int):
    """Reduce a (.., cn) codegree table to one row of motif statistics:
    sum(cn*(cn-1)) // (2*pair_mult) closed pairs-of-pairs, pair count,
    max codegree.  Per-block partials (3 ints each) -> driver finish."""
    import pandas as pd
    import ray.data as rd

    def partial(b: pa.Table) -> pa.Table:
        c = b.column("cn").to_numpy()
        s = int((c.astype(np.int64) * (c - 1)).sum()) if len(c) else 0
        return pa.table({"s": pa.array([s], type=pa.int64()),
                         "n": pa.array([len(c)], type=pa.int64()),
                         "m": pa.array([int(c.max()) if len(c) else 0],
                                       type=pa.int64())})

    p = cn.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True).to_pandas()
    s = int(p["s"].sum()) if len(p) else 0
    n = int(p["n"].sum()) if len(p) else 0
    m = int(p["m"].max()) if len(p) else 0
    return rd.from_pandas(pd.DataFrame({
        "count": pd.array([s // (2 * pair_mult)], dtype="int64"),
        "n_codeg_pairs": pd.array([n], dtype="int64"),
        "max_codeg": pd.array([m], dtype="int64")}))


def four_cycle_stats(edges, cfg: EngineConfig = DEFAULT, *,
                     max_center_degree: Optional[int] = None):
    """Exact global 4-cycle (rectangle) count over the DIRECTED edge
    table's canonical undirected graph — the next motif after triangles
    (q_triangles_urls) and 4-cliques (q_fourcliques_urls); rectangles
    dominated by mirror/template pages are a crawl-quality signal.

    C4 = (1/2) * sum over unordered vertex pairs {a,b} of
    C(codeg(a,b), 2): each 4-cycle a-x-b-y is determined by a diagonal
    pair plus two of its common neighbors, and has exactly 2 diagonals.
    Codegrees reuse the triangles.py wedge generator (center = shared
    neighbor, pair volume sum over centers of deg^2/2);
    ``max_center_degree`` is the same explicit hub guard as
    common_neighbor_scores.  Returns a one-row Dataset
    (n_cycles4, n_codeg_pairs, max_codeg) — n_codeg_pairs is the number
    of unordered pairs sharing >= 1 neighbor.
    """
    und = canonical_undirected(edges, cfg).materialize()

    def sym(b: pa.Table) -> pa.Table:
        s, d = b.column("src").to_numpy(), b.column("dst").to_numpy()
        return pa.table({"src": pa.array(np.concatenate([s, d])),
                         "dst": pa.array(np.concatenate([d, s]))})

    centers = und.map_batches(sym, batch_format="pyarrow",
                              zero_copy_batch=True)
    if max_center_degree is not None:
        deg = _degrees_canonical(und).materialize()
        small = deg.filter(expr=f"deg <= {int(max_center_degree)}")
        centers = hash_join(centers, small, on="src", right_on="vid",
                            join_type="semi", num_parts=cfg.num_parts,
                            left_schema=_E_SCHEMA,
                            right_schema=_DEG_SCHEMA)
    ordered = centers.map_batches(
        lambda b: pa.table({"src": b.column("src"), "dst": b.column("dst"),
                            "deg_dst": b.column("dst")}),
        batch_format="pyarrow", zero_copy_batch=True)
    pairs = _wedges(ordered, cfg)
    cn = grouped_aggregate(pairs.select_columns(["a", "b"]), ["a", "b"],
                           {"cn": ("count", None)},
                           num_parts=cfg.num_parts)
    out = _codeg_stats(cn, pair_mult=2)
    return out.map_batches(
        lambda b: b.rename_columns(["n_cycles4", "n_codeg_pairs",
                                    "max_codeg"]),
        batch_format="pyarrow", zero_copy_batch=True)


def butterfly_stats(ds, left_col: str, right_col: str,
                    cfg: EngineConfig = DEFAULT, *,
                    max_center_degree: Optional[int] = None):
    """Exact butterfly (2x2 biclique) count over a BIPARTITE relation
    given as (left, right) rows — co-purchase structure in an
    order x part table, co-visit structure in a user x page log.

    Parallel (left, right) duplicates collapse first (distinct).
    Butterflies = sum over unordered left-pairs of C(codeg, 2), with
    codeg the number of shared right-vertices; each butterfly is
    counted exactly once (its two left corners form one pair).  Pair
    generation centers on the RIGHT side (volume sum over right
    vertices of deg^2/2); ``max_center_degree`` excludes hot right
    vertices (documented cap, not silent truncation).  Returns a
    one-row Dataset (n_butterflies, n_codeg_pairs, max_codeg).
    """
    from ..ops.dedup import distinct

    pq_ = distinct(ds.select_columns([left_col, right_col]),
                   [left_col, right_col], num_parts=cfg.num_parts)

    def orient(b: pa.Table) -> pa.Table:
        return pa.table({"src": b.column(right_col).cast(pa.int64()),
                         "dst": b.column(left_col).cast(pa.int64()),
                         "deg_dst": b.column(left_col).cast(pa.int64())})

    centers = pq_.map_batches(orient, batch_format="pyarrow",
                              zero_copy_batch=True)
    if max_center_degree is not None:
        deg = grouped_aggregate(centers.select_columns(["src"]), ["src"],
                                {"deg": ("count", None)},
                                num_parts=cfg.num_parts)
        small = deg.filter(expr=f"deg <= {int(max_center_degree)}")
        centers = hash_join(
            centers, small, on="src", right_on="src", join_type="semi",
            num_parts=cfg.num_parts,
            left_schema=pa.schema([pa.field("src", pa.int64()),
                                   pa.field("dst", pa.int64()),
                                   pa.field("deg_dst", pa.int64())]),
            right_schema=pa.schema([pa.field("src", pa.int64()),
                                    pa.field("deg", pa.int64())]))
    pairs = _wedges(centers, cfg)
    cn = grouped_aggregate(pairs.select_columns(["a", "b"]), ["a", "b"],
                           {"cn": ("count", None)},
                           num_parts=cfg.num_parts)
    out = _codeg_stats(cn, pair_mult=1)
    return out.map_batches(
        lambda b: b.rename_columns(["n_butterflies", "n_codeg_pairs",
                                    "max_codeg"]),
        batch_format="pyarrow", zero_copy_batch=True)
