"""Graph-pipeline conformance queries over the synthesized page corpus.

BASELINE.json's input_hint table (url, warc_ts, html, text, lang) does
not exist in the driver testdata, so these queries synthesize it
deterministically at a scale keyed to the sf directory (fixtures.py,
seed fixed) and run the real pipelines.

Oracles: the fixture generator also writes its authored TRUTH as
DuckDB-readable parquet (the pages table's `text` column and the anchors
table, fixtures.ensure_anchors_parquet) — the url-level queries
(extraction stats, vertex/edge sets, degree/host distributions, dense-id
properties) therefore carry SQL oracles via `build_oracles()`, which
embeds the fixture paths for the gate scale (documents-rows -> n=500 at
sf0.001/sf0.01).  The iterative/hashed queries (PageRank, CC, LP,
triangles, splits) are not SQL-expressible — the driver records
rows-only checks and exact/allclose correctness is enforced by the
pytest oracles (tests/oracle.py).
"""

from __future__ import annotations

import os
from typing import Callable, Dict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from .config import DEFAULT
from .fixtures import ensure_anchors_parquet, ensure_pages_parquet
from .graph.build import GraphLayers, build_graph, read_layer, symmetrize

QUERIES: Dict[str, Callable] = {}

_SEED = 123
_GATE_N = 500  # _scale_for() at the driver's correctness tiers

# shared oracle CTE bodies: canonical undirected simple graph over the
# authored anchors + its degree table (graph/metrics.py semantics)
_UND_BODY = ("SELECT least(src_url, dst_url) AS u, "
             "greatest(src_url, dst_url) AS v FROM {A} "
             "WHERE src_url <> dst_url GROUP BY 1, 2")
_DEG_BODY = ("SELECT x AS url, count(*) AS deg FROM "
             "(SELECT u AS x FROM und UNION ALL SELECT v AS x FROM und) "
             "GROUP BY x")


def _triad_census_sql(A: str) -> str:
    """Connected triad census (13 types with >= 2 non-null dyads)
    oracle: wedge-enumerated distinct connected triples + 6 arc joins
    + the 64-entry bits->type lookup.  The lookup constants come from
    graph/triads.py::TRIAD_TABLE, which is itself pinned against an
    independent exemplar-isomorphism oracle over all 64 patterns in
    tests/test_triads.py — so the SQL classification is certified,
    not self-referential."""
    from .graph.triads import TRIAD_NAMES, TRIAD_TABLE

    lut = ", ".join(f"({b}, '{TRIAD_NAMES[TRIAD_TABLE[b]]}')"
                    for b in range(64))
    conn = [n for n in TRIAD_NAMES if n not in ("003", "012", "102")]
    names = ", ".join(f"('{n}')" for n in conn)
    return (
        f"WITH arc AS (SELECT DISTINCT src_url s, dst_url d FROM {A} "
        f"WHERE src_url <> dst_url), "
        f"und AS (SELECT least(s, d) u, greatest(s, d) v FROM arc "
        f"GROUP BY 1, 2), "
        f"sym AS (SELECT u a, v b FROM und UNION ALL SELECT v, u FROM und), "
        f"wed AS (SELECT e1.a c, e1.b x, e2.b y FROM sym e1 "
        f"JOIN sym e2 ON e1.a = e2.a AND e1.b < e2.b), "
        f"tri AS (SELECT DISTINCT least(c, x) v1, "
        f"CASE WHEN c < x THEN x WHEN c > y THEN y ELSE c END v2, "
        f"greatest(c, y) v3 FROM wed), "
        f"bits AS (SELECT "
        f"CASE WHEN a1.s IS NULL THEN 0 ELSE 1 END "
        f"+ CASE WHEN a2.s IS NULL THEN 0 ELSE 2 END "
        f"+ CASE WHEN a3.s IS NULL THEN 0 ELSE 4 END "
        f"+ CASE WHEN a4.s IS NULL THEN 0 ELSE 8 END "
        f"+ CASE WHEN a5.s IS NULL THEN 0 ELSE 16 END "
        f"+ CASE WHEN a6.s IS NULL THEN 0 ELSE 32 END AS b FROM tri t "
        f"LEFT JOIN arc a1 ON a1.s = t.v1 AND a1.d = t.v2 "
        f"LEFT JOIN arc a2 ON a2.s = t.v2 AND a2.d = t.v1 "
        f"LEFT JOIN arc a3 ON a3.s = t.v1 AND a3.d = t.v3 "
        f"LEFT JOIN arc a4 ON a4.s = t.v3 AND a4.d = t.v1 "
        f"LEFT JOIN arc a5 ON a5.s = t.v2 AND a5.d = t.v3 "
        f"LEFT JOIN arc a6 ON a6.s = t.v3 AND a6.d = t.v2), "
        f"lut(b, name) AS (VALUES {lut}), "
        f"counts AS (SELECT l.name, count(*) AS n FROM bits "
        f"JOIN lut l ON l.b = bits.b GROUP BY l.name), "
        f"allt(name) AS (VALUES {names}) "
        f"SELECT allt.name AS triad_type, coalesce(c.n, CAST(0 AS BIGINT)) "
        f"AS n FROM allt LEFT JOIN counts c ON c.name = allt.name")


def _q(name: str):
    def deco(fn):
        QUERIES[name] = fn
        return fn

    return deco


def build_oracles(ensure: bool = True) -> Dict[str, str]:
    """DuckDB oracle SQL for the url-level graph queries, reading the
    fixture truth parquet directly (paths for the gate scale n=500 —
    the same corpus graph_for() builds at sf0.001/sf0.01).

    ``ensure=False`` returns the same SQL without synthesizing the
    fixture files — for callers that only need the oracled NAME SET
    (e.g. ``queries()`` ordering); the matching Ray queries write the
    fixtures before any oracle actually runs."""
    if ensure:
        pages = ensure_pages_parquet(_GATE_N, _SEED)
        anchors = ensure_anchors_parquet(_GATE_N, _SEED)
    else:
        from .fixtures import pages_dir, anchors_path

        pages = pages_dir(_GATE_N, _SEED)
        anchors = anchors_path(_GATE_N, _SEED)
    P = f"read_parquet('{pages}/*.parquet')"
    A = f"read_parquet('{anchors}')"
    vert = (f"(SELECT url FROM {P} UNION SELECT dst_url AS url FROM {A})")
    return {
        "q_extract_links":
            f"SELECT p.url, octet_length(encode(p.text)) AS text_len, "
            f"coalesce(a.n, 0) AS n_links FROM {P} p LEFT JOIN "
            f"(SELECT src_url, count(*) AS n FROM {A} GROUP BY src_url) a "
            f"ON a.src_url = p.url",
        "q_vertex_urls": f"SELECT url FROM {vert} v",
        "q_vertex_id_props":
            f"SELECT count(*) AS n_vertices, CAST(0 AS BIGINT) AS min_vid, "
            f"count(*) - 1 AS max_vid, count(*) AS n_distinct FROM {vert} v",
        "q_edge_urls":
            f"SELECT DISTINCT src_url, dst_url FROM {A}",
        "q_degree_distribution":
            f"SELECT outdeg, count(*) AS n_vertices FROM ("
            f"SELECT src_url, count(*) AS outdeg FROM "
            f"(SELECT DISTINCT src_url, dst_url FROM {A}) GROUP BY src_url) "
            f"GROUP BY outdeg",
        "q_host_counts":
            f"SELECT string_split(url, '/')[3] AS host, count(*) AS n_pages "
            f"FROM {vert} v GROUP BY host",
        # reciprocal rank fusion of two per-host page rankings (text
        # length / outlink count).  Two-term IEEE sums are commutative,
        # so the float scores compare bitwise
        "q_rrf_pages":
            f"WITH p AS (SELECT url, string_split(url, '/')[3] AS host, "
            f"octet_length(encode(text)) AS len FROM {P}), "
            f"a AS (SELECT src_url, count(*) AS n FROM {A} "
            f"GROUP BY src_url), "
            f"f AS (SELECT p.url, p.host, p.len, coalesce(a.n, 0) AS "
            f"n_links FROM p LEFT JOIN a ON a.src_url = p.url), "
            f"r1 AS (SELECT host, url, row_number() OVER (PARTITION BY "
            f"host ORDER BY len DESC, url) AS r FROM f), "
            f"r2 AS (SELECT host, url, row_number() OVER (PARTITION BY "
            f"host ORDER BY n_links DESC, url) AS r FROM f) "
            f"SELECT f.host, f.url, 1.0/(60+r1.r) + 1.0/(60+r2.r) AS rrf "
            f"FROM f JOIN r1 ON r1.url = f.url JOIN r2 ON r2.url = f.url",
        # Small 1973 co-citation: pairs cited by the same page, exact
        # integer counts; url-canonical pair order on both sides
        "q_cocitation_urls":
            f"WITH e AS (SELECT DISTINCT src_url, dst_url FROM {A} "
            f"WHERE src_url <> dst_url) "
            f"SELECT least(e1.dst_url, e2.dst_url) AS a_url, "
            f"greatest(e1.dst_url, e2.dst_url) AS b_url, "
            f"count(*) AS score FROM e e1 JOIN e e2 "
            f"ON e1.src_url = e2.src_url AND e1.dst_url < e2.dst_url "
            f"GROUP BY 1, 2",
        # Kessler 1963 bibliographic coupling: pairs citing the same page
        "q_bib_coupling_urls":
            f"WITH e AS (SELECT DISTINCT src_url, dst_url FROM {A} "
            f"WHERE src_url <> dst_url) "
            f"SELECT least(e1.src_url, e2.src_url) AS a_url, "
            f"greatest(e1.src_url, e2.src_url) AS b_url, "
            f"count(*) AS score FROM e e1 JOIN e e2 "
            f"ON e1.dst_url = e2.dst_url AND e1.src_url < e2.src_url "
            f"GROUP BY 1, 2",
        # SALSA closed form (Lempel & Moran 2000): bipartite
        # hub/authority support-graph components via recursive closure,
        # then score = (side-count-in-component * degree) / (side-total
        # * component-edge-count) — exact integer products, ONE double
        # division on both sides -> check_exact
        "q_salsa_urls":
            f"WITH RECURSIVE "
            f"e AS (SELECT DISTINCT src_url AS s, dst_url AS d FROM {A} "
            f"WHERE src_url <> dst_url), "
            f"be AS (SELECT 'h:'||s AS a, 'a:'||d AS b FROM e "
            f"UNION SELECT 'a:'||d, 'h:'||s FROM e), "
            f"nodes AS (SELECT DISTINCT a AS v FROM be), "
            f"walk AS (SELECT v, v AS reach FROM nodes "
            f"UNION SELECT w.v, be.b FROM walk w JOIN be ON be.a = w.reach), "
            f"comp AS (SELECT v, min(reach) AS c FROM walk GROUP BY v), "
            f"ind AS (SELECT d AS url, count(*) AS deg FROM e GROUP BY d), "
            f"outd AS (SELECT s AS url, count(*) AS deg FROM e GROUP BY s), "
            f"ac AS (SELECT i.url, i.deg, c.c FROM ind i "
            f"JOIN comp c ON c.v = 'a:'||i.url), "
            f"ast AS (SELECT c, count(*) AS n_side, sum(deg) AS m "
            f"FROM ac GROUP BY c), "
            f"atot AS (SELECT count(*) AS t FROM ind), "
            f"auth AS (SELECT ac.url, CAST(ast.n_side * ac.deg AS DOUBLE) "
            f"/ CAST(atot.t * ast.m AS DOUBLE) AS authority "
            f"FROM ac JOIN ast ON ast.c = ac.c CROSS JOIN atot), "
            f"hc AS (SELECT o.url, o.deg, c.c FROM outd o "
            f"JOIN comp c ON c.v = 'h:'||o.url), "
            f"hst AS (SELECT c, count(*) AS n_side, sum(deg) AS m "
            f"FROM hc GROUP BY c), "
            f"htot AS (SELECT count(*) AS t FROM outd), "
            f"hub AS (SELECT hc.url, CAST(hst.n_side * hc.deg AS DOUBLE) "
            f"/ CAST(htot.t * hst.m AS DOUBLE) AS hub "
            f"FROM hc JOIN hst ON hst.c = hc.c CROSS JOIN htot) "
            f"SELECT v.url, coalesce(a.authority, 0.0) AS authority, "
            f"coalesce(h.hub, 0.0) AS hub FROM {vert} v "
            f"LEFT JOIN auth a ON a.url = v.url "
            f"LEFT JOIN hub h ON h.url = v.url",
        # SAGE-mean feature smoothing, 1 round: in-neighbor mean of the
        # source pages' text byte lengths.  BIGINT sum + one division
        # on both sides -> bitwise-comparable DOUBLE
        "q_feature_smooth_urls":
            f"WITH e AS (SELECT DISTINCT src_url, dst_url FROM {A}), "
            f"lens AS (SELECT url, octet_length(encode(text)) AS len "
            f"FROM {P}), "
            f"agg AS (SELECT e.dst_url AS url, sum(l.len) AS s, "
            f"count(*) AS c FROM e JOIN lens l ON l.url = e.src_url "
            f"GROUP BY e.dst_url) "
            f"SELECT v.url, coalesce(CAST(a.s AS DOUBLE) / a.c, 0.0) "
            f"AS smooth FROM {vert} v LEFT JOIN agg a ON a.url = v.url",
        # exact CC certification in pure SQL: recursive transitive
        # closure over the authored undirected anchor graph, then the
        # vid-free component-SIZE distribution (bounded at gate scale:
        # closure rows = sum of component sizes squared)
        "q_component_size_distribution":
            f"WITH RECURSIVE "
            f"e AS (SELECT src_url AS a, dst_url AS b FROM {A} "
            f"UNION SELECT dst_url, src_url FROM {A}), "
            f"verts AS {vert}, "
            f"walk AS (SELECT url AS v, url AS reach FROM verts "
            f"UNION SELECT w.v, e.b AS reach FROM walk w "
            f"JOIN e ON e.a = w.reach), "
            f"comp AS (SELECT v, min(reach) AS c FROM walk GROUP BY v) "
            f"SELECT sz AS size, count(*) AS n_components FROM "
            f"(SELECT c, count(*) AS sz FROM comp GROUP BY c) GROUP BY sz",
        # per-VERTEX CC certification: component representative =
        # lexicographic min url over the component (labels themselves are
        # min-vid and not SQL-reproducible; the url-level rep is)
        "q_components_urls":
            f"WITH RECURSIVE "
            f"e AS (SELECT src_url AS a, dst_url AS b FROM {A} "
            f"UNION SELECT dst_url, src_url FROM {A}), "
            f"verts AS {vert}, "
            f"walk AS (SELECT url AS v, url AS reach FROM verts "
            f"UNION SELECT w.v, e.b AS reach FROM walk w "
            f"JOIN e ON e.a = w.reach) "
            f"SELECT v AS url, min(reach) AS component_url "
            f"FROM walk GROUP BY v",
        # per-VERTEX SCC certification: directed recursive closure, then
        # mutual reachability (u~v iff reach(u,v) AND reach(v,u)) and
        # representative = min url over the component.  walk seeds (v,v)
        # so singletons are their own rep
        "q_scc_urls":
            f"WITH RECURSIVE "
            f"e AS (SELECT DISTINCT src_url AS a, dst_url AS b FROM {A}), "
            f"verts AS {vert}, "
            f"walk AS (SELECT url AS v, url AS reach FROM verts "
            f"UNION SELECT w.v, e.b AS reach FROM walk w "
            f"JOIN e ON e.a = w.reach) "
            f"SELECT f.v AS url, min(f.reach) AS scc_url FROM walk f "
            f"JOIN walk b ON b.v = f.reach AND b.reach = f.v "
            f"GROUP BY f.v",
        # vid-free SCC certification: the multiset of SCC sizes
        "q_scc_size_distribution":
            f"WITH RECURSIVE "
            f"e AS (SELECT DISTINCT src_url AS a, dst_url AS b FROM {A}), "
            f"verts AS {vert}, "
            f"walk AS (SELECT url AS v, url AS reach FROM verts "
            f"UNION SELECT w.v, e.b AS reach FROM walk w "
            f"JOIN e ON e.a = w.reach), "
            f"scc AS (SELECT f.v, min(f.reach) AS rep FROM walk f "
            f"JOIN walk b ON b.v = f.reach AND b.reach = f.v GROUP BY f.v) "
            f"SELECT sz AS size, count(*) AS n_sccs FROM "
            f"(SELECT rep, count(*) AS sz FROM scc GROUP BY rep) "
            f"GROUP BY sz",
        # condensation DAG certification at the url level: inter-SCC
        # edges with multiplicity over the distinct directed edge set,
        # endpoints named by their SCC's min-url representative
        "q_condensation_urls":
            f"WITH RECURSIVE "
            f"e AS (SELECT DISTINCT src_url AS a, dst_url AS b FROM {A}), "
            f"verts AS {vert}, "
            f"walk AS (SELECT url AS v, url AS reach FROM verts "
            f"UNION SELECT w.v, e.b AS reach FROM walk w "
            f"JOIN e ON e.a = w.reach), "
            f"scc AS (SELECT f.v, min(f.reach) AS rep FROM walk f "
            f"JOIN walk b ON b.v = f.reach AND b.reach = f.v GROUP BY f.v) "
            f"SELECT s1.rep AS src_scc_url, s2.rep AS dst_scc_url, "
            f"count(*) AS n_edges FROM e "
            f"JOIN scc s1 ON s1.v = e.a JOIN scc s2 ON s2.v = e.b "
            f"WHERE s1.rep <> s2.rep GROUP BY 1, 2",
        # condensation topological levels: longest path from any source
        # over the SCC DAG (recursive closure rows are (v, d) pairs —
        # UNION dedups, so the walk is bounded by V * depth, not paths)
        "q_toposort_urls":
            f"WITH RECURSIVE "
            f"e AS (SELECT DISTINCT src_url AS a, dst_url AS b FROM {A}), "
            f"verts AS {vert}, "
            f"walk AS (SELECT url AS v, url AS reach FROM verts "
            f"UNION SELECT w.v, e.b AS reach FROM walk w "
            f"JOIN e ON e.a = w.reach), "
            f"scc AS (SELECT f.v, min(f.reach) AS rep FROM walk f "
            f"JOIN walk b ON b.v = f.reach AND b.reach = f.v GROUP BY f.v), "
            f"cond AS (SELECT DISTINCT s1.rep AS a, s2.rep AS b FROM e "
            f"JOIN scc s1 ON s1.v = e.a JOIN scc s2 ON s2.v = e.b "
            f"WHERE s1.rep <> s2.rep), "
            f"lp AS (SELECT rep AS v, CAST(0 AS BIGINT) AS d FROM "
            f"(SELECT DISTINCT rep FROM scc) "
            f"UNION SELECT c.b, l.d + 1 FROM lp l JOIN cond c ON c.a = l.v) "
            f"SELECT v AS scc_url, max(d) AS level FROM lp GROUP BY v",
        # heavy-tail exponent: continuous-MLE alpha over the canonical
        # undirected degree table (Clauset-Shalizi-Newman eq. 3.1);
        # rounded 6dp both sides (summation-order discipline)
        "q_powerlaw":
            f"WITH und AS ({_UND_BODY.format(A=A)}), deg AS ({_DEG_BODY}) "
            f"SELECT count(*) AS n, "
            f"round(1 + count(*) / sum(ln(CAST(deg AS DOUBLE))), 6) "
            f"AS alpha FROM deg WHERE deg >= 1",
        # per-VERTEX triangle certification: triple self-join over the
        # distinct canonical (lexicographic min/max) anchor pairs — the
        # undirected edge SET is vid-order-independent, so counts match
        # the vid-level orientation algorithm exactly
        "q_triangles_urls":
            f"WITH und AS (SELECT least(src_url, dst_url) AS u, "
            f"greatest(src_url, dst_url) AS v FROM {A} "
            f"WHERE src_url <> dst_url GROUP BY 1, 2), "
            f"tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c "
            f"FROM und e1 JOIN und e2 ON e2.u = e1.v "
            f"JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v) "
            f"SELECT url, count(*) AS n_triangles FROM "
            f"(SELECT a AS url FROM tri UNION ALL "
            f"SELECT b AS url FROM tri UNION ALL "
            f"SELECT c AS url FROM tri) GROUP BY url",
        "q_degree_gini":
            f"WITH und AS ({_UND_BODY.format(A=A)}), "
            f"deg AS ({_DEG_BODY}), "
            f"ranked AS (SELECT deg AS d, row_number() OVER "
            f"(ORDER BY deg, url) AS i FROM deg) "
            f"SELECT count(*) AS n_vertices, "
            f"CAST(sum(d) AS BIGINT) AS total_deg, "
            f"round((2.0 * sum(i * d)) / (count(*) * sum(d)) "
            f"- (count(*) + 1.0) / count(*), 9) AS gini FROM ranked",
        "q_rich_club":
            f"WITH und AS ({_UND_BODY.format(A=A)}), "
            f"deg AS ({_DEG_BODY}), "
            f"e AS (SELECT least(da.deg, db.deg) AS m FROM und "
            f"JOIN deg da ON da.url = und.u "
            f"JOIN deg db ON db.url = und.v), "
            f"ks(k) AS (VALUES (CAST(1 AS BIGINT)), (2), (4), (8), (16)) "
            f"SELECT k, "
            f"(SELECT count(*) FROM deg WHERE deg > k) AS n_k, "
            f"(SELECT count(*) FROM e WHERE m > k) AS e_k, "
            f"CASE WHEN (SELECT count(*) FROM deg WHERE deg > k) >= 2 "
            f"THEN round(2.0 * (SELECT count(*) FROM e WHERE m > k) / "
            f"((SELECT count(*) FROM deg WHERE deg > k) * "
            f"((SELECT count(*) FROM deg WHERE deg > k) - 1)), 9) "
            f"ELSE 0.0 END AS phi FROM ks",
        "q_triad_census_urls": _triad_census_sql(A),
        "q_fourcliques_urls":
            f"WITH und AS ({_UND_BODY.format(A=A)}), "
            f"tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c "
            f"FROM und e1 JOIN und e2 ON e2.u = e1.v "
            f"JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v), "
            f"quad AS (SELECT t.a, t.b, t.c, e4.v AS d FROM tri t "
            f"JOIN und e4 ON e4.u = t.c "
            f"JOIN und e5 ON e5.u = t.a AND e5.v = e4.v "
            f"JOIN und e6 ON e6.u = t.b AND e6.v = e4.v) "
            f"SELECT url, count(*) AS n_cliques4 FROM "
            f"(SELECT a AS url FROM quad UNION ALL "
            f"SELECT b AS url FROM quad UNION ALL "
            f"SELECT c AS url FROM quad UNION ALL "
            f"SELECT d AS url FROM quad) GROUP BY url",
        # structural / link-prediction metrics (graph/metrics.py): every
        # float below is ONE double division of exactly-representable
        # integers, computed identically by numpy and DuckDB — bitwise
        # hash-certifiable
        "q_clustering_coeff":
            f"WITH und AS ({_UND_BODY.format(A=A)}), deg AS ({_DEG_BODY}), "
            f"tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c "
            f"FROM und e1 JOIN und e2 ON e2.u = e1.v "
            f"JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v), "
            f"pertri AS (SELECT url, count(*) AS n FROM "
            f"(SELECT a AS url FROM tri UNION ALL "
            f"SELECT b AS url FROM tri UNION ALL "
            f"SELECT c AS url FROM tri) GROUP BY url) "
            f"SELECT d.url, d.deg AS degree, "
            f"coalesce(p.n, CAST(0 AS BIGINT)) AS n_triangles, "
            f"CASE WHEN d.deg >= 2 THEN "
            f"CAST(2 * coalesce(p.n, 0) AS DOUBLE) / (d.deg * (d.deg - 1)) "
            f"ELSE 0.0 END AS lcc "
            f"FROM deg d LEFT JOIN pertri p ON p.url = d.url",
        "q_common_neighbors":
            f"WITH und AS ({_UND_BODY.format(A=A)}), deg AS ({_DEG_BODY}), "
            f"sym AS (SELECT u AS a, v AS b FROM und "
            f"UNION ALL SELECT v, u FROM und), "
            f"wed AS (SELECT e1.b AS pa, e2.b AS pb, count(*) AS cn "
            f"FROM sym e1 JOIN sym e2 ON e1.a = e2.a AND e1.b < e2.b "
            f"GROUP BY 1, 2) "
            f"SELECT w.pa AS url_a, w.pb AS url_b, "
            f"w.cn AS common_neighbors, "
            f"CAST(w.cn AS DOUBLE) / (da.deg + db.deg - w.cn) AS jaccard "
            f"FROM wed w JOIN deg da ON da.url = w.pa "
            f"JOIN deg db ON db.url = w.pb",
        # BFS hop distances from the lexicographic-min-url vertex:
        # recursive closure bounded by |V| (cycle guard); min(d) per
        # reached vertex = exact hop distance
        "q_bfs_hops":
            f"WITH RECURSIVE "
            f"e AS (SELECT src_url AS a, dst_url AS b FROM {A} "
            f"UNION SELECT dst_url, src_url FROM {A}), "
            f"verts AS {vert}, "
            f"walk AS (SELECT url AS v, CAST(0 AS BIGINT) AS d FROM verts "
            f"WHERE url = (SELECT min(url) FROM verts v2) "
            f"UNION SELECT e.b, w.d + 1 FROM walk w JOIN e ON e.a = w.v "
            f"WHERE w.d < (SELECT count(*) FROM verts v3)) "
            f"SELECT v AS url, min(d) AS dist FROM walk GROUP BY v",
        "q_reciprocity":
            f"WITH de AS (SELECT DISTINCT src_url AS s, dst_url AS d "
            f"FROM {A} WHERE src_url <> dst_url) "
            f"SELECT count(*) AS n_edges, count(r.s) AS n_reciprocal, "
            f"CAST(count(r.s) AS DOUBLE) / count(*) AS reciprocity "
            f"FROM de x LEFT JOIN de r ON x.s = r.d AND x.d = r.s",
        "q_assortativity":
            f"WITH und AS ({_UND_BODY.format(A=A)}), deg AS ({_DEG_BODY}), "
            f"ed AS (SELECT da.deg AS x, db.deg AS y FROM und e "
            f"JOIN deg da ON da.url = e.u JOIN deg db ON db.url = e.v), "
            f"s AS (SELECT CAST(2 * count(*) AS BIGINT) AS m, "
            f"CAST(sum(x) + sum(y) AS BIGINT) AS sx, "
            f"CAST(2 * sum(x * y) AS BIGINT) AS sxy, "
            f"CAST(sum(x * x) + sum(y * y) AS BIGINT) AS sxx FROM ed) "
            f"SELECT m, sx, sxy, sxx, "
            f"CAST(m * sxy - sx * sx AS DOUBLE) / (m * sxx - sx * sx) "
            f"AS assortativity FROM s",
        # SCAN sigma per edge: open common neighbors (= triangle
        # support) via the symmetric wedge join, then
        # (support+2)/sqrt((du+1)(dv+1)) — exact ints into one sqrt +
        # one division, rounded 9 dp on both sides
        "q_scan_edges":
            f"WITH und AS ({_UND_BODY.format(A=A)}), deg AS ({_DEG_BODY}), "
            f"sym AS (SELECT u AS a, v AS b FROM und "
            f"UNION ALL SELECT v, u FROM und), "
            f"sup AS (SELECT e.u, e.v, count(*) AS s FROM und e "
            f"JOIN sym n1 ON n1.a = e.u JOIN sym n2 "
            f"ON n2.a = e.v AND n2.b = n1.b GROUP BY e.u, e.v) "
            f"SELECT e.u AS url_a, e.v AS url_b, "
            f"coalesce(sup.s, CAST(0 AS BIGINT)) AS support, "
            f"round((coalesce(sup.s, 0) + 2) / "
            f"sqrt(CAST((da.deg + 1) * (db.deg + 1) AS DOUBLE)), 9) "
            f"AS sigma "
            f"FROM und e LEFT JOIN sup ON sup.u = e.u AND sup.v = e.v "
            f"JOIN deg da ON da.url = e.u JOIN deg db ON db.url = e.v",
        # stub-weighted knn(k): per degree value the exact int sum of
        # neighbor degrees over degree-k endpoints, ONE division
        "q_avg_neighbor_degree":
            f"WITH und AS ({_UND_BODY.format(A=A)}), deg AS ({_DEG_BODY}), "
            f"sym AS (SELECT u AS a, v AS b FROM und "
            f"UNION ALL SELECT v, u FROM und), "
            f"per_v AS (SELECT s.a AS url, CAST(sum(d.deg) AS BIGINT) "
            f"AS sum_nbr FROM sym s JOIN deg d ON d.url = s.b "
            f"GROUP BY s.a) "
            f"SELECT dg.deg, count(*) AS n_vertices, "
            f"CAST(sum(p.sum_nbr) AS BIGINT) AS sum_neighbor_deg, "
            f"round(CAST(sum(p.sum_nbr) AS DOUBLE) / "
            f"(dg.deg * count(*)), 9) AS knn "
            f"FROM per_v p JOIN deg dg ON dg.url = p.url GROUP BY dg.deg",
        # redirect resolution: min-outlink functional mapping chased by
        # a 32-hop-bounded recursive closure; the engine's pointer
        # doubling lands on the identical (position, hops) rows
        "q_redirect_resolution":
            f"WITH RECURSIVE "
            f"m AS (SELECT src_url AS k, min(dst_url) AS t FROM {A} "
            f"GROUP BY src_url), "
            f"mm AS (SELECT k, t FROM m WHERE k <> t), "
            f"walk AS (SELECT k, t AS cur, CAST(1 AS BIGINT) AS h "
            f"FROM mm UNION ALL "
            f"SELECT w.k, n.t, w.h + 1 FROM walk w "
            f"JOIN mm n ON n.k = w.cur WHERE w.h < 32), "
            f"fin AS (SELECT k, max(h) AS mh FROM walk GROUP BY k) "
            f"SELECT w.k AS url, w.cur AS final, w.h AS hops "
            f"FROM walk w JOIN fin f ON f.k = w.k AND f.mh = w.h",
        # intra-host fraction over distinct directed edges: exact ints,
        # one division
        "q_host_homophily":
            f"WITH de AS (SELECT DISTINCT src_url, dst_url FROM {A}) "
            f"SELECT count(*) AS n_edges, "
            f"CAST(sum(CASE WHEN string_split(src_url, '/')[3] = "
            f"string_split(dst_url, '/')[3] THEN 1 ELSE 0 END) AS BIGINT) "
            f"AS n_intra, "
            f"CAST(sum(CASE WHEN string_split(src_url, '/')[3] = "
            f"string_split(dst_url, '/')[3] THEN 1 ELSE 0 END) AS DOUBLE) "
            f"/ count(*) AS homophily FROM de",
        # per-page outlink-host Shannon entropy from exact counts
        "q_outlink_host_entropy":
            f"WITH c AS (SELECT src_url, string_split(dst_url, '/')[3] "
            f"AS dst_host, count(*) AS cnt FROM {A} GROUP BY 1, 2), "
            f"g AS (SELECT src_url, CAST(sum(cnt) AS BIGINT) AS n, "
            f"count(*) AS n_distinct, sum(cnt * ln(cnt)) AS s FROM c "
            f"GROUP BY src_url) "
            f"SELECT src_url, n, n_distinct, "
            f"round(ln(n) - s / n, 9) AS entropy FROM g",
        # Leiden connectivity-refinement kernel certified exactly:
        # connected components RESTRICTED to same-host edges (labels =
        # host classes), per-vertex rep = min url over the intra-host
        # piece.  Recursive closure over the host-filtered undirected
        # anchor graph
        "q_intra_host_components":
            f"WITH RECURSIVE "
            f"he AS (SELECT src_url AS a, dst_url AS b FROM {A} "
            f"WHERE string_split(src_url, '/')[3] = "
            f"string_split(dst_url, '/')[3] "
            f"UNION SELECT dst_url, src_url FROM {A} "
            f"WHERE string_split(src_url, '/')[3] = "
            f"string_split(dst_url, '/')[3]), "
            f"verts AS {vert}, "
            f"walk AS (SELECT url AS v, url AS reach FROM verts "
            f"UNION SELECT w.v, he.b AS reach FROM walk w "
            f"JOIN he ON he.a = w.reach) "
            f"SELECT v AS url, min(reach) AS component_url "
            f"FROM walk GROUP BY v",
        # disparity-filter backbone of the host graph: null-model
        # p-value pow(1 - w/s, k-1) from the source host's
        # degree/strength over link-multiplicity weights (distinct
        # url-level edges -> host-pair counts, self-pairs included)
        "q_host_backbone_disparity":
            f"WITH de AS (SELECT DISTINCT src_url, dst_url FROM {A}), "
            f"he AS (SELECT string_split(src_url, '/')[3] AS sh, "
            f"string_split(dst_url, '/')[3] AS dh, "
            f"count(*) AS n_links FROM de GROUP BY 1, 2), "
            f"g AS (SELECT sh, count(*) AS k, "
            f"CAST(sum(n_links) AS DOUBLE) AS s FROM he GROUP BY sh) "
            f"SELECT he.sh AS src_host, he.dh AS dst_host, "
            f"he.n_links, "
            f"round(pow(1 - he.n_links / g.s, g.k - 1), 9) AS p "
            f"FROM he JOIN g ON g.sh = he.sh",
        # Newman discrete (language) assortativity from the exact
        # integer mixing matrix; r = (tr*t - sab)/(t*t - sab) — int
        # products, ONE division, bitwise cross-engine
        "q_lang_assortativity":
            f"WITH de AS (SELECT DISTINCT src_url, dst_url FROM {A}), "
            f"m AS (SELECT p1.lang AS la, p2.lang AS lb, "
            f"count(*) AS n FROM de "
            f"JOIN {P} p1 ON p1.url = de.src_url "
            f"JOIN {P} p2 ON p2.url = de.dst_url GROUP BY 1, 2), "
            f"tot AS (SELECT sum(n) AS t, "
            f"sum(CASE WHEN la = lb THEN n ELSE 0 END) AS tr FROM m), "
            f"ai AS (SELECT la, sum(n) AS a FROM m GROUP BY la), "
            f"bi AS (SELECT lb, sum(n) AS b FROM m GROUP BY lb), "
            f"ab AS (SELECT sum(ai.a * bi.b) AS sab FROM ai "
            f"JOIN bi ON bi.lb = ai.la) "
            f"SELECT CAST(tot.t AS BIGINT) AS n_edges, "
            f"CAST(tot.tr AS BIGINT) AS n_same, "
            f"round(CAST(tot.tr * tot.t - ab.sab AS DOUBLE) / "
            f"CAST(tot.t * tot.t - ab.sab AS DOUBLE), 9) "
            f"AS assortativity FROM tot CROSS JOIN ab",
        # hub-knockout robustness: remove top-10 undirected-degree
        # hubs (ties -> smallest url), then component census of the
        # survivors via recursive closure
        "q_hub_robustness":
            f"WITH RECURSIVE "
            f"e AS (SELECT src_url AS a, dst_url AS b FROM {A} "
            f"UNION SELECT dst_url, src_url FROM {A}), "
            f"dg AS (SELECT a, count(*) AS deg FROM e GROUP BY a), "
            f"top AS (SELECT a FROM dg ORDER BY deg DESC, a ASC "
            f"LIMIT 10), "
            f"fe AS (SELECT a, b FROM e WHERE "
            f"a NOT IN (SELECT a FROM top) "
            f"AND b NOT IN (SELECT a FROM top)), "
            f"verts AS {vert}, "
            f"remain AS (SELECT url AS v FROM verts "
            f"WHERE url NOT IN (SELECT a FROM top)), "
            f"walk AS (SELECT v, v AS reach FROM remain "
            f"UNION SELECT w.v, fe.b AS reach FROM walk w "
            f"JOIN fe ON fe.a = w.reach), "
            f"comp AS (SELECT v, min(reach) AS c FROM walk "
            f"GROUP BY v), "
            f"sz AS (SELECT c, count(*) AS n FROM comp GROUP BY c) "
            f"SELECT 10 AS k_removed, "
            f"CAST(sum(n) AS BIGINT) AS n_remaining, "
            f"count(*) AS n_components, "
            f"CAST(max(n) AS BIGINT) AS largest_cc FROM sz",
        # exact 4-cycle census: C4 = sum over unordered pairs of
        # C(codeg, 2) / 2 (each rectangle has two diagonals)
        "q_fourcycles":
            f"WITH und AS ({_UND_BODY.format(A=A)}), "
            f"sym AS (SELECT u AS a, v AS b FROM und "
            f"UNION ALL SELECT v, u FROM und), "
            f"wed AS (SELECT e1.b AS pa, e2.b AS pb, count(*) AS cn "
            f"FROM sym e1 JOIN sym e2 ON e1.a = e2.a AND e1.b < e2.b "
            f"GROUP BY 1, 2) "
            f"SELECT CAST(coalesce(sum(cn * (cn - 1)), 0) // 4 "
            f"AS BIGINT) AS n_cycles4, "
            f"count(*) AS n_codeg_pairs, "
            f"coalesce(max(cn), 0) AS max_codeg FROM wed",
        # time-respecting earliest arrival from the min-url seed at t=0:
        # edge usable iff its (src-crawl) timestamp >= arrival(src);
        # recursive closure bounded by the (v, ts) state space
        "q_temporal_reach":
            f"WITH RECURSIVE "
            f"e AS (SELECT a.src_url AS s, a.dst_url AS d, "
            f"epoch_us(p.warc_ts) AS ts FROM {A} a "
            f"JOIN {P} p ON p.url = a.src_url), "
            f"seeds AS (SELECT DISTINCT s FROM e ORDER BY s LIMIT 10), "
            f"walk AS (SELECT s AS v, CAST(0 AS BIGINT) AS t "
            f"FROM seeds "
            f"UNION SELECT e.d, e.ts FROM walk w "
            f"JOIN e ON e.s = w.v AND e.ts >= w.t) "
            f"SELECT v AS url, min(t) AS arrival FROM walk GROUP BY v",
        # one-row structural profile: every float reuses the exact
        # expression of its standalone certified oracle (bitwise)
        "q_graph_profile":
            f"WITH RECURSIVE "
            f"se AS (SELECT src_url AS a, dst_url AS b FROM {A} "
            f"UNION SELECT dst_url, src_url FROM {A}), "
            # NB: under WITH RECURSIVE a bare A-UNION-B CTE iterates
            # with per-branch dedup only (the overlap double-counts) —
            # wrap in an explicit DISTINCT
            f"verts AS (SELECT DISTINCT url FROM {vert} vv), "
            f"walk AS (SELECT url AS v, url AS reach FROM verts "
            f"UNION SELECT w.v, se.b FROM walk w "
            f"JOIN se ON se.a = w.reach), "
            f"comp AS (SELECT v, min(reach) AS c FROM walk GROUP BY v), "
            f"sz AS (SELECT c, count(*) AS n FROM comp GROUP BY c), "
            f"und AS ({_UND_BODY.format(A=A)}), deg AS ({_DEG_BODY}), "
            f"tri AS (SELECT count(*) AS t FROM und e1 "
            f"JOIN und e2 ON e2.u = e1.v "
            f"JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v), "
            f"de AS (SELECT DISTINCT src_url AS s, dst_url AS d "
            f"FROM {A} WHERE src_url <> dst_url), "
            f"rec AS (SELECT count(*) AS ne, count(r.s) AS nr "
            f"FROM de x LEFT JOIN de r ON x.s = r.d AND x.d = r.s), "
            f"ed AS (SELECT da.deg AS x, db.deg AS y FROM und e "
            f"JOIN deg da ON da.url = e.u JOIN deg db ON db.url = e.v), "
            f"st AS (SELECT CAST(2 * count(*) AS BIGINT) AS m, "
            f"CAST(sum(x) + sum(y) AS BIGINT) AS sx, "
            f"CAST(2 * sum(x * y) AS BIGINT) AS sxy, "
            f"CAST(sum(x * x) + sum(y * y) AS BIGINT) AS sxx FROM ed) "
            f"SELECT (SELECT count(*) FROM verts) AS n_vertices, "
            f"(SELECT count(*) FROM de) AS n_edges, "
            f"(SELECT count(*) FROM sz) AS n_components, "
            f"(SELECT CAST(max(n) AS BIGINT) FROM sz) AS largest_cc, "
            f"(SELECT t FROM tri) AS n_triangles, "
            f"(SELECT CAST(nr AS DOUBLE) / ne FROM rec) AS reciprocity, "
            f"(SELECT CAST(m * sxy - sx * sx AS DOUBLE) "
            f"/ (m * sxx - sx * sx) FROM st) AS assortativity",
        # robots longest-match: rank matching rules per url by
        # (len DESC, allow DESC, prefix ASC); no match -> allowed
        "q_robots_filter":
            f"WITH p AS (SELECT url, split_part(url, '/', 3) AS host, "
            f"coalesce('/' || array_to_string("
            f"(string_split(url, '/'))[4:], '/'), '/') AS path "
            f"FROM {P}), "
            f"hosts AS (SELECT DISTINCT host FROM p), "
            f"rules AS (SELECT host, false AS allow, '/p/1' AS prefix "
            f"FROM hosts UNION ALL SELECT host, true, '/p/12' "
            f"FROM hosts UNION ALL SELECT host, false, '/x/' "
            f"FROM hosts), "
            f"m AS (SELECT p.url, r.allow, r.prefix, "
            f"row_number() OVER (PARTITION BY p.url "
            f"ORDER BY len(r.prefix) DESC, r.allow DESC, r.prefix) "
            f"AS rk FROM p JOIN rules r ON r.host = p.host "
            f"AND starts_with(p.path, r.prefix)), "
            f"best AS (SELECT url, allow, prefix FROM m WHERE rk = 1) "
            f"SELECT p.url, coalesce(b.allow, true) AS allowed, "
            f"coalesce(b.prefix, '') AS rule_prefix "
            f"FROM p LEFT JOIN best b USING (url)",
        # largest-remainder (Hamilton) apportionment of 10k slots
        "q_crawl_budget":
            f"WITH h AS (SELECT split_part(url, '/', 3) AS host, "
            f"count(*) AS n FROM {P} GROUP BY 1), "
            f"t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM h), "
            f"ex AS (SELECT host, n, n * 10000 / t.tot AS ex, "
            f"CAST(floor(n * 10000 / t.tot) AS BIGINT) AS fl "
            f"FROM h CROSS JOIN t), "
            f"lo AS (SELECT 10000 - sum(fl) AS lft FROM ex), "
            f"rk AS (SELECT host, n, fl, row_number() OVER "
            f"(ORDER BY ex - fl DESC, host) AS r FROM ex) "
            f"SELECT rk.host, CAST(rk.n AS BIGINT) AS n_pages, "
            f"CAST(rk.fl + CASE WHEN rk.r <= (SELECT lft FROM lo) "
            f"THEN 1 ELSE 0 END AS BIGINT) AS quota FROM rk",
    }


def _scale_for(sf_dir: str) -> int:
    """Deterministic corpus size keyed to the sf tier (documents rows:
    500 / 5k / 50k -> pages 500 / 5k / 50k)."""
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return max(300, n_docs)


def graph_for(sf_dir: str) -> GraphLayers:
    n = _scale_for(sf_dir)
    pages = ensure_pages_parquet(n, _SEED)
    wd = os.path.join("/tmp/hgr_querygraph", f"n{n}_seed{_SEED}")
    return build_graph(pages, wd)


def gate_graph() -> GraphLayers:
    """The FIXED gate-scale corpus graph (n=500) used by every
    SQL-oracled conformance query: the oracle SQL embeds the n=500
    fixture-truth paths, so the paired queries must run on that exact
    corpus regardless of sf tier (the sf-scaled variants —
    q_graph_vertices/q_graph_edges/etc. — stay rows-only)."""
    pages = ensure_pages_parquet(_GATE_N, _SEED)
    wd = os.path.join("/tmp/hgr_querygraph", f"n{_GATE_N}_seed{_SEED}")
    return build_graph(pages, wd)


@_q("q_extract_links")
def q_extract_links(sf_dir: str):
    """Per-page extraction head: url, byte length of text, outlink count.
    Gate-pinned corpus (oracle reads the n=500 fixture truth)."""
    g = gate_graph()
    ext = read_layer(g.extracted)

    def stats(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "url": b.column("url"),
            "text_len": pc.binary_length(b.column("text")).cast(pa.int64()),
            "n_links": pc.list_value_length(b.column("links")).cast(pa.int64()),
        })

    return ext.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


@_q("q_graph_vertices")
def q_graph_vertices(sf_dir: str):
    g = graph_for(sf_dir)
    return read_layer(g.vertices)


@_q("q_graph_edges")
def q_graph_edges(sf_dir: str):
    g = graph_for(sf_dir)
    return read_layer(g.edges)


@_q("q_vertex_urls")
def q_vertex_urls(sf_dir: str):
    """Vertex SET parity (oracle: union of page urls + anchor targets);
    gate-pinned corpus."""
    g = gate_graph()
    return read_layer(g.vertices, columns=["url"])


@_q("q_vertex_id_props")
def q_vertex_id_props(sf_dir: str):
    """Dense-id bijection properties: N vertices, vids exactly 0..N-1,
    all distinct — SQL-checkable even though the hash-ids themselves are
    not SQL-reproducible."""
    from .ops.dedup import distinct

    g = gate_graph()
    vids = read_layer(g.vertices, columns=["vid"])

    def partial(b: pa.Table) -> pa.Table:
        v = b.column("vid").to_numpy()
        if len(v) == 0:  # block re-splitting can deliver empty batches
            return pa.table({"n": pa.array([], type=pa.int64()),
                             "mn": pa.array([], type=pa.int64()),
                             "mx": pa.array([], type=pa.int64())})
        return pa.table({"n": pa.array([len(v)], type=pa.int64()),
                         "mn": pa.array([int(v.min())], type=pa.int64()),
                         "mx": pa.array([int(v.max())], type=pa.int64())})

    parts = vids.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    n_distinct = distinct(vids, ["vid"], num_parts=DEFAULT.num_parts).count()
    return pd.DataFrame({
        "n_vertices": [int(parts.n.sum())],
        "min_vid": [int(parts.mn.min())],
        "max_vid": [int(parts.mx.max())],
        "n_distinct": [int(n_distinct)]})


@_q("q_edge_urls")
def q_edge_urls(sf_dir: str):
    """Edge SET parity at the url level: map the resolved (src, dst) vid
    table BACK to (src_url, dst_url) via two bucketed hash joins with the
    vertex table; must equal the distinct authored anchor pairs."""
    from .ops.join import hash_join

    g = gate_graph()
    edges = read_layer(g.edges)
    v = read_layer(g.vertices, columns=["url", "vid"])
    e_schema = pa.schema([pa.field("src", pa.int64()),
                          pa.field("dst", pa.int64())])
    v_schema = pa.schema([pa.field("url", pa.string()),
                          pa.field("vid", pa.int64())])
    j1 = hash_join(edges, v, on="src", right_on="vid",
                   num_parts=DEFAULT.num_parts,
                   left_schema=e_schema, right_schema=v_schema)
    j1 = j1.map_batches(
        lambda b: pa.table({"dst": b.column("dst"),
                            "src_url": b.column("url")}),
        batch_format="pyarrow", zero_copy_batch=True)
    j1_schema = pa.schema([pa.field("dst", pa.int64()),
                           pa.field("src_url", pa.string())])
    j2 = hash_join(j1, v, on="dst", right_on="vid",
                   num_parts=DEFAULT.num_parts,
                   left_schema=j1_schema, right_schema=v_schema)
    return j2.map_batches(
        lambda b: pa.table({"src_url": b.column("src_url"),
                            "dst_url": b.column("url")}),
        batch_format="pyarrow", zero_copy_batch=True)


@_q("q_pagerank")
def q_pagerank(sf_dir: str):
    from .graph.pagerank import pagerank

    g = graph_for(sf_dir)
    ranks, _ = pagerank(read_layer(g.edges), g.offsets, g.workdir)

    def quant(b: pa.Table) -> pa.Table:
        r = np.round(b.column("rank").to_numpy(), 9)
        return pa.table({"vid": b.column("vid"), "rank": pa.array(r)})

    return ranks.map_batches(quant, batch_format="pyarrow", zero_copy_batch=True)


@_q("q_pagerank_mc")
def q_pagerank_mc(sf_dir: str):
    """Monte-Carlo PageRank (graph/walks.py::pagerank_mc, Avrachenkov
    et al. 2007): visit frequencies of restart walks — one pass, no
    convergence barrier; the sampled-subset / low-synchronization /
    incremental-delta regime estimator (the exact engine wins at full
    precision — see the operator docstring).  Rows-only; accuracy vs
    the exact fixpoint and bitwise layout determinism pinned in
    tests/test_pagerank_mc.py."""
    from .graph.walks import pagerank_mc

    g = graph_for(sf_dir)
    ranks, _ = pagerank_mc(read_layer(g.edges), g.offsets, g.workdir,
                           walks_per_vertex=8, walk_len=16, seed=13)

    def quant(b: pa.Table) -> pa.Table:
        return pa.table({
            "vid": b.column("vid"),
            "rank_mc": pa.array(np.round(
                b.column("rank_mc").to_numpy(), 9))})

    return ranks.map_batches(quant, batch_format="pyarrow",
                             zero_copy_batch=True)


@_q("q_spam_mass")
def q_spam_mass(sf_dir: str):
    """TrustRank spam mass (graph/spam.py, Gyongyi 2004): PageRank vs
    seed-personalized trust, (pr - trust)/pr — the link-farm detector
    composition of two certified fixpoints.  Seeds = vids 0,1,2 (the
    q_personalized_pagerank convention).  Rows-only; NumPy composition
    oracle + link-farm detection tests in tests/test_spam.py."""
    from .graph.spam import spam_mass

    g = graph_for(sf_dir)
    ds, _ = spam_mass(read_layer(g.edges), g.offsets, g.workdir,
                      np.array([0, 1, 2], dtype=np.int64))

    def quant(b: pa.Table) -> pa.Table:
        return pa.table({
            "vid": b.column("vid"),
            "spam_mass": pa.array(np.round(
                b.column("spam_mass").to_numpy(), 9))})

    return ds.map_batches(quant, batch_format="pyarrow",
                          zero_copy_batch=True)


@_q("q_word2vec_training_pairs")
def q_word2vec_training_pairs(sf_dir: str):
    """The complete graph-embedding training-data path: node2vec walks
    (graph/node2vec.py) -> windowed skip-gram pairs
    (functions/pack.py::skipgram_pairs, SQL-certified by
    q_skipgram_events) -> Mikolov noise negatives
    (skipgram_negatives, freq^0.75 law pinned in tests/test_pack.py).
    Rows-only capstone composed from individually-certified stages.
    Negatives key on full occurrence identity (walk_id, step, offset)
    so duplicate (center, context) pairs draw DIFFERENT negatives, as
    word2vec does per occurrence (r3 ADVICE)."""
    from .functions.pack import skipgram_negatives, skipgram_pairs
    from .graph.node2vec import node2vec_walks
    from .ops.agg import grouped_aggregate

    g = graph_for(sf_dir)
    walks, _ = node2vec_walks(read_layer(g.edges), g.offsets, g.workdir,
                              p=0.5, q=2.0, walk_len=8, seed=17)
    walks = walks.materialize()  # feeds vocab counts AND pairs
    pairs = skipgram_pairs(walks, "walk_id", "step", "vid", window=2,
                           keep_order=True)
    vocab = grouped_aggregate(walks.select_columns(["vid"]), ["vid"],
                              {"n": ("count", None)}).map_batches(
        lambda b: pa.table({"token": b.column("vid"),
                            "n": b.column("n")}),
        batch_format="pyarrow", zero_copy_batch=True)
    import pyarrow as _pa

    vt = _pa.concat_tables(
        [_pa.table({"token": b.column("token"), "n": b.column("n")})
         for b in vocab.iter_batches(batch_format="pyarrow")])
    return skipgram_negatives(pairs, vt, k=2, seed=29,
                              pair_id_cols=("walk_id", "step", "offset"))


_W2V_CACHE: dict = {}


def _trained_embeddings(sf_dir: str):
    """Corpus-derived node embeddings, end to end: node2vec walks ->
    skip-gram pairs -> distributed SGNS (functions/word2vec.py, parity-
    pinned allclose 1e-6 vs a sequential replay oracle in
    tests/test_word2vec.py).  Cached per process so the three trained-
    embedding queries share one training run."""
    if sf_dir in _W2V_CACHE:
        return _W2V_CACHE[sf_dir]
    from .functions.pack import skipgram_pairs
    from .functions.word2vec import embeddings_dataset, sgns_train
    from .graph.node2vec import node2vec_walks
    from .ops.agg import grouped_aggregate

    g = graph_for(sf_dir)
    walks, _ = node2vec_walks(read_layer(g.edges), g.offsets, g.workdir,
                              p=0.5, q=2.0, walk_len=8, seed=17)
    walks = walks.materialize()  # feeds vocab counts AND pairs
    pairs = skipgram_pairs(walks, "walk_id", "step", "vid", window=2,
                           keep_order=True)
    vocab = grouped_aggregate(walks.select_columns(["vid"]), ["vid"],
                              {"n": ("count", None)}).map_batches(
        lambda b: pa.table({"token": b.column("vid"),
                            "n": b.column("n")}),
        batch_format="pyarrow", zero_copy_batch=True)
    vt = pa.concat_tables(
        [pa.table({"token": b.column("token"), "n": b.column("n")})
         for b in vocab.iter_batches(batch_format="pyarrow")])
    toks, w_in, _, info = sgns_train(
        pairs, vt, id_cols=("walk_id", "step", "offset"), dim=16,
        negatives=3, lr=0.05, epochs=2, seed=31, num_parts=16,
        inner_batch=256)
    emb = embeddings_dataset(toks, w_in).materialize()
    _W2V_CACHE[sf_dir] = (toks, w_in, emb, info)
    return _W2V_CACHE[sf_dir]


@_q("q_word2vec_embeddings")
def q_word2vec_embeddings(sf_dir: str):
    """Distributed SGNS node embeddings over the certified
    walks->pairs training-data path (r3 VERDICT directive 1) — the
    step the r3 engine stopped short of.  Rows-only at the gate (one
    row per vocab token; norm + leading components quantized); trainer
    math is parity-pinned in tests/test_word2vec.py."""
    import ray.data as rd

    toks, w_in, _, _ = _trained_embeddings(sf_dir)
    w64 = w_in.astype(np.float64)
    t = pa.table({
        "token": pa.array(toks),
        "norm": pa.array(np.round(np.linalg.norm(w64, axis=1), 6)),
        "e0": pa.array(np.round(w64[:, 0], 6)),
        "e1": pa.array(np.round(w64[:, 1], 6)),
    })
    return rd.from_arrow(t)


@_q("q_kmeans_trained")
def q_kmeans_trained(sf_dir: str):
    """k-means over the CORPUS-TRAINED node embeddings (not the
    synthetic Gaussian fixture): walks -> pairs -> SGNS -> Lloyd
    rounds -> cluster sizes.  Rows-only; each stage is individually
    certified (kmeans exact-init parity in tests/test_clustering.py,
    trainer in tests/test_word2vec.py)."""
    from .functions.clustering import kmeans, kmeans_assign
    from .ops.agg import grouped_aggregate

    _, _, emb, _ = _trained_embeddings(sf_dir)
    cent, _ = kmeans(emb, 8, max_iters=10, seed=13)
    assign = kmeans_assign(emb, cent)
    return grouped_aggregate(assign.select_columns(["cluster"]),
                             ["cluster"], {"n_tokens": ("count", None)})


@_q("q_semantic_dedup_trained")
def q_semantic_dedup_trained(sf_dir: str):
    """SemDeDup over the corpus-trained embeddings — the full
    end-to-end semantic-dedup pipeline from raw pages (graph -> walks
    -> SGNS -> k-means blocking -> within-cluster cosine groups).
    Rows-only; SemDeDup exactness is pinned on planted duplicates in
    tests/test_clustering.py."""
    from .functions.clustering import semantic_dedup

    _, _, emb, _ = _trained_embeddings(sf_dir)
    return semantic_dedup(emb, k=16, threshold=0.95, seed=13)


@_q("q_rrf_pages")
def q_rrf_pages(sf_dir: str):
    """Reciprocal rank fusion (ops/fuse.py, Cormack 2009) of two
    per-host page rankings — text byte length and outlink count — the
    zero-training ranking combiner of retrieval stacks.  check_exact
    vs the DuckDB window oracle (two-term IEEE sums are commutative)."""
    import pyarrow.compute as pc

    from .ops.fuse import reciprocal_rank_fusion

    g = gate_graph()
    ext = read_layer(g.extracted, columns=["url", "text", "links"])

    def fv(b: pa.Table) -> pa.Table:
        host = pc.list_element(pc.split_pattern(b.column("url"), "/"), 2)
        return pa.table({
            "host": host,
            "url": b.column("url"),
            "len": pc.binary_length(b.column("text")).cast(pa.int64()),
            "n_links": pc.list_value_length(b.column("links"))
            .cast(pa.int64())})

    f = ext.map_batches(fv, batch_format="pyarrow",
                        zero_copy_batch=True).materialize()
    return reciprocal_rank_fusion(
        [(f, "len", True), (f, "n_links", True)],
        partition_by="host", key="url", k=60, out_col="rrf")


def _pair_scores_urls(mode: str):
    """Shared body for the co-citation / bibliographic-coupling gate
    queries: score pairs at the vid level, decorate both endpoints with
    urls (two bucketed hash joins), canonicalize pair order by URL (the
    oracle's least/greatest) — counts are order-free."""
    from .graph.metrics import cocitation_scores
    from .ops.join import hash_join

    g = gate_graph()
    sc = cocitation_scores(read_layer(g.edges), mode=mode)
    verts = read_layer(g.vertices, columns=["url", "vid"])
    v_schema = pa.schema([("url", pa.string()), ("vid", pa.int64())])
    sc_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                           ("score", pa.int64())])
    j = hash_join(sc, verts, on="a", right_on="vid",
                  num_parts=DEFAULT.num_parts, right_cols=["url"],
                  left_schema=sc_schema, right_schema=v_schema)
    j = j.map_batches(lambda b: b.rename_columns(
        ["a", "b", "score", "a_url"]),
        batch_format="pyarrow", zero_copy_batch=True)
    j_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                          ("score", pa.int64()), ("a_url", pa.string())])
    j = hash_join(j, verts, on="b", right_on="vid",
                  num_parts=DEFAULT.num_parts, right_cols=["url"],
                  left_schema=j_schema, right_schema=v_schema)
    j = j.map_batches(lambda b: b.rename_columns(
        ["b", "a", "score", "a_url", "b_url"]),
        batch_format="pyarrow", zero_copy_batch=True)

    def canon(b: pa.Table) -> pa.Table:
        au = b.column("a_url").to_numpy(zero_copy_only=False)
        bu = b.column("b_url").to_numpy(zero_copy_only=False)
        lo = np.where(au < bu, au, bu)
        hi = np.where(au < bu, bu, au)
        return pa.table({"a_url": pa.array(lo, type=pa.string()),
                         "b_url": pa.array(hi, type=pa.string()),
                         "score": b.column("score")})

    return j.map_batches(canon, batch_format="pyarrow",
                         zero_copy_batch=True)


@_q("q_cocitation_urls")
def q_cocitation_urls(sf_dir: str):
    """Co-citation counts (Small 1973; graph/metrics.py::
    cocitation_scores mode="cocitation") certified at the url level —
    THE classical citation-similarity measure of the reference's
    domain.  Exact wedge-pass integer counts; DuckDB self-join oracle,
    check_exact."""
    return _pair_scores_urls("cocitation")


@_q("q_bib_coupling_urls")
def q_bib_coupling_urls(sf_dir: str):
    """Bibliographic-coupling counts (Kessler 1963; mode="coupling"):
    pairs citing the same page.  Same machinery on reversed centers;
    DuckDB self-join oracle, check_exact."""
    return _pair_scores_urls("coupling")


@_q("q_simrank")
def q_simrank(sf_dir: str):
    """Monte-Carlo SimRank (Fogaras & Racz 2005) among the 24
    highest-out-degree pages: coupled reverse walks on the cached CSR
    shards, first-meeting-time estimator E[c^tau] — the scalable
    seed-set regime (all-pairs SimRank is O(n^2) state).  Rows-only at
    the gate; exact-fixpoint parity, bitwise layout invariance and the
    star closed form are pinned in tests/test_simrank.py."""
    from .graph.simrank import simrank_mc
    from .ops.agg import grouped_aggregate

    g = gate_graph()
    e = read_layer(g.edges)
    deg = grouped_aggregate(e.select_columns(["src"]), ["src"],
                            {"deg": ("count", None)},
                            num_parts=DEFAULT.num_parts)
    top = (deg.sort(["deg", "src"], descending=[True, False])
           .limit(24).to_pandas())
    out, _ = simrank_mc(e, g.offsets, g.workdir, top["src"].to_numpy(),
                        c=0.6, walk_len=12, walks_per_seed=128)
    out["simrank"] = out["simrank"].round(9)
    return out


@_q("q_salsa_urls")
def q_salsa_urls(sf_dir: str):
    """SALSA hub/authority scores (Lempel & Moran 2000) certified at
    the url level via the CLOSED FORM (graph/salsa.py): one bipartite
    connected-components run + degree counts + grouped sums — no power
    iteration.  Scores are exact int64 products with ONE double
    division, so the DuckDB recursive-closure oracle is check_exact.
    Power-iteration parity is pinned separately (tests/test_salsa.py)."""
    from .graph.salsa import salsa
    from .ops.join import hash_join

    g = gate_graph()
    scores, _ = salsa(read_layer(g.edges), g.offsets, g.workdir)
    verts = read_layer(g.vertices, columns=["url", "vid"])
    v_schema = pa.schema([("url", pa.string()), ("vid", pa.int64())])
    s_schema = pa.schema([("vid", pa.int64()),
                          ("authority", pa.float64()),
                          ("hub", pa.float64())])
    out = hash_join(verts, scores, on="vid", right_on="vid",
                    join_type="left", num_parts=DEFAULT.num_parts,
                    left_schema=v_schema, right_schema=s_schema)

    def fin(b: pa.Table) -> pa.Table:
        a = b.column("authority").to_numpy(zero_copy_only=False)
        h = b.column("hub").to_numpy(zero_copy_only=False)
        return pa.table({
            "url": b.column("url"),
            "authority": pa.array(np.nan_to_num(a, nan=0.0)),
            "hub": pa.array(np.nan_to_num(h, nan=0.0)),
        })

    return out.map_batches(fin, batch_format="pyarrow",
                           zero_copy_batch=True)


@_q("q_feature_smooth_urls")
def q_feature_smooth_urls(sf_dir: str):
    """SAGE-mean feature smoothing certified at the url level: ONE
    round of in-neighbor mean aggregation (graph/propagate.py,
    agg="mean", alpha=0 — the deterministic SAGEConv aggregate,
    reference modeling_link_prediction.py:115-143) over the source
    pages' text byte lengths.  Integer sums + a single division on
    both sides -> check_exact clean vs the DuckDB oracle."""
    import pyarrow.compute as pc

    from .graph.propagate import feature_propagation
    from .ops.join import hash_join

    g = gate_graph()
    ext = read_layer(g.extracted, columns=["url", "text"])
    lens = ext.map_batches(
        lambda b: pa.table({"url": b.column("url"),
                            "x": pc.binary_length(b.column("text"))
                            .cast(pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)
    verts = read_layer(g.vertices, columns=["url", "vid"])
    l_schema = pa.schema([("url", pa.string()), ("x", pa.int64())])
    v_schema = pa.schema([("url", pa.string()), ("vid", pa.int64())])
    feats = hash_join(lens, verts, on="url", right_on="url",
                      num_parts=DEFAULT.num_parts,
                      left_schema=l_schema, right_schema=v_schema)
    smoothed, _ = feature_propagation(
        read_layer(g.edges), g.offsets, feats, g.workdir, col="x",
        rounds=1, alpha=0.0, agg="mean")

    def flat(b: pa.Table) -> pa.Table:
        v = b.column("x").combine_chunks().flatten().to_numpy(
            zero_copy_only=False)
        return pa.table({"vid": b.column("vid"),
                         "smooth": pa.array(v, type=pa.float64())})

    s = smoothed.map_batches(flat, batch_format="pyarrow",
                             zero_copy_batch=True)
    s_schema = pa.schema([("vid", pa.int64()), ("smooth", pa.float64())])
    out = hash_join(s, verts.map_batches(
        lambda b: pa.table({"vid": b.column("vid"),
                            "url": b.column("url")}),
        batch_format="pyarrow", zero_copy_batch=True),
        on="vid", right_on="vid", num_parts=DEFAULT.num_parts,
        left_schema=s_schema,
        right_schema=pa.schema([("vid", pa.int64()),
                                ("url", pa.string())]))
    return out.select_columns(["url", "smooth"])


@_q("q_feature_propagation")
def q_feature_propagation(sf_dir: str):
    """APPNP feature diffusion (graph/propagate.py agg="rw",
    Klicpera et al. 2019): 2 rounds of random-walk-normalized
    propagation with restart 0.15 over 2-d page features (text byte
    length, outlink count) — GNN-style structure-aware features
    without a learned transform.  Rows-only; NumPy-oracle parity and
    layout independence in tests/test_propagate.py."""
    from .graph.propagate import feature_propagation, page_features

    g = graph_for(sf_dir)
    feats = page_features(g)
    prop, _ = feature_propagation(
        read_layer(g.edges), g.offsets, feats, g.workdir, col="f",
        rounds=2, alpha=0.15, agg="rw")

    def flat(b: pa.Table) -> pa.Table:
        m = b.column("f").combine_chunks().flatten().to_numpy(
            zero_copy_only=False).reshape(-1, 2)
        return pa.table({"vid": b.column("vid"),
                         "f_len": pa.array(np.round(m[:, 0], 9)),
                         "f_links": pa.array(np.round(m[:, 1], 9))})

    return prop.map_batches(flat, batch_format="pyarrow",
                            zero_copy_batch=True)


@_q("q_link_prediction_auc")
def q_link_prediction_auc(sf_dir: str):
    """The reference's evaluation, end to end (link_prediction.py:33-106
    re-expressed with the engine's certified stages): hash-split the
    corpus edge table, train node2vec/SGNS embeddings on the TRAIN
    graph only, score held-out positives vs 2x sampled non-edges by
    embedding dot product, and report exact Mann-Whitney ROC-AUC.
    Rows-only (learned scorer); quality/replay/layout oracles in
    tests/test_linkpred.py."""
    import ray.data as rd

    from .graph.linkpred import link_prediction_auc

    g = graph_for(sf_dir)
    auc, _, info = link_prediction_auc(
        read_layer(g.edges), g.offsets, g.workdir, seed=17, dim=16,
        epochs=6, lr=0.2, negatives=3, walks_per_vertex=4, walk_len=8,
        window=2, num_parts=16)
    return rd.from_arrow(pa.table({
        "auc": pa.array([round(float(auc), 6)]),
        "n_test": pa.array([info["n_test"]], type=pa.int64()),
        "n_neg": pa.array([info["n_neg"]], type=pa.int64()),
        "n_train": pa.array([info["n_train"]], type=pa.int64()),
    }))


@_q("q_landmark_distances")
def q_landmark_distances(sf_dir: str):
    """Landmark distance oracle (graph/landmarks.py, Potamias 2009):
    exact BFS layers from the 4 highest-degree hubs of the symmetrized
    corpus graph — the precomputed structure behind O(k) shortest-path
    estimates at web scale.  Rows-only; upper-bound/exactness oracles
    in tests/test_landmarks.py."""
    from .graph.landmarks import landmark_distances

    g = graph_for(sf_dir)
    sym = symmetrize(read_layer(g.edges), dedup=False)
    dist, _, _ = landmark_distances(sym, g.offsets, g.workdir, k=4,
                                    shards_dir=f"{g.workdir}/csr_sym")
    return dist


@_q("q_local_cluster")
def q_local_cluster(sf_dir: str):
    """ACL local community of vertex 0 (graph/pprpush.py: PPR push —
    work bounded by 1/(alpha*eps) regardless of graph size — + minimum-
    conductance sweep cut).  Rows-only; exact fixpoint-vs-pagerank,
    l1-invariant/locality-bound and clique-recovery oracles in
    tests/test_pprpush.py."""
    import pandas as _pd

    from .graph.pprpush import local_cluster

    g = graph_for(sf_dir)
    members, phi, _ = local_cluster(read_layer(g.edges), g.offsets,
                                    g.workdir, seed_vid=0,
                                    alpha=0.15, eps=1e-6)
    return _pd.DataFrame({"vid": members,
                          "conductance": np.round(phi, 9)})


@_q("q_node2vec_walks")
def q_node2vec_walks(sf_dir: str):
    """node2vec second-order biased walks (graph/node2vec.py: p=0.5
    return-averse / q=2 locally-exploring — the homophily setting) over
    the link graph; the embedding-corpus generator with exact alpha
    semantics via rejection sampling.  Rows-only; full protocol-replay
    oracle + transition-law tests in tests/test_node2vec.py."""
    from .graph.node2vec import node2vec_walks

    g = graph_for(sf_dir)
    ds, _ = node2vec_walks(read_layer(g.edges), g.offsets, g.workdir,
                           p=0.5, q=2.0, walk_len=8, seed=17)
    return ds


@_q("q_conductance")
def q_conductance(sf_dir: str):
    """Per-community conductance of the Louvain communities
    (graph/metrics.py::community_conductance — cut / min(vol, 2m-vol),
    the second fitness metric next to modularity).  Rows-only; exact
    two-clique + brute-force oracles in tests/test_metrics.py."""
    from .graph.louvain import louvain
    from .graph.metrics import community_conductance

    g = graph_for(sf_dir)
    labels, _ = louvain(read_layer(g.edges), g.offsets, g.workdir)
    lab = labels.map_batches(
        lambda b: pa.table({"vid": b.column("vid"),
                            "label": b.column("community")}),
        batch_format="pyarrow", zero_copy_batch=True)
    # canonical undirected edge list (each edge once)
    from .ops.dedup import distinct

    def canon(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy()
        d = b.column("dst").to_numpy()
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"src": pa.array(np.minimum(s, d)),
                         "dst": pa.array(np.maximum(s, d))})

    und = distinct(read_layer(g.edges).map_batches(
        canon, batch_format="pyarrow", zero_copy_batch=True),
        ["src", "dst"])
    ds, _ = community_conductance(und, lab)

    def quant(b: pa.Table) -> pa.Table:
        return pa.table({
            "label": b.column("label"), "cut": b.column("cut"),
            "volume": b.column("volume"),
            "conductance": pa.array(np.round(
                b.column("conductance").to_numpy(), 9))})

    return ds.map_batches(quant, batch_format="pyarrow",
                          zero_copy_batch=True)


@_q("q_katz")
def q_katz(sf_dir: str):
    """Katz centrality of the link graph (graph/katz.py: alpha-damped
    path-count series on the shared directed CSR shards — the third
    classic link-analysis score next to q_pagerank/q_hits).  Rows-only
    at the gate (iterative float fixpoint); dense NumPy power-series
    oracle + weighted/layout/divergence tests in tests/test_katz.py."""
    from .graph.katz import katz

    g = graph_for(sf_dir)
    scores, _ = katz(read_layer(g.edges), g.offsets, g.workdir,
                     alpha=0.05, tol=1e-9)

    def quant(b: pa.Table) -> pa.Table:
        r = np.round(b.column("katz").to_numpy(), 9)
        return pa.table({"vid": b.column("vid"), "katz": pa.array(r)})

    return scores.map_batches(quant, batch_format="pyarrow",
                              zero_copy_batch=True)


@_q("q_eigenvector")
def q_eigenvector(sf_dir: str):
    """Principal-eigenvector (in-link) centrality of the link graph
    (graph/eigenvector.py: deferred-normalization power iteration on
    the shared directed CSR shards — the un-damped ancestor of
    q_pagerank/q_katz; unit-L2 score vector).  Rows-only at the gate
    (iterative float fixpoint); dense NumPy power-iteration oracle
    with identical iteration counts + weighted/layout tests in
    tests/test_eigenvector.py.  max_iters bounds the spectral-gap
    crawl on the small fixture graph."""
    from .graph.eigenvector import eigenvector_centrality

    g = graph_for(sf_dir)
    scores, _ = eigenvector_centrality(read_layer(g.edges), g.offsets,
                                       g.workdir, tol=1e-9, max_iters=150)

    def quant(b: pa.Table) -> pa.Table:
        r = np.round(b.column("eigenvector").to_numpy(), 9)
        return pa.table({"vid": b.column("vid"),
                         "eigenvector": pa.array(r)})

    return scores.map_batches(quant, batch_format="pyarrow",
                              zero_copy_batch=True)


@_q("q_pagerank_top20")
def q_pagerank_top20(sf_dir: str):
    from .graph.pagerank import pagerank

    g = graph_for(sf_dir)
    ranks, _ = pagerank(read_layer(g.edges), g.offsets, g.workdir)
    from .ops.join import broadcast_semi

    top = ranks.sort("rank", descending=True).limit(20).to_pandas()
    vid_keys = pa.table({"vid": pa.array(top["vid"].to_numpy(), type=pa.int64())})
    verts = broadcast_semi(read_layer(g.vertices, columns=["vid", "url"]),
                           "vid", vid_keys, "vid").to_pandas()
    out = top.merge(verts, on="vid")[["url", "vid", "rank"]]
    out["rank"] = out["rank"].round(9)
    return out.sort_values(["rank", "vid"], ascending=[False, True]).reset_index(drop=True)


@_q("q_personalized_pagerank")
def q_personalized_pagerank(sf_dir: str):
    """Personalized PageRank from a fixed seed set (vids 0,1,2) —
    teleport + dangling mass go to the seeds; NumPy-oracle exact in
    tests/test_pagerank.py."""
    from .graph.pagerank import pagerank

    g = graph_for(sf_dir)
    seeds = np.array([0, 1, 2], dtype=np.int64)
    ranks, _ = pagerank(read_layer(g.edges), g.offsets, g.workdir,
                        job="ppr_012", seeds=seeds)

    def quant(b: pa.Table) -> pa.Table:
        r = np.round(b.column("rank").to_numpy(), 9)
        return pa.table({"vid": b.column("vid"), "rank": pa.array(r)})

    return ranks.map_batches(quant, batch_format="pyarrow",
                             zero_copy_batch=True)


@_q("q_pagerank_weighted")
def q_pagerank_weighted(sf_dir: str):
    """WEIGHTED PageRank: edge weight = anchor multiplicity (how many
    times src_url links dst_url) from the weighted resolution join —
    out-mass split w_uv / sum w_ux.  NumPy-oracle exact in
    tests/test_pagerank.py; multiplicity parity vs SQL count in
    tests/test_graph_build.py."""
    from .graph.build import weighted_edges
    from .graph.pagerank import pagerank

    g = graph_for(sf_dir)
    ranks, _ = pagerank(weighted_edges(g), g.offsets, g.workdir,
                        job="pagerank_w", weight_col="w")

    def quant(b: pa.Table) -> pa.Table:
        r = np.round(b.column("rank").to_numpy(), 9)
        return pa.table({"vid": b.column("vid"), "rank": pa.array(r)})

    return ranks.map_batches(quant, batch_format="pyarrow",
                             zero_copy_batch=True)


@_q("q_hits")
def q_hits(sf_dir: str):
    """HITS hubs/authorities (graph/hits.py) — power iteration on the
    shard-actor engine; NumPy-oracle allclose 1e-6 in tests/test_hits.py."""
    from .graph.hits import hits

    g = graph_for(sf_dir)
    ds, _ = hits(read_layer(g.edges), g.offsets,
                 workdir=os.path.join(g.workdir, "hits"))

    def quant(b: pa.Table) -> pa.Table:
        return pa.table({
            "vid": b.column("vid"),
            "authority": pa.array(np.round(b.column("authority").to_numpy(), 9)),
            "hub": pa.array(np.round(b.column("hub").to_numpy(), 9))})

    return ds.map_batches(quant, batch_format="pyarrow", zero_copy_batch=True)


@_q("q_components")
def q_components(sf_dir: str):
    from .graph.components import connected_components

    g = graph_for(sf_dir)
    labels, _ = connected_components(
        symmetrize(read_layer(g.edges), dedup=False), g.offsets, g.workdir)
    return labels.select_columns(["vid", "label"])


@_q("q_component_size_distribution")
def q_component_size_distribution(sf_dir: str):
    """Vid-free CC certification: the multiset of component sizes —
    SQL-checkable against the recursive-closure oracle even though the
    min-vid labels themselves are not SQL-reproducible."""
    from .graph.components import connected_components
    from .ops.agg import grouped_aggregate

    g = gate_graph()
    labels, _ = connected_components(
        symmetrize(read_layer(g.edges), dedup=False), g.offsets, g.workdir)
    sizes = grouped_aggregate(labels.select_columns(["label"]), ["label"],
                              {"size": ("count", None)})
    return grouped_aggregate(sizes.select_columns(["size"]), ["size"],
                             {"n_components": ("count", None)})


@_q("q_components_urls")
def q_components_urls(sf_dir: str):
    """Per-vertex CC certification at the url level: every vertex paired
    with its component representative = min(url) over the component.
    Gate-pinned (oracle: recursive closure over the authored anchors).
    Two bucketed hash joins + one grouped min — scale-shaped."""
    from .graph.components import connected_components
    from .ops.agg import grouped_aggregate
    from .ops.join import hash_join

    g = gate_graph()
    labels, _ = connected_components(
        symmetrize(read_layer(g.edges), dedup=False), g.offsets, g.workdir)
    lab = labels.select_columns(["vid", "label"])
    v = read_layer(g.vertices, columns=["url", "vid"])
    lab_schema = pa.schema([pa.field("vid", pa.int64()),
                            pa.field("label", pa.int64())])
    v_schema = pa.schema([pa.field("url", pa.string()),
                          pa.field("vid", pa.int64())])
    withurl = hash_join(lab, v, on="vid", right_on="vid",
                        num_parts=DEFAULT.num_parts,
                        left_schema=lab_schema, right_schema=v_schema)
    withurl = withurl.materialize()  # feeds both the rep agg and the join
    rep = grouped_aggregate(withurl.select_columns(["label", "url"]),
                            ["label"], {"component_url": ("min", "url")})
    wu_schema = pa.schema([pa.field("vid", pa.int64()),
                           pa.field("label", pa.int64()),
                           pa.field("url", pa.string())])
    rep_schema = pa.schema([pa.field("label", pa.int64()),
                            pa.field("component_url", pa.string())])
    out = hash_join(withurl, rep, on="label", right_on="label",
                    num_parts=DEFAULT.num_parts, left_cols=["url"],
                    left_schema=wu_schema, right_schema=rep_schema)
    return out.map_batches(
        lambda b: pa.table({"url": b.column("url"),
                            "component_url": b.column("component_url")}),
        batch_format="pyarrow", zero_copy_batch=True)


@_q("q_scc_urls")
def q_scc_urls(sf_dir: str):
    """Per-vertex SCC certification at the url level: every vertex
    paired with its strongly-connected-component representative =
    min(url) over the component (graph/scc.py: trim + coloring +
    multi-root backward BFS).  Gate-pinned (oracle: directed recursive
    closure + mutual-reachability join over the authored anchors).
    Reference conformance anchor: the directed citation-graph structure
    the reference materializes (link_prediction_dataset.py:50-75)."""
    from .graph.scc import strongly_connected_components
    from .ops.agg import grouped_aggregate
    from .ops.join import hash_join

    g = gate_graph()
    labels, _ = strongly_connected_components(
        read_layer(g.edges), g.offsets, g.workdir)
    lab = labels.select_columns(["vid", "scc"])
    v = read_layer(g.vertices, columns=["url", "vid"])
    lab_schema = pa.schema([pa.field("vid", pa.int64()),
                            pa.field("scc", pa.int64())])
    v_schema = pa.schema([pa.field("url", pa.string()),
                          pa.field("vid", pa.int64())])
    withurl = hash_join(lab, v, on="vid", right_on="vid",
                        num_parts=DEFAULT.num_parts,
                        left_schema=lab_schema, right_schema=v_schema)
    withurl = withurl.materialize()  # feeds both the rep agg and the join
    rep = grouped_aggregate(withurl.select_columns(["scc", "url"]),
                            ["scc"], {"scc_url": ("min", "url")})
    wu_schema = pa.schema([pa.field("vid", pa.int64()),
                           pa.field("scc", pa.int64()),
                           pa.field("url", pa.string())])
    rep_schema = pa.schema([pa.field("scc", pa.int64()),
                            pa.field("scc_url", pa.string())])
    out = hash_join(withurl, rep, on="scc", right_on="scc",
                    num_parts=DEFAULT.num_parts, left_cols=["url"],
                    left_schema=wu_schema, right_schema=rep_schema)
    return out.map_batches(
        lambda b: pa.table({"url": b.column("url"),
                            "scc_url": b.column("scc_url")}),
        batch_format="pyarrow", zero_copy_batch=True)


@_q("q_scc_size_distribution")
def q_scc_size_distribution(sf_dir: str):
    """Vid-free SCC certification: the multiset of strongly-connected-
    component sizes — SQL-checkable even though the max-vid labels are
    not SQL-reproducible.  Gate-pinned."""
    from .graph.scc import strongly_connected_components
    from .ops.agg import grouped_aggregate

    g = gate_graph()
    labels, _ = strongly_connected_components(
        read_layer(g.edges), g.offsets, g.workdir)
    sizes = grouped_aggregate(labels.select_columns(["scc"]), ["scc"],
                              {"size": ("count", None)})
    return grouped_aggregate(sizes.select_columns(["size"]), ["size"],
                             {"n_sccs": ("count", None)})


@_q("q_condensation_urls")
def q_condensation_urls(sf_dir: str):
    """Condensation DAG at the url level: inter-SCC edges with
    multiplicity, endpoints named by the SCC's min-url representative
    (graph/scc.py::condensation — two bucketed label joins + pair
    combiner + grouped sum; never broadcasts the label table).
    Gate-pinned; oracle = directed closure + mutual-reachability rep."""
    from .graph.scc import condensation, strongly_connected_components
    from .ops.agg import grouped_aggregate
    from .ops.join import hash_join

    g = gate_graph()
    labels, _ = strongly_connected_components(
        read_layer(g.edges), g.offsets, g.workdir)
    lab = labels.select_columns(["vid", "scc"])
    cond = condensation(read_layer(g.edges), lab)

    # scc label -> representative url (= min url over the component)
    v = read_layer(g.vertices, columns=["url", "vid"])
    i64 = pa.int64()
    lab_schema = pa.schema([("vid", i64), ("scc", i64)])
    v_schema = pa.schema([("url", pa.string()), ("vid", i64)])
    withurl = hash_join(lab, v, on="vid", right_on="vid",
                        num_parts=DEFAULT.num_parts,
                        left_schema=lab_schema, right_schema=v_schema)
    rep = grouped_aggregate(withurl.select_columns(["scc", "url"]),
                            ["scc"], {"rep": ("min", "url")}).materialize()

    cond_schema = pa.schema([("src_scc", i64), ("dst_scc", i64),
                             ("n_edges", i64)])
    rep_schema = pa.schema([("scc", i64), ("rep", pa.string())])
    j1 = hash_join(cond, rep, on="src_scc", right_on="scc",
                   num_parts=DEFAULT.num_parts,
                   left_schema=cond_schema, right_schema=rep_schema)
    j1 = j1.map_batches(
        lambda b: pa.table({"dst_scc": b.column("dst_scc"),
                            "n_edges": b.column("n_edges"),
                            "src_scc_url": b.column("rep")}),
        batch_format="pyarrow", zero_copy_batch=True)
    j1_schema = pa.schema([("dst_scc", i64), ("n_edges", i64),
                           ("src_scc_url", pa.string())])
    j2 = hash_join(j1, rep, on="dst_scc", right_on="scc",
                   num_parts=DEFAULT.num_parts,
                   left_schema=j1_schema, right_schema=rep_schema)
    return j2.map_batches(
        lambda b: pa.table({"src_scc_url": b.column("src_scc_url"),
                            "dst_scc_url": b.column("rep"),
                            "n_edges": b.column("n_edges")}),
        batch_format="pyarrow", zero_copy_batch=True)


@_q("q_toposort_urls")
def q_toposort_urls(sf_dir: str):
    """Macro-structure schedule of the link graph: SCC decomposition ->
    condensation DAG -> topological levels (graph/toposort.py), each
    SCC named by its min-url representative.  level(c) = longest
    dependency chain feeding c — the crawl/recompute ordering of the
    page graph.  Gate-pinned; oracle = recursive longest path over the
    closure-derived condensation."""
    from .graph.scc import condensation, strongly_connected_components
    from .graph.toposort import topological_levels
    from .ops.agg import grouped_aggregate
    from .ops.join import hash_join

    g = gate_graph()
    labels, _ = strongly_connected_components(
        read_layer(g.edges), g.offsets, g.workdir)
    lab = labels.select_columns(["vid", "scc"])
    cond = condensation(read_layer(g.edges), lab)
    lv, _ = topological_levels(
        cond.map_batches(
            lambda b: pa.table({"src": b.column("src_scc"),
                                "dst": b.column("dst_scc")}),
            batch_format="pyarrow", zero_copy_batch=True),
        g.offsets, g.workdir, lineage={"kind": "cond"},
        shards_dir=f"{g.workdir}/csr_cond")

    # scc label -> representative url, then attach the label's level
    v = read_layer(g.vertices, columns=["url", "vid"])
    i64 = pa.int64()
    withurl = hash_join(lab, v, on="vid", right_on="vid",
                        num_parts=DEFAULT.num_parts,
                        left_schema=pa.schema([("vid", i64), ("scc", i64)]),
                        right_schema=pa.schema([("url", pa.string()),
                                                ("vid", i64)]))
    rep = grouped_aggregate(withurl.select_columns(["scc", "url"]),
                            ["scc"], {"scc_url": ("min", "url")})
    out = hash_join(rep, lv.select_columns(["vid", "level"]),
                    on="scc", right_on="vid",
                    num_parts=DEFAULT.num_parts,
                    left_schema=pa.schema([("scc", i64),
                                           ("scc_url", pa.string())]),
                    right_schema=pa.schema([("vid", i64),
                                            ("level", i64)]))
    return out.map_batches(
        lambda b: pa.table({"scc_url": b.column("scc_url"),
                            "level": b.column("level")}),
        batch_format="pyarrow", zero_copy_batch=True)


@_q("q_triangles_urls")
def q_triangles_urls(sf_dir: str):
    """Per-vertex triangle counts mapped to urls — SQL-certified against
    a triple self-join over the distinct canonical anchor pairs
    (gate-pinned; reference conformance anchor: golden cardinalities at
    halvesting_geometric/utils/data/link_prediction_dataset.py:50-75)."""
    from .graph.triangles import triangles_edges
    from .ops.join import hash_join

    g = gate_graph()
    per, _total = triangles_edges(read_layer(g.edges))
    v = read_layer(g.vertices, columns=["url", "vid"])
    per_schema = pa.schema([pa.field("vid", pa.int64()),
                            pa.field("triangles", pa.int64())])
    v_schema = pa.schema([pa.field("url", pa.string()),
                          pa.field("vid", pa.int64())])
    out = hash_join(per, v, on="vid", right_on="vid",
                    num_parts=DEFAULT.num_parts,
                    left_schema=per_schema, right_schema=v_schema)
    return out.map_batches(
        lambda b: pa.table({"url": b.column("url"),
                            "n_triangles": b.column("triangles")}),
        batch_format="pyarrow", zero_copy_batch=True)


@_q("q_degree_gini")
def q_degree_gini(sf_dir: str):
    """Gini coefficient of the undirected degree distribution — the
    link-mass inequality scalar (how hub-dominated is the graph).
    Computed from the degree HISTOGRAM alone: grouped (deg, count)
    exchange, then the sorted-rank identity
    G = 2*sum(i*d_i)/(n*sum(d)) - (n+1)/n evaluated with arithmetic-
    series block sums per distinct degree — O(#distinct degrees)
    driver state, no global sort.  SQL-certified against the
    row_number formulation (tie ranks are interchangeable within a
    block, the weighted sum is tie-invariant)."""
    from .graph.metrics import degree_histogram

    g = gate_graph()
    hist = degree_histogram(read_layer(g.edges))
    n = 0
    tot = 0
    s_id = 0
    cum = 0
    for d, cnt in hist:
        # ranks cum+1 .. cum+cnt all carry degree d
        s_id += d * (cnt * cum + cnt * (cnt + 1) // 2)
        cum += cnt
        n += cnt
        tot += d * cnt
    gini = round((2.0 * s_id) / (n * tot) - (n + 1.0) / n, 9)
    return pa.table({"n_vertices": pa.array([n], type=pa.int64()),
                     "total_deg": pa.array([tot], type=pa.int64()),
                     "gini": pa.array([gini], type=pa.float64())})


@_q("q_rich_club")
def q_rich_club(sf_dir: str):
    """Rich-club coefficients phi(k) of the link graph at k in
    {1,2,4,8,16} (graph/metrics.py::rich_club) — the hub-
    interconnection statistic, reduced to two degree-bounded
    histograms + driver suffix sums.  SQL-certified; brute-force
    parity in tests/test_metrics.py."""
    from .graph.metrics import rich_club

    g = gate_graph()
    return rich_club(read_layer(g.edges), ks=(1, 2, 4, 8, 16))


@_q("q_triad_census_urls")
def q_triad_census_urls(sf_dir: str):
    """Connected directed triad census of the gate link graph: the 13
    Holland-Leinhardt types with >= 2 non-null dyads (graph/triads.py
    — distributed Batagelj-Mrvar; open/null rows 003/012/102 are
    derived closed-form and certified by the brute-force pytest
    oracle, not re-counted here).  SQL-certified against wedge-
    enumerated triple classification via the isomorphism-pinned
    64-entry lookup."""
    from .graph.triads import TRIAD_NAMES, triad_census_table

    g = gate_graph()
    t = triad_census_table(read_layer(g.edges))
    conn = [n for n in TRIAD_NAMES if n not in ("003", "012", "102")]
    import pyarrow.compute as pc

    return t.filter(pc.is_in(t.column("triad_type"),
                             value_set=pa.array(conn)))


@_q("q_fourcliques_urls")
def q_fourcliques_urls(sf_dir: str):
    """Per-vertex 4-clique counts mapped to urls — one motif deeper
    than q_triangles_urls (graph/cliques.py: orientation DAG, bottom-
    triangle + apex join, each clique found exactly once).  SQL-
    certified against the canonical 6-way self-join; brute-force
    parity + partitioning invariance in tests/test_cliques.py."""
    from .graph.cliques import cliques4_edges
    from .ops.join import hash_join

    g = gate_graph()
    per, _total = cliques4_edges(read_layer(g.edges))
    v = read_layer(g.vertices, columns=["url", "vid"])
    per_schema = pa.schema([pa.field("vid", pa.int64()),
                            pa.field("cliques4", pa.int64())])
    v_schema = pa.schema([pa.field("url", pa.string()),
                          pa.field("vid", pa.int64())])
    out = hash_join(per, v, on="vid", right_on="vid",
                    num_parts=DEFAULT.num_parts,
                    left_schema=per_schema, right_schema=v_schema)
    return out.map_batches(
        lambda b: pa.table({"url": b.column("url"),
                            "n_cliques4": b.column("cliques4")}),
        batch_format="pyarrow", zero_copy_batch=True)


@_q("q_clustering_coeff")
def q_clustering_coeff(sf_dir: str):
    """Per-vertex local clustering coefficient at the url level
    (graph/metrics.py) — SQL-certified: degree + exact triangle count +
    lcc as one integer division, gate-pinned corpus."""
    from .graph.metrics import clustering_coefficients
    from .ops.join import hash_join

    g = gate_graph()
    cc = clustering_coefficients(read_layer(g.edges))
    v = read_layer(g.vertices, columns=["url", "vid"])
    cc_schema = pa.schema([pa.field("vid", pa.int64()),
                           pa.field("degree", pa.int64()),
                           pa.field("n_triangles", pa.int64()),
                           pa.field("lcc", pa.float64())])
    v_schema = pa.schema([pa.field("url", pa.string()),
                          pa.field("vid", pa.int64())])
    out = hash_join(cc, v, on="vid", right_on="vid",
                    num_parts=DEFAULT.num_parts,
                    left_schema=cc_schema, right_schema=v_schema)
    return out.map_batches(
        lambda b: pa.table({"url": b.column("url"),
                            "degree": b.column("degree"),
                            "n_triangles": b.column("n_triangles"),
                            "lcc": b.column("lcc")}),
        batch_format="pyarrow", zero_copy_batch=True)


@_q("q_common_neighbors")
def q_common_neighbors(sf_dir: str):
    """Link-prediction candidate scores (graph/metrics.py): per
    unordered url pair with a shared neighbor, common-neighbor count +
    neighborhood Jaccard — the deterministic analogue of the reference's
    GNN pair scorer (link_prediction.py:33-106).  SQL-certified,
    gate-pinned corpus."""
    from .graph.metrics import common_neighbor_scores
    from .ops.join import hash_join

    g = gate_graph()
    cn = common_neighbor_scores(read_layer(g.edges))
    v = read_layer(g.vertices, columns=["url", "vid"])
    cn_schema = pa.schema([pa.field("a", pa.int64()),
                           pa.field("b", pa.int64()),
                           pa.field("common_neighbors", pa.int64()),
                           pa.field("jaccard", pa.float64())])
    v_schema = pa.schema([pa.field("url", pa.string()),
                          pa.field("vid", pa.int64())])
    j = hash_join(cn, v, on="a", right_on="vid",
                  num_parts=DEFAULT.num_parts,
                  left_schema=cn_schema, right_schema=v_schema)
    j = j.map_batches(lambda b: b.rename_columns(
        ["a", "b", "common_neighbors", "jaccard", "url_a"]),
        batch_format="pyarrow", zero_copy_batch=True)
    j_schema = pa.schema([pa.field("a", pa.int64()),
                          pa.field("b", pa.int64()),
                          pa.field("common_neighbors", pa.int64()),
                          pa.field("jaccard", pa.float64()),
                          pa.field("url_a", pa.string())])
    j = hash_join(j, v, on="b", right_on="vid",
                  num_parts=DEFAULT.num_parts,
                  left_schema=j_schema, right_schema=v_schema)

    def fin(b: pa.Table) -> pa.Table:
        ua = b.column("url_a").to_numpy(zero_copy_only=False)
        ub = b.column("url").to_numpy(zero_copy_only=False)
        # pair identity is the unordered SET; canonicalize by url so the
        # assignment matches the oracle's lexicographic ordering (vid
        # order is hash-based and differs)
        m = ua < ub
        return pa.table({
            "url_a": pa.array(np.where(m, ua, ub), type=pa.string()),
            "url_b": pa.array(np.where(m, ub, ua), type=pa.string()),
            "common_neighbors": b.column("common_neighbors"),
            "jaccard": b.column("jaccard")})

    return j.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


@_q("q_diameter")
def q_diameter(sf_dir: str):
    """Double-sweep diameter lower bound of vid 0's component over the
    symmetrized link graph (graph/bfs.py::double_sweep_diameter) —
    exact-replication NumPy oracle in tests/test_bfs.py (same
    deterministic min-vid tie-break), plus an all-pairs exact-diameter
    sandwich bound."""
    from .graph.bfs import double_sweep_diameter

    g = graph_for(sf_dir)
    r = double_sweep_diameter(symmetrize(read_layer(g.edges), dedup=False),
                              g.offsets, g.workdir, start=0)
    return pd.DataFrame({
        "diameter_lb": pd.Series([r["diameter_lb"]], dtype="int64"),
        "n_sweeps": pd.Series([len(r["sweeps"])], dtype="int64"),
        "final_peak_vid": pd.Series([r["sweeps"][-1]["peak_vid"]],
                                    dtype="int64"),
        "component_size": pd.Series([r["sweeps"][-1]["reached"]],
                                    dtype="int64")})


@_q("q_bfs_hops")
def q_bfs_hops(sf_dir: str):
    """BFS hop distances (graph/bfs.py) from the lexicographic-min-url
    vertex over the symmetrized link graph — SQL-certified against a
    |V|-bounded recursive closure; unreachable vertices absent.
    Gate-pinned corpus."""
    import pyarrow.compute as pc

    from .graph.bfs import bfs
    from .ops.join import hash_join

    g = gate_graph()
    v = read_layer(g.vertices, columns=["url", "vid"])
    # source = min(url) vertex: tiny per-batch partial min -> driver
    mins = v.map_batches(
        lambda b: pa.table({"u": pa.array(
            [pc.min(b.column("url")).as_py()], type=pa.string()),
            "vid": pa.array([b.column("vid").to_numpy()[
                pc.index(b.column("url"),
                         pc.min(b.column("url"))).as_py()]],
                type=pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    src_vid = int(mins.loc[mins["u"].idxmin(), "vid"])

    dist, _info = bfs(symmetrize(read_layer(g.edges), dedup=False),
                      g.offsets, g.workdir, np.array([src_vid]))
    d_schema = pa.schema([pa.field("part", pa.int32()),
                          pa.field("vid", pa.int64()),
                          pa.field("dist", pa.int64())])
    v_schema = pa.schema([pa.field("url", pa.string()),
                          pa.field("vid", pa.int64())])
    out = hash_join(dist.select_columns(["vid", "dist"]), v,
                    on="vid", right_on="vid", num_parts=DEFAULT.num_parts,
                    left_schema=pa.schema([pa.field("vid", pa.int64()),
                                           pa.field("dist", pa.int64())]),
                    right_schema=v_schema)
    return out.map_batches(
        lambda b: pa.table({"url": b.column("url"),
                            "dist": b.column("dist")}),
        batch_format="pyarrow", zero_copy_batch=True)


@_q("q_adamic_adar")
def q_adamic_adar(sf_dir: str):
    """Adamic-Adar / resource-allocation link-prediction scores
    (graph/metrics.py::adamic_adar_scores) — the classical baselines for
    the reference's GNN task (link_prediction.py:33-106).  Rows-only:
    the scores are float sums (order-dependent last ulps); allclose
    brute-force oracle in tests/test_metrics.py.  Gate-pinned corpus."""
    from .graph.metrics import adamic_adar_scores

    g = gate_graph()
    out = adamic_adar_scores(read_layer(g.edges))

    def quant(b: pa.Table) -> pa.Table:
        return pa.table({
            "a": b.column("a"), "b": b.column("b"),
            "common_neighbors": b.column("common_neighbors"),
            "adamic_adar": pa.array(
                np.round(b.column("adamic_adar").to_numpy(), 9)),
            "resource_allocation": pa.array(
                np.round(b.column("resource_allocation").to_numpy(), 9))})

    return out.map_batches(quant, batch_format="pyarrow",
                           zero_copy_batch=True)


@_q("q_mirror_pages")
def q_mirror_pages(sf_dir: str):
    """Structural mirror detection (graph/mirror.py::
    mirror_candidates): adjacency-MinHash + banded LSH candidates,
    exact neighbor-Jaccard verify — pages whose OUT-link sets are
    near-identical (mirror copies / template hubs).  On the synthetic
    host-uniform corpus the hits are the degenerate-but-real regime:
    low-out-degree pages sharing the same link targets (jaccard 1.0
    stars under bucket_cap).  Rows-only at the gate; planted-mirror
    exactness, sequential-minhash parity and layout invariance are
    pinned in tests/test_mirror.py.  Gate-pinned corpus."""
    from .graph.mirror import mirror_candidates

    g = gate_graph()
    return mirror_candidates(read_layer(g.edges), num_perm=32,
                             bands=8, min_jaccard=0.8)


@_q("q_reciprocity")
def q_reciprocity(sf_dir: str):
    """Directed-edge reciprocity of the link graph (graph/metrics.py);
    SQL-certified single-row summary, gate-pinned corpus."""
    from .graph.metrics import reciprocity

    g = gate_graph()
    return pd.DataFrame([reciprocity(read_layer(g.edges))])


@_q("q_assortativity")
def q_assortativity(sf_dir: str):
    """Degree assortativity with exact int64 sufficient statistics
    (graph/metrics.py); SQL-certified single-row summary, gate-pinned
    corpus."""
    from .graph.metrics import degree_assortativity

    g = gate_graph()
    return pd.DataFrame([degree_assortativity(read_layer(g.edges))])


@_q("q_component_sizes")
def q_component_sizes(sf_dir: str):
    from .graph.components import connected_components
    from .ops.agg import grouped_aggregate

    g = graph_for(sf_dir)
    labels, _ = connected_components(
        symmetrize(read_layer(g.edges), dedup=False), g.offsets, g.workdir)
    return grouped_aggregate(labels.select_columns(["label"]), ["label"],
                             {"size": ("count", None)})


@_q("q_triangles")
def q_triangles(sf_dir: str):
    from .graph.triangles import triangles_edges

    g = graph_for(sf_dir)
    per, total = triangles_edges(read_layer(g.edges))
    return per


@_q("q_label_propagation")
def q_label_propagation(sf_dir: str):
    from .graph.labelprop import label_propagation

    g = graph_for(sf_dir)
    labels, _ = label_propagation(
        symmetrize(read_layer(g.edges), drop_self_loops=True, dedup=False),
        g.offsets, g.workdir, rounds=5)
    return labels.select_columns(["vid", "label"])


@_q("q_louvain")
def q_louvain(sf_dir: str):
    """Louvain communities of the link graph (graph/louvain.py:
    multi-level modularity — BSP local moving on shard actors +
    Ray-Data contraction; community = min member vid).  Rows-only at
    the gate (hash-scheduled moves); phase-1 sequential-replay oracle,
    planted-partition recovery and layout invariance in
    tests/test_louvain.py."""
    from .graph.louvain import louvain

    g = graph_for(sf_dir)
    labels, _ = louvain(read_layer(g.edges), g.offsets, g.workdir)
    return labels


@_q("q_degree_distribution")
def q_degree_distribution(sf_dir: str):
    """Out-degree histogram — the hub-skew diagnostic (gate-pinned)."""
    from .ops.agg import grouped_aggregate

    g = gate_graph()
    edges = read_layer(g.edges, columns=["src"])
    deg = grouped_aggregate(edges, ["src"], {"outdeg": ("count", None)})
    return grouped_aggregate(deg.select_columns(["outdeg"]), ["outdeg"],
                             {"n_vertices": ("count", None)})


@_q("q_host_counts")
def q_host_counts(sf_dir: str):
    """M7 analogue (reference split_domain, link_prediction_metadata.py:452-470):
    url -> host, vectorized; pages per host."""
    import pyarrow.compute as pc

    from .ops.agg import grouped_aggregate

    g = gate_graph()
    urls = read_layer(g.vertices, columns=["url"])

    def host(b: pa.Table) -> pa.Table:
        h = pc.list_element(pc.split_pattern(b.column("url"), "/"), 2)
        return pa.table({"host": h.cast(pa.string())})

    hosts = urls.map_batches(host, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_aggregate(hosts, ["host"], {"n_pages": ("count", None)})


@_q("q_edge_splits")
def q_edge_splits(sf_dir: str):
    """R1: deterministic train/val/test split sizes."""
    from .graph.splits import split_edges
    from .ops.agg import grouped_aggregate

    g = graph_for(sf_dir)
    s = split_edges(read_layer(g.edges))
    return grouped_aggregate(s.select_columns(["split"]), ["split"],
                             {"n_edges": ("count", None)})


@_q("q_negative_samples")
def q_negative_samples(sf_dir: str):
    """R1: seeded negative (non-edge) samples."""
    from .graph.splits import negative_sample

    g = graph_for(sf_dir)
    return negative_sample(read_layer(g.edges), g.num_vertices, 100)


@_q("q_sample_khop")
def q_sample_khop(sf_dir: str):
    """R2: k-hop neighbor sampling (reference LinkNeighborLoader
    fan-outs, link_prediction_datamodule.py:147-191) — deterministic
    seeded [3, 2] fan-out from a fixed seed set over the CSR shards;
    returns the sampled edge list.  Property-tested in
    tests/test_sampling_props.py (valid edges, fan-out caps,
    determinism)."""
    from .graph.csr import build_csr_shards
    from .graph.sampling import sample_k_hop

    g = graph_for(sf_dir)
    descs = build_csr_shards(read_layer(g.edges), g.offsets,
                             os.path.join(g.workdir, "csr"),
                             lineage={"kind": "directed"})
    paths = {d["part"]: d["path"] for d in descs}
    seeds = np.arange(10, dtype=np.int64)
    _nodes, s, d = sample_k_hop(seeds, paths, g.offsets, [3, 2], seed=31)
    return pd.DataFrame({"src": s, "dst": d})


@_q("q_url_canonical")
def q_url_canonical(sf_dir: str):
    """URL canonicalization (functions/urls.py) over the vertex table —
    the dedup-identity normalizer for web corpora.  Rows-only; the
    pinned rule cases are certified in tests/test_urls.py."""
    from .functions.urls import canonicalize_urls

    g = gate_graph()
    return canonicalize_urls(read_layer(g.vertices, columns=["url"]))


@_q("q_anf")
def q_anf(sf_dir: str):
    """HyperBall (graph/anf.py): approximate neighborhood function +
    harmonic/closeness centralities over the directed link graph via
    per-vertex HLL counters — the 10^12-page centrality algorithm
    (Boldi & Vigna 2013).  Reuses PageRank's directed CSR shard cache.
    Rows-only at the gate (sketch estimates are not SQL-expressible);
    exact-BFS-oracle error bounds + bitwise partitioning-independence
    in tests/test_anf.py."""
    from .graph.anf import anf

    g = graph_for(sf_dir)
    ds, _ = anf(read_layer(g.edges), g.offsets, g.workdir, p_bits=8)

    def quant(b: pa.Table) -> pa.Table:
        return pa.table({
            "vid": b.column("vid"),
            "reach_est": pa.array(np.round(b.column("reach_est").to_numpy(), 6)),
            "harmonic": pa.array(np.round(b.column("harmonic").to_numpy(), 6)),
            "closeness": pa.array(np.round(b.column("closeness").to_numpy(), 9)),
        })

    return ds.map_batches(quant, batch_format="pyarrow", zero_copy_batch=True)


@_q("q_host_graph")
def q_host_graph(sf_dir: str):
    """Host-graph contraction (graph/hostgraph.py): one vertex per
    host, n_links = url-level link multiplicity — two bucketed joins +
    one grouped sum.  Rows-only at the gate; exact DuckDB contraction
    oracle + weighted-PageRank composition in tests/test_hostgraph.py.
    Returned as host-name pairs (partitioning-independent).  Name
    decoration is a broadcast_lookup under a row-count guard and a
    bucketed hash_join past it — the host dimension (~1e8 rows at web
    scale) never lands on the driver."""
    from .graph.hostgraph import host_graph
    from .ops.join import broadcast_lookup, hash_join

    g = graph_for(sf_dir)
    hv, he, _ = host_graph(read_layer(g.vertices), read_layer(g.edges))
    hv = hv.materialize()  # small side (one row per host); counted next
    int_t, str_t = pa.int64(), pa.string()
    if hv.count() <= 2_000_000:
        src_map = pa.concat_tables(
            [pa.table({"hid": b.column("hid"), "src_host": b.column("host")})
             for b in hv.iter_batches(batch_format="pyarrow")])
        dst_map = src_map.rename_columns(["hid", "dst_host"])
        named = broadcast_lookup(he, "src_h", src_map, "hid", ["src_host"])
        named = broadcast_lookup(named, "dst_h", dst_map, "hid",
                                 ["dst_host"])
    else:
        he_schema = pa.schema([pa.field("src_h", int_t),
                               pa.field("dst_h", int_t),
                               pa.field("n_links", int_t)])
        hv_schema = pa.schema([pa.field("host", str_t),
                               pa.field("hid", int_t)])
        named = hash_join(he, hv, on="src_h", right_on="hid",
                          left_schema=he_schema, right_schema=hv_schema)
        named = named.map_batches(
            lambda b: b.rename_columns(
                ["src_host" if c == "host" else c for c in b.column_names]),
            batch_format="pyarrow", zero_copy_batch=True)
        named = hash_join(
            named, hv, on="dst_h", right_on="hid",
            left_schema=pa.schema([pa.field("src_h", int_t),
                                   pa.field("dst_h", int_t),
                                   pa.field("n_links", int_t),
                                   pa.field("src_host", str_t)]),
            right_schema=hv_schema)
        named = named.map_batches(
            lambda b: b.rename_columns(
                ["dst_host" if c == "host" else c for c in b.column_names]),
            batch_format="pyarrow", zero_copy_batch=True)
    return named.map_batches(
        lambda b: b.select(["src_host", "dst_host", "n_links"]),
        batch_format="pyarrow", zero_copy_batch=True)


@_q("q_betweenness")
def q_betweenness(sf_dir: str):
    """Sampled betweenness centrality (graph/betweenness.py — Brandes
    forward sigma sweep + backward dependency sweep on the shard-actor
    engine, 64 deterministic hash-sampled sources, N/K scaling).
    Rows-only at the gate; the EXACT mode is pinned allclose-1e-9
    against a pure-Python Brandes oracle in tests/test_betweenness.py."""
    from .graph.betweenness import betweenness

    g = graph_for(sf_dir)
    ds, _ = betweenness(read_layer(g.edges), g.offsets,
                        os.path.join(g.workdir, "btw"), n_samples=64,
                        seed=7)

    def quant(b: pa.Table) -> pa.Table:
        return pa.table({
            "vid": b.column("vid"),
            "betweenness": pa.array(
                np.round(b.column("betweenness").to_numpy(), 9))})

    return ds.map_batches(quant, batch_format="pyarrow",
                          zero_copy_batch=True)


@_q("q_bowtie")
def q_bowtie(sf_dir: str):
    """Broder bow-tie census of the directed link graph
    (graph/bowtie.py): SCC/IN/OUT/TENDRIL/DISC per vertex from three
    frontier-BFS fixpoints + one flag-bit grouped merge — exact, no
    O(N) driver state.  Rows-only at the gate; exact NumPy reachability
    oracle + crafted-structure tests in tests/test_bowtie.py."""
    from .graph.bowtie import bowtie

    g = graph_for(sf_dir)
    ds, _ = bowtie(read_layer(g.edges), g.offsets,
                   os.path.join(g.workdir, "bowtie"))
    return ds


@_q("q_random_walks")
def q_random_walks(sf_dir: str):
    """DeepWalk-style random-walk corpus over the directed link graph
    (graph/walks.py) — stateless hash-draw steps, so the walk set is
    bitwise deterministic and partitioning/actor-layout independent.
    Rows-only at the gate; path-validity, layout-independence,
    uniformity and restart oracles in tests/test_walks.py."""
    from .graph.walks import random_walks

    g = graph_for(sf_dir)
    ds, _ = random_walks(read_layer(g.edges), g.offsets, g.workdir,
                         walk_len=8, seed=13)
    return ds


@_q("q_kcore")
def q_kcore(sf_dir: str):
    """2-core membership of the link graph (graph/kcore.py) — degree
    peeling on the CSR shard engine; the web-scale generalization of the
    reference's clean-set vertex filtering.  Rows-only at the gate
    (iterative peeling is not ANSI-SQL-expressible); exact peeling
    oracle in tests/test_kcore.py."""
    from .graph.kcore import k_core

    g = graph_for(sf_dir)
    ds, _ = k_core(symmetrize(read_layer(g.edges), dedup=False),
                   g.offsets, 2, g.workdir)
    return ds.select_columns(["vid", "in_kcore", "core_degree"])


@_q("q_ktruss")
def q_ktruss(sf_dir: str):
    """3-truss edge set of the link graph (graph/truss.py) — iterated
    triangle-support peeling; the edge-cohesion sharpening of the
    k-core clean-set filter.  Rows-only at the gate (iterative peeling
    is not ANSI-SQL-expressible, same argument as q_kcore); exact
    single-process peeling oracle + layout invariance in
    tests/test_truss.py."""
    from .graph.truss import k_truss

    g = graph_for(sf_dir)
    ds, _ = k_truss(read_layer(g.edges), 3)
    return ds


@_q("q_sssp")
def q_sssp(sf_dir: str):
    """Weighted shortest-path distances from vertex 0 over the
    anchor-multiplicity-weighted link graph (graph/sssp.py: frontier-
    restricted Bellman-Ford min-relaxation on the weighted CSR shards;
    weight = 1/multiplicity so heavily-cited links are 'closer').
    Rows-only at the gate (iterative float fixpoint); heapq Dijkstra
    oracle + layout invariance in tests/test_sssp.py."""
    import pyarrow.compute as pc

    from .graph.build import weighted_edges
    from .graph.sssp import sssp

    g = graph_for(sf_dir)
    we = weighted_edges(g)

    def invw(b: pa.Table) -> pa.Table:
        w = b.column("w").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"src": b.column("src"), "dst": b.column("dst"),
                         "w": pa.array(1.0 / w)})

    ds, _ = sssp(we.map_batches(invw, batch_format="pyarrow",
                                zero_copy_batch=True),
                 g.offsets, g.workdir, np.array([0], dtype=np.int64),
                 shards_dir=os.path.join(g.workdir, "csr_w_inv"))
    return ds.select_columns(["vid", "dist"])


@_q("q_powerlaw")
def q_powerlaw(sf_dir: str):
    """Heavy-tail exponent of the link-graph degree distribution
    (graph/metrics.py::powerlaw_alpha, CSN continuous MLE) — gate-
    pinned, SQL-certified at 6dp (summation-order rounding
    discipline)."""
    from .graph.metrics import powerlaw_alpha

    g = gate_graph()
    return powerlaw_alpha(read_layer(g.edges))


@_q("q_mis")
def q_mis(sf_dir: str):
    """Maximal independent set of the link graph (graph/mis.py, Luby)
    — distributed symmetry breaking for conflict-free per-page job
    scheduling.  Deterministic in (edge set, seed).  Rows-only;
    sequential-replay + independence/maximality oracles in
    tests/test_mis.py."""
    from .graph.mis import maximal_independent_set

    g = graph_for(sf_dir)
    ds, _ = maximal_independent_set(
        symmetrize(read_layer(g.edges), drop_self_loops=True, dedup=False),
        g.offsets, g.workdir)
    return ds.select_columns(["vid", "in_mis"])


@_q("q_wl_colors")
def q_wl_colors(sf_dir: str):
    """1-WL color refinement of the link graph (graph/wl.py): per-page
    structural-role labels at the coarsest equitable partition —
    pages with identical local link structure share a color (the
    template/mirror-family signal one level beyond degree, and the
    WL-kernel feature map).  Shares the sym CSR cache with
    q_mis/q_coloring.  Rows-only; sequential-replay + classic-WL
    partition oracles in tests/test_wl.py."""
    from .graph.wl import wl_refinement

    g = graph_for(sf_dir)
    ds, _ = wl_refinement(
        symmetrize(read_layer(g.edges), drop_self_loops=True, dedup=False),
        g.offsets, g.workdir)
    return ds


@_q("q_matching")
def q_matching(sf_dir: str):
    """Greedy maximal matching of the link graph (graph/matching.py,
    mutual-minimum-edge proposals under stateless pair-hash
    priorities) — the pair-coarsening / 2-approx-vertex-cover
    primitive; equals the sequential greedy matching under the
    (edge_priority, min, max) order, deterministic in (edge set,
    seed) and layout-independent.  Shares the sym CSR cache with
    q_mis/q_coloring.  Rows-only; sequential-greedy oracle +
    maximality/symmetry invariants in tests/test_matching.py."""
    from .graph.matching import maximal_matching

    g = graph_for(sf_dir)
    ds, _ = maximal_matching(
        symmetrize(read_layer(g.edges), drop_self_loops=True, dedup=False),
        g.offsets, g.workdir)
    return ds.select_columns(["vid", "partner"])


@_q("q_coarsen")
def q_coarsen(sf_dir: str):
    """Multilevel contraction step (graph/coarsen.py): maximal-matching
    pairs collapse into supervertices, parallel edges sum weights,
    self-loops keep the internal mass — the METIS-style coarse graph
    that ldg_partition / louvain consume.  Rows-only; pandas
    contraction oracle + weight-conservation invariants in
    tests/test_coarsen.py (both relabel regimes)."""
    from .graph.coarsen import coarsen_by_matching
    from .graph.matching import maximal_matching

    g = graph_for(sf_dir)
    sym = symmetrize(read_layer(g.edges), drop_self_loops=True,
                     dedup=False)
    mt, _ = maximal_matching(sym, g.offsets, g.workdir)
    coarse, _, _ = coarsen_by_matching(sym, mt)
    return coarse


@_q("q_coloring")
def q_coloring(sf_dir: str):
    """Jones-Plassmann greedy coloring of the link graph
    (graph/coloring.py): conflict groups for mutate-every-page-once
    scheduling; color 0 is an MIS.  Deterministic in (edge set, seed).
    Rows-only; sequential-replay + validity/greedy-tightness oracles in
    tests/test_coloring.py."""
    from .graph.coloring import greedy_coloring

    g = graph_for(sf_dir)
    ds, _ = greedy_coloring(
        symmetrize(read_layer(g.edges), drop_self_loops=True, dedup=False),
        g.offsets, g.workdir)
    return ds.select_columns(["vid", "color"])


@_q("q_densest")
def q_densest(sf_dir: str):
    """(2+2eps)-approximate densest subgraph of the link graph
    (graph/densest.py, Bahmani parallel peeling) — the link-farm /
    collusion-ring detector.  Rows-only; sequential-replay +
    planted-clique oracles in tests/test_densest.py."""
    from .graph.densest import densest_subgraph

    g = graph_for(sf_dir)
    ds, _ = densest_subgraph(
        symmetrize(read_layer(g.edges), drop_self_loops=True, dedup=False),
        g.offsets, g.workdir)
    return ds.select_columns(["vid", "removal_round", "in_densest"])


@_q("q_coreness")
def q_coreness(sf_dir: str):
    """Full core decomposition of the link graph
    (graph/coreness.py): per-vertex core numbers via distributed
    h-index iteration — the complete degeneracy profile where q_kcore
    answers one k.  Rows-only at the gate (iterative fixpoint); exact
    Batagelj peeling oracle + k-core cross-consistency in
    tests/test_coreness.py."""
    from .graph.coreness import coreness

    g = graph_for(sf_dir)
    ds, _ = coreness(
        symmetrize(read_layer(g.edges), drop_self_loops=True, dedup=False),
        g.offsets, g.workdir)
    return ds.select_columns(["vid", "coreness"])


@_q("q_incoming_anchors")
def q_incoming_anchors(sf_dir: str):
    """Per-target incoming anchor-text aggregate
    (functions/anchors.py): link count, distinct anchor phrasings and
    the dominant phrases per target url — the search/LLM-dataset page
    descriptor.  Rows-only; exact crafted-corpus + partitioning-
    invariance oracles in tests/test_anchors.py."""
    from .functions.anchors import anchor_edges, incoming_anchors
    from .fixtures import ensure_pages_parquet

    pages = rd.read_parquet(ensure_pages_parquet(_scale_for(sf_dir), 123),
                            columns=["url", "html"])
    return incoming_anchors(anchor_edges(pages))


@_q("q_modularity")
def q_modularity(sf_dir: str):
    """Newman modularity of the label-propagation communities
    (graph/metrics.py::modularity): two bucketed joins attach endpoint
    labels (never a |V| broadcast), one combiner + label-grouped sum.
    Returns the per-community (label, e_in, deg) table with Q attached
    as a constant column.  Rows-only; exact bridge-graph oracle in
    tests/test_metrics.py."""
    import pyarrow.compute as _pc

    from .graph.labelprop import label_propagation
    from .graph.metrics import modularity
    from .graph.triangles import canonical_undirected

    g = graph_for(sf_dir)
    labels, _ = label_propagation(
        symmetrize(read_layer(g.edges), drop_self_loops=True, dedup=False),
        g.offsets, g.workdir, rounds=5)
    canon = canonical_undirected(read_layer(g.edges))
    q, per = modularity(canon, labels.select_columns(["vid", "label"]))
    qx = int(round(q * 10**9))
    return per.map_batches(
        lambda b: b.append_column(
            "q_x1e9", pa.array([qx] * b.num_rows, type=pa.int64())),
        batch_format="pyarrow", zero_copy_batch=True)


@_q("q_host_backbone_mst")
def q_host_backbone_mst(sf_dir: str):
    """Maximum-weight spanning forest of the host graph (graph/mst.py,
    Boruvka 1926 over the n_links-weighted contraction) — the classic
    "crawl backbone": the strongest inter-host link skeleton touching
    every host.  Max-forest = min-forest on negated weights; the
    (w, u, v) lexicographic tiebreak makes the edge SET unique and
    partitioning-invariant.  Rows-only at the gate; the operator is
    certified edge-set-exact vs a sequential Kruskal oracle plus a
    scipy total-weight cross-check in tests/test_mst.py.  Returned as
    host-name pairs via broadcast_lookup (bounded small side)."""
    from .graph.hostgraph import host_graph
    from .graph.mst import minimum_spanning_forest
    from .ops.join import broadcast_lookup

    g = graph_for(sf_dir)
    hv, he, _ = host_graph(read_layer(g.vertices), read_layer(g.edges),
                           drop_self_loops=True)

    def neg_w(b: pa.Table) -> pa.Table:
        w = b.column("n_links").to_numpy(zero_copy_only=False)
        return pa.table({"src_h": b.column("src_h"),
                         "dst_h": b.column("dst_h"),
                         "negw": pa.array(-w.astype(np.float64))})

    msf, info = minimum_spanning_forest(
        he.map_batches(neg_w, batch_format="pyarrow",
                       zero_copy_batch=True),
        src="src_h", dst="dst_h", weight_col="negw",
        num_parts=DEFAULT.num_parts)
    hv = hv.materialize()
    host_map = pa.concat_tables(
        [pa.table({"hid": b.column("hid"), "host_u": b.column("host")})
         for b in hv.iter_batches(batch_format="pyarrow")])

    named = broadcast_lookup(msf, "u", host_map, "hid", ["host_u"])
    named = broadcast_lookup(
        named, "v", host_map.rename_columns(["hid", "host_v"]),
        "hid", ["host_v"])

    def fin(b: pa.Table) -> pa.Table:
        w = b.column("w").to_numpy(zero_copy_only=False)
        return pa.table({"host_u": b.column("host_u"),
                         "host_v": b.column("host_v"),
                         "n_links": pa.array((-w).astype(np.int64))})

    return named.map_batches(fin, batch_format="pyarrow",
                             zero_copy_batch=True)


@_q("q_multilevel_partition")
def q_multilevel_partition(sf_dir: str):
    """Multilevel balanced partitioning (graph/multilevel.py: match ->
    contract -> weighted LDG -> project back -> gain-based move
    refinement, the full METIS V-cycle): coarsening concentrates
    connectivity so the streaming partitioner sees cluster-level
    neighborhoods, cutting the edge-cut below flat LDG at the same
    fine-level (1+eps) balance (supervertices carry fine-vertex
    weights).  Rows-only; fine balance/coverage/layout-independence
    and cut-vs-flat pinned in tests/test_multilevel.py.  Returns
    (url, block) plus the achieved edge-cut fraction as a constant
    column (q_ldg_partition's reporting convention)."""
    from .graph.multilevel import multilevel_partition
    from .graph.partition import partition_cut
    from .ops.join import hash_join

    g = graph_for(sf_dir)
    e = read_layer(g.edges)
    sym = symmetrize(e, drop_self_loops=True, dedup=False)
    blocks, info = multilevel_partition(sym, g.offsets, g.workdir,
                                        k=8, chunk=4096, levels=1)
    blocks = blocks.materialize()
    cut = partition_cut(e, blocks, num_parts=DEFAULT.num_parts)
    cut_x1e9 = int(round(cut["cut_fraction"] * 10**9))
    b_schema = pa.schema([("vid", pa.int64()), ("block", pa.int32())])

    verts = read_layer(g.vertices, columns=["url", "vid"])
    out = hash_join(verts, blocks, on="vid", right_on="vid",
                    num_parts=DEFAULT.num_parts,
                    left_schema=pa.schema([("url", pa.string()),
                                           ("vid", pa.int64())]),
                    right_schema=b_schema)
    return out.map_batches(
        lambda b: pa.table({
            "url": b.column("url"),
            "block": b.column("block"),
            "cut_x1e9": pa.array([cut_x1e9] * b.num_rows,
                                 type=pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)


@_q("q_hdrf_partition")
def q_hdrf_partition(sf_dir: str):
    """Streaming vertex-cut edge partitioning (graph/edgepartition.py,
    HDRF — Petroni et al. CIKM 2015): assigns EDGES to blocks and
    replicates endpoint vertices, preferring to re-replicate the
    higher-degree endpoint; the PowerGraph-style dual of q_ldg_
    partition for power-law web graphs.  Rows-only; replication-
    factor-vs-hash, balance, determinism and the sequential spec
    oracle are pinned in tests/test_edgepartition.py.  Returns
    (src_url, dst_url, block) plus the replication factor as a
    constant column (x1e9 int, the partitioner reporting
    convention)."""
    from .graph.edgepartition import hdrf_partition
    from .ops.join import hash_join

    g = graph_for(sf_dir)
    e = read_layer(g.edges)
    eb, info = hdrf_partition(e, g.offsets, g.workdir, k=8,
                              chunk=8192)
    rf_x1e9 = int(round(info["replication_factor"] * 10**9))
    v = read_layer(g.vertices, columns=["url", "vid"])
    v_schema = pa.schema([("url", pa.string()), ("vid", pa.int64())])
    eb_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64()),
                           ("block", pa.int32())])
    j1 = hash_join(eb, v, on="src", right_on="vid",
                   num_parts=DEFAULT.num_parts,
                   left_schema=eb_schema, right_schema=v_schema)
    j1 = j1.map_batches(
        lambda b: pa.table({"dst": b.column("dst"),
                            "block": b.column("block"),
                            "src_url": b.column("url")}),
        batch_format="pyarrow", zero_copy_batch=True)
    j1_schema = pa.schema([("dst", pa.int64()), ("block", pa.int32()),
                           ("src_url", pa.string())])
    j2 = hash_join(j1, v, on="dst", right_on="vid",
                   num_parts=DEFAULT.num_parts,
                   left_schema=j1_schema, right_schema=v_schema)
    return j2.map_batches(
        lambda b: pa.table({
            "src_url": b.column("src_url"),
            "dst_url": b.column("url"),
            "block": b.column("block"),
            "rf_x1e9": pa.array([rf_x1e9] * b.num_rows,
                                type=pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)


@_q("q_ldg_partition")
def q_ldg_partition(sf_dir: str):
    """Streaming balanced graph partitioning (graph/partition.py::
    ldg_partition, batch-synchronous LDG — Stanton & Kliot 2012): the
    k=8 low-cut balanced block assignment that decides multi-node
    layout for every iterative campaign.  Rows-only at the gate; the
    spec is bitwise-replayed by a sequential oracle, the hard balance
    cap, actor-layout invariance and planted-community cut quality
    are pinned in tests/test_partition.py.  Returns (url, block) plus
    the achieved edge-cut fraction as a constant column."""
    from .graph.partition import ldg_partition, partition_cut
    from .ops.join import hash_join

    g = graph_for(sf_dir)
    e = read_layer(g.edges)
    sym = symmetrize(e, drop_self_loops=True, dedup=False)
    blocks, info = ldg_partition(sym, g.offsets, g.workdir, k=8,
                                 chunk=4096)
    blocks = blocks.materialize()
    cut = partition_cut(e, blocks, num_parts=DEFAULT.num_parts)
    cut_x1e9 = int(round(cut["cut_fraction"] * 10**9))
    b_schema = pa.schema([("vid", pa.int64()), ("block", pa.int32())])

    verts = read_layer(g.vertices, columns=["url", "vid"])
    out = hash_join(verts, blocks, on="vid", right_on="vid",
                    num_parts=DEFAULT.num_parts,
                    left_schema=pa.schema([("url", pa.string()),
                                           ("vid", pa.int64())]),
                    right_schema=b_schema)
    return out.map_batches(
        lambda b: pa.table({
            "url": b.column("url"),
            "block": b.column("block"),
            "cut_x1e9": pa.array([cut_x1e9] * b.num_rows,
                                 type=pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)


@_q("q_scan_edges")
def q_scan_edges(sf_dir: str):
    """SCAN structural similarity per undirected url edge
    (graph/metrics.py::scan_similarity — Xu et al. 2007): sigma =
    (triangle support + 2) / sqrt((deg_u+1)(deg_v+1)) with closed
    neighborhoods.  SQL-certified (exact int support + one sqrt + one
    division, rounded 9 dp), gate-pinned corpus."""
    from .graph.metrics import scan_similarity
    from .ops.join import hash_join

    g = gate_graph()
    sc = scan_similarity(read_layer(g.edges))
    v = read_layer(g.vertices, columns=["url", "vid"])
    sc_schema = pa.schema([pa.field("src", pa.int64()),
                           pa.field("dst", pa.int64()),
                           pa.field("support", pa.int64()),
                           pa.field("sigma", pa.float64())])
    v_schema = pa.schema([pa.field("url", pa.string()),
                          pa.field("vid", pa.int64())])
    j = hash_join(sc, v, on="src", right_on="vid",
                  num_parts=DEFAULT.num_parts,
                  left_schema=sc_schema, right_schema=v_schema)
    j = j.map_batches(lambda b: b.rename_columns(
        ["src", "dst", "support", "sigma", "url_u"]),
        batch_format="pyarrow", zero_copy_batch=True)
    j_schema = pa.schema([pa.field("src", pa.int64()),
                          pa.field("dst", pa.int64()),
                          pa.field("support", pa.int64()),
                          pa.field("sigma", pa.float64()),
                          pa.field("url_u", pa.string())])
    j = hash_join(j, v, on="dst", right_on="vid",
                  num_parts=DEFAULT.num_parts,
                  left_schema=j_schema, right_schema=v_schema)

    def fin(b: pa.Table) -> pa.Table:
        ua = b.column("url_u").to_numpy(zero_copy_only=False)
        ub = b.column("url").to_numpy(zero_copy_only=False)
        # edge identity is the unordered pair; canonicalize by url so
        # rows line up with the oracle's least/greatest form
        m = ua < ub
        return pa.table({
            "url_a": pa.array(np.where(m, ua, ub), type=pa.string()),
            "url_b": pa.array(np.where(m, ub, ua), type=pa.string()),
            "support": b.column("support"),
            "sigma": b.column("sigma")})

    return j.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


@_q("q_avg_neighbor_degree")
def q_avg_neighbor_degree(sf_dir: str):
    """knn(k) degree-correlation curve
    (graph/metrics.py::avg_neighbor_degree, stub-weighted): per degree
    value, exact int64 (n_vertices, sum_neighbor_deg) and the one-
    division knn.  SQL-certified, gate-pinned corpus."""
    from .graph.metrics import avg_neighbor_degree

    g = gate_graph()
    return avg_neighbor_degree(read_layer(g.edges))


@_q("q_scan_clusters")
def q_scan_clusters(sf_dir: str):
    """SCAN structural clustering of the link graph (graph/scan.py —
    Xu et al. 2007): eps-similarity cores -> CC clusters -> border
    attach -> hub/outlier split.  The deterministic hub-vs-community
    separator Louvain can't express.  Rows-only at the gate
    (iterative CC inside); sequential-oracle parity + layout
    invariance in tests/test_scan.py."""
    from .graph.scan import scan_clusters
    from .ops.join import hash_join

    g = graph_for(sf_dir)
    labs, _info = scan_clusters(read_layer(g.edges), g.offsets, g.workdir,
                                eps=0.4, mu=3)
    v = read_layer(g.vertices, columns=["url", "vid"])
    l_schema = pa.schema([pa.field("vid", pa.int64()),
                          pa.field("label", pa.int64()),
                          pa.field("role", pa.string())])
    v_schema = pa.schema([pa.field("url", pa.string()),
                          pa.field("vid", pa.int64())])
    out = hash_join(labs, v, on="vid", right_on="vid",
                    num_parts=DEFAULT.num_parts,
                    left_schema=l_schema, right_schema=v_schema)
    return out.map_batches(
        lambda b: pa.table({"url": b.column("url"),
                            "label": b.column("label"),
                            "role": b.column("role")}),
        batch_format="pyarrow", zero_copy_batch=True)


@_q("q_redirect_resolution")
def q_redirect_resolution(sf_dir: str):
    """Redirect-chain resolution (graph/redirects.py): each page's
    "redirect" is its lexicographic-min outlink (a deterministic
    functional mapping over the gate corpus); pointer DOUBLING resolves
    every source to its position after min(32, hops-to-terminal) steps
    with the hop count carried along — 5 bucketed self-joins, never a
    per-hop pass.  SQL-certified against a bounded recursive closure,
    gate-pinned corpus."""
    import ray.data as rd

    from .fixtures import ensure_anchors_parquet
    from .graph.redirects import resolve_pointers
    from .ops.agg import grouped_aggregate

    anchors = rd.read_parquet(ensure_anchors_parquet(_GATE_N, _SEED),
                              columns=["src_url", "dst_url"])
    mapping = grouped_aggregate(anchors, ["src_url"],
                                {"dst": ("min", "dst_url")},
                                num_parts=DEFAULT.num_parts)
    out = resolve_pointers(mapping, key="src_url", val="dst")
    return out.map_batches(
        lambda b: pa.table({"url": b.column("k"),
                            "final": b.column("final"),
                            "hops": b.column("hops")}),
        batch_format="pyarrow", zero_copy_batch=True)


@_q("q_host_homophily")
def q_host_homophily(sf_dir: str):
    """Host homophily of the link graph: fraction of distinct directed
    edges whose endpoints share a host — the intra-site vs cross-site
    link-mass split every crawler/partitioner reasons about.  Exact
    integer counts + ONE division; SQL-certified, gate-pinned corpus."""
    import ray.data as rd

    from .fixtures import ensure_anchors_parquet
    from .graph.hostgraph import hosts_of
    from .ops.agg import grouped_aggregate

    anchors = rd.read_parquet(ensure_anchors_parquet(_GATE_N, _SEED),
                              columns=["src_url", "dst_url"])
    de = grouped_aggregate(anchors, ["src_url", "dst_url"],
                           {"c": ("count", None)},
                           num_parts=DEFAULT.num_parts)

    def partial(b: pa.Table) -> pa.Table:
        hs = hosts_of(b.column("src_url")).to_numpy(zero_copy_only=False)
        hd = hosts_of(b.column("dst_url")).to_numpy(zero_copy_only=False)
        return pa.table({
            "n_edges": pa.array([b.num_rows], type=pa.int64()),
            "n_intra": pa.array([int((hs == hd).sum())], type=pa.int64())})

    parts = de.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    n, i = int(parts["n_edges"].sum()), int(parts["n_intra"].sum())
    return pd.DataFrame({"n_edges": pd.Series([n], dtype="int64"),
                         "n_intra": pd.Series([i], dtype="int64"),
                         "homophily": pd.Series([i / n], dtype="float64")})


@_q("q_outlink_host_entropy")
def q_outlink_host_entropy(sf_dir: str):
    """Per-page Shannon entropy of outlink TARGET HOSTS
    (ops/stats.py::grouped_entropy over the raw anchor rows) — the
    outlink-diversity signal separating navigation/boilerplate pages
    (one host) from genuine hub pages.  SQL-certified, gate-pinned
    corpus."""
    import ray.data as rd

    from .fixtures import ensure_anchors_parquet
    from .graph.hostgraph import hosts_of
    from .ops.stats import grouped_entropy

    anchors = rd.read_parquet(ensure_anchors_parquet(_GATE_N, _SEED),
                              columns=["src_url", "dst_url"])

    def with_host(b: pa.Table) -> pa.Table:
        return pa.table({"src_url": b.column("src_url"),
                         "dst_host": hosts_of(b.column("dst_url"))})

    h = anchors.map_batches(with_host, batch_format="pyarrow",
                            zero_copy_batch=True)
    return grouped_entropy(h, "src_url", "dst_host")


@_q("q_intra_host_components")
def q_intra_host_components(sf_dir: str):
    """Leiden refinement kernel certified at the gate: connected
    components of the subgraph induced by HOST classes (labels = one
    community per host; graph/leiden.py::refine_connectivity), each
    vertex paired with min(url) over its intra-host piece — the site-
    section structure of the crawl.  Oracle: recursive closure over
    the host-filtered anchor graph.  Scale shape: two bucketed label
    joins + the min-label CC engine + the q_components_urls
    decoration joins; hosts get collision-free dense ids (never a
    hash-as-label shortcut)."""
    from .graph.hostgraph import hosts_of
    from .graph.leiden import refine_connectivity
    from .ops.agg import grouped_aggregate
    from .ops.ids import assign_dense_ids_hash
    from .ops.join import hash_join

    i64, str_t = pa.int64(), pa.string()
    g = gate_graph()
    v = read_layer(g.vertices, columns=["url", "vid"])

    def with_host(b: pa.Table) -> pa.Table:
        return pa.table({"vid": b.column("vid").cast(pa.int64()),
                         "host": hosts_of(b.column("url"))})

    vh = v.map_batches(with_host, batch_format="pyarrow",
                       zero_copy_batch=True)
    host_ids, _hoff = assign_dense_ids_hash(
        vh.select_columns(["host"]), "host", DEFAULT.num_parts,
        id_col="hid")
    labels = hash_join(
        vh, host_ids.select_columns(["host", "hid"]), on="host",
        num_parts=DEFAULT.num_parts,
        left_schema=pa.schema([("vid", i64), ("host", str_t)]),
        right_schema=pa.schema([("host", str_t), ("hid", i64)])
    ).map_batches(
        lambda b: pa.table({"vid": b.column("vid"),
                            "community": b.column("hid")}),
        batch_format="pyarrow", zero_copy_batch=True)
    refined, _ = refine_connectivity(
        read_layer(g.edges), labels, g.offsets, g.workdir,
        job="intrahost", stats=False)
    # decorate with urls: rep = min url per refined piece (the
    # q_components_urls tail)
    lab_schema = pa.schema([("vid", i64), ("community", i64)])
    v_schema = pa.schema([("url", str_t), ("vid", i64)])
    withurl = hash_join(refined, v, on="vid", right_on="vid",
                        num_parts=DEFAULT.num_parts,
                        left_schema=lab_schema,
                        right_schema=v_schema).materialize()
    rep = grouped_aggregate(withurl.select_columns(["community", "url"]),
                            ["community"],
                            {"component_url": ("min", "url")})
    wu_schema = pa.schema([("vid", i64), ("community", i64),
                           ("url", str_t)])
    rep_schema = pa.schema([("community", i64),
                            ("component_url", str_t)])
    out = hash_join(withurl, rep, on="community", right_on="community",
                    num_parts=DEFAULT.num_parts, left_cols=["url"],
                    left_schema=wu_schema, right_schema=rep_schema)
    return out.map_batches(
        lambda b: pa.table({"url": b.column("url"),
                            "component_url": b.column("component_url")}),
        batch_format="pyarrow", zero_copy_batch=True)


@_q("q_louvain_leiden")
def q_louvain_leiden(sf_dir: str):
    """Louvain + Leiden connectivity refinement
    (graph/leiden.py::louvain_leiden): every returned community's
    induced subgraph is connected — the guarantee plain Louvain lacks
    (Traag 2019).  Rows-only at the gate (hash-scheduled moves);
    induced-subgraph-CC oracle, modularity monotonicity and the
    connectivity guarantee are pinned in tests/test_leiden.py, and the
    refinement kernel is SQL-certified by q_intra_host_components."""
    from .graph.leiden import louvain_leiden

    g = graph_for(sf_dir)
    labels, _ = louvain_leiden(read_layer(g.edges), g.offsets,
                               g.workdir)
    return labels


@_q("q_spectral_clusters")
def q_spectral_clusters(sf_dir: str):
    """Ng-Jordan-Weiss spectral clustering of the link graph
    (graph/spectral.py: distributed block orthogonal iteration on
    D^{-1/2} A D^{-1/2} -> row-normalized eigenvector geometry -> the
    engine's certified k-means).  Rows-only at the gate; dense-eigh
    Ritz parity, layout invariance and planted-block recovery pinned
    in tests/test_spectral.py."""
    from .graph.spectral import spectral_clustering

    g = graph_for(sf_dir)
    labels, _ = spectral_clustering(
        read_layer(g.edges), g.offsets, g.workdir,
        n_clusters=8, dim=8, tol=1e-8, max_iters=60, kmeans_iters=12)
    return labels


@_q("q_host_backbone_disparity")
def q_host_backbone_disparity(sf_dir: str):
    """Disparity-filter backbone of the host graph (graph/backbone.py,
    Serrano 2009): per-edge null-model p-value from the source host's
    degree/strength over link-multiplicity weights.  SQL-certified
    (DuckDB pow() oracle), gate-pinned corpus; host names attached by
    bucketed joins (the host table never lands on the driver)."""
    from .graph.backbone import disparity_filter
    from .graph.hostgraph import host_graph
    from .ops.join import hash_join

    i64, f64, str_t = pa.int64(), pa.float64(), pa.string()
    g = gate_graph()
    hv, he, _hoff = host_graph(read_layer(g.vertices),
                               read_layer(g.edges))
    hv = hv.materialize()  # feeds both name joins
    scored = disparity_filter(he, DEFAULT, src_col="src_h",
                              dst_col="dst_h", weight_col="n_links",
                              alpha=0.05, mode="directed")
    sc_schema = pa.schema([("src", i64), ("dst", i64), ("w", f64),
                           ("p", f64), ("keep", pa.bool_())])
    hv_schema = pa.schema([("host", str_t), ("hid", i64)])
    j1 = hash_join(scored, hv, on="src", right_on="hid",
                   num_parts=DEFAULT.num_parts,
                   left_schema=sc_schema, right_schema=hv_schema)
    j1 = j1.map_batches(
        lambda b: pa.table({"dst": b.column("dst"),
                            "src_host": b.column("host"),
                            "w": b.column("w"), "p": b.column("p")}),
        batch_format="pyarrow", zero_copy_batch=True)
    j1_schema = pa.schema([("dst", i64), ("src_host", str_t),
                           ("w", f64), ("p", f64)])
    j2 = hash_join(j1, hv, on="dst", right_on="hid",
                   num_parts=DEFAULT.num_parts,
                   left_schema=j1_schema, right_schema=hv_schema)

    def fin(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "src_host": b.column("src_host"),
            "dst_host": b.column("host"),
            "n_links": pc.cast(b.column("w"), i64),
            "p": pa.array(np.round(b.column("p").to_numpy(), 9))})

    return j2.map_batches(fin, batch_format="pyarrow",
                          zero_copy_batch=True)


@_q("q_lang_assortativity")
def q_lang_assortativity(sf_dir: str):
    """Language assortativity of the link graph: Newman's discrete
    mixing coefficient over (lang(src), lang(dst)) of distinct edges
    whose BOTH endpoints are crawled pages (outlink-only vertices
    carry no lang).  Exact integer mixing matrix; the scalar is one
    division of exact int products, bitwise vs DuckDB.  Gate-pinned
    corpus."""
    from .fixtures import pages_dir
    from .graph.metrics import categorical_assortativity
    from .ops.dedup import distinct

    str_t = pa.string()
    anchors = rd.read_parquet(ensure_anchors_parquet(_GATE_N, _SEED),
                              columns=["src_url", "dst_url"])
    de = distinct(anchors, ["src_url", "dst_url"],
                  num_parts=DEFAULT.num_parts)
    pages = rd.read_parquet(pages_dir(_GATE_N, _SEED),
                            columns=["url", "lang"])
    from .ops.join import hash_join

    de_schema = pa.schema([("src_url", str_t), ("dst_url", str_t)])
    pg_schema = pa.schema([("url", str_t), ("lang", str_t)])
    j1 = hash_join(de, pages, on="src_url", right_on="url",
                   num_parts=DEFAULT.num_parts,
                   left_schema=de_schema, right_schema=pg_schema)
    j1 = j1.map_batches(
        lambda b: pa.table({"dst_url": b.column("dst_url"),
                            "la": b.column("lang")}),
        batch_format="pyarrow", zero_copy_batch=True)
    j1_schema = pa.schema([("dst_url", str_t), ("la", str_t)])
    j2 = hash_join(j1, pages, on="dst_url", right_on="url",
                   num_parts=DEFAULT.num_parts,
                   left_schema=j1_schema, right_schema=pg_schema)
    pairs = j2.map_batches(
        lambda b: pa.table({"la": b.column("la"),
                            "lb": b.column("lang")}),
        batch_format="pyarrow", zero_copy_batch=True)
    res = categorical_assortativity(pairs)
    return pd.DataFrame({
        "n_edges": pd.Series([res["n_edges"]], dtype="int64"),
        "n_same": pd.Series([res["n_same"]], dtype="int64"),
        "assortativity": pd.Series([round(res["assortativity"], 9)],
                                   dtype="float64")})


@_q("q_triangles_apx")
def q_triangles_apx(sf_dir: str):
    """Wedge-sampling triangle estimate (graph/apxtriangles.py,
    Seshadhri 2013) — the 100 TB companion to the exact counter:
    degree pass + K hash-drawn wedges + one bucketed closure
    semi-join; stderr(kappa) <= 1/(2 sqrt(K)) independent of graph
    size.  Rows-only; 5-sigma accuracy envelope vs the exact count
    and fixed-layout bitwise determinism in
    tests/test_apxtriangles.py."""
    from .graph.apxtriangles import approx_triangles

    g = graph_for(sf_dir)
    info, _ = approx_triangles(read_layer(g.edges), g.offsets,
                               g.workdir, k_samples=50_000, seed=42)
    return pd.DataFrame({
        "n_wedges": pd.Series([info["n_wedges"]], dtype="float64"),
        "k_samples": pd.Series([info["k_samples"]], dtype="int64"),
        "n_closed": pd.Series([info["n_closed"]], dtype="int64"),
        "kappa": pd.Series([info["kappa"]], dtype="float64"),
        "triangles_est": pd.Series([info["triangles_est"]],
                                   dtype="float64")})


@_q("q_host_rank_denoised")
def q_host_rank_denoised(sf_dir: str):
    """Denoised host ranking — the backbone capstone composition:
    host-graph contraction -> disparity filter (graph/backbone.py,
    directed, alpha=0.1) -> WEIGHTED PageRank on only the surviving
    significant edges (dangling mass handles hosts that lose every
    edge).  The classic answer to link-spam inflation: insignificant
    promiscuous links stop transferring rank mass.  Rows-only
    (iterative float fixpoint); every stage is individually certified
    (q_host_backbone_disparity hash-exact, pagerank NumPy 1e-6)."""
    from .graph.backbone import disparity_filter
    from .graph.hostgraph import host_graph
    from .graph.pagerank import pagerank
    from .ops.join import hash_join

    i64, f64, str_t = pa.int64(), pa.float64(), pa.string()
    g = gate_graph()
    hv, he, hoff = host_graph(read_layer(g.vertices),
                              read_layer(g.edges))
    hv = hv.materialize()
    scored = disparity_filter(he, DEFAULT, src_col="src_h",
                              dst_col="dst_h", weight_col="n_links",
                              alpha=0.1, mode="directed")

    def kept(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = b.filter(b.column("keep"))
        return pa.table({"src": t.column("src"),
                         "dst": t.column("dst"),
                         "w": t.column("w")})

    backbone = scored.map_batches(kept, batch_format="pyarrow",
                                  zero_copy_batch=True)
    ranks, _ = pagerank(backbone, hoff,
                        f"{g.workdir}/host_backbone_rank",
                        job="host_bb_rank", weight_col="w")
    r_schema = pa.schema([("vid", i64), ("rank", f64)])
    hv_schema = pa.schema([("host", str_t), ("hid", i64)])
    named = hash_join(ranks.select_columns(["vid", "rank"]), hv,
                      on="vid", right_on="hid",
                      num_parts=DEFAULT.num_parts,
                      left_schema=r_schema, right_schema=hv_schema)
    return named.map_batches(
        lambda b: pa.table({"host": b.column("host"),
                            "rank": pa.array(np.round(
                                b.column("rank").to_numpy(), 9))}),
        batch_format="pyarrow", zero_copy_batch=True)


@_q("q_hub_robustness")
def q_hub_robustness(sf_dir: str):
    """Attack-robustness of the link graph (Albert-Jeong-Barabasi
    2000 'Error and attack tolerance'): remove the top-10 hubs by
    undirected distinct-neighbor degree (ties -> smallest url, so the
    removal set is engine-independent), then measure what survives —
    remaining vertices, number of components, giant-component size.
    One degree aggregate + a 10-row broadcast anti-filter + the
    certified CC engine; SQL oracle = recursive closure over the
    hub-filtered anchor graph."""
    from .ops.agg import grouped_aggregate
    from .ops.join import hash_join

    i64, str_t = pa.int64(), pa.string()
    K = 10
    g = gate_graph()
    v = read_layer(g.vertices, columns=["url", "vid"])
    sym = symmetrize(read_layer(g.edges), dedup=True)
    deg = grouped_aggregate(sym.select_columns(["src"]), ["src"],
                            {"deg": ("count", None)},
                            num_parts=DEFAULT.num_parts)
    dd = hash_join(deg, v, on="src", right_on="vid",
                   num_parts=DEFAULT.num_parts,
                   left_schema=pa.schema([("src", i64), ("deg", i64)]),
                   right_schema=pa.schema([("url", str_t),
                                           ("vid", i64)]))
    from .ops.topk import grouped_top_k

    # global top-k: single-group top-k (two-level candidate pruning)
    dd = dd.map_batches(
        lambda b: pa.table({"one": pa.array(
            np.zeros(b.num_rows, dtype=np.int64)),
            "src": b.column("src"), "deg": b.column("deg"),
            "url": b.column("url")}),
        batch_format="pyarrow", zero_copy_batch=True)
    top = grouped_top_k(dd, ["one"], "deg", k=K, tie_break=["url"],
                        num_parts=DEFAULT.num_parts).to_pandas()
    removed = set(top["src"].astype(int))
    import ray as _ray

    rref = _ray.put(np.asarray(sorted(removed), dtype=np.int64))

    def drop(b: pa.Table) -> pa.Table:
        r = _ray.get(rref)
        s = b.column("src").to_numpy()
        d = b.column("dst").to_numpy()
        m = ~(np.isin(s, r) | np.isin(d, r))
        return pa.table({"src": pa.array(s[m]), "dst": pa.array(d[m])})

    from .graph.components import connected_components

    filt = read_layer(g.edges).map_batches(
        drop, batch_format="pyarrow", zero_copy_batch=True)
    labels, _ = connected_components(
        symmetrize(filt, dedup=False), g.offsets, g.workdir,
        job="cc_knockout", shards_dir=f"{g.workdir}/csr_knockout")

    def surv(b: pa.Table) -> pa.Table:
        r = _ray.get(rref)
        vid = b.column("vid").to_numpy()
        lab = b.column("label").to_numpy()
        m = ~np.isin(vid, r)
        return pa.table({"label": pa.array(lab[m])})

    sizes = grouped_aggregate(
        labels.map_batches(surv, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["label"], {"n": ("count", None)}, num_parts=DEFAULT.num_parts)

    def fold(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = b.column("n")
        return pa.table({
            "n_remaining": pa.array([int(pc.sum(n).as_py() or 0)],
                                    type=i64),
            "n_components": pa.array([b.num_rows], type=i64),
            "largest_cc": pa.array([int(pc.max(n).as_py() or 0)],
                                   type=i64)})

    parts = sizes.map_batches(fold, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
    return pd.DataFrame({
        "k_removed": pd.Series([K], dtype="int64"),
        "n_remaining": pd.Series([int(parts.n_remaining.sum())],
                                 dtype="int64"),
        "n_components": pd.Series([int(parts.n_components.sum())],
                                  dtype="int64"),
        "largest_cc": pd.Series([int(parts.largest_cc.max())],
                                dtype="int64")})


@_q("q_fourcycles")
def q_fourcycles(sf_dir: str):
    """Exact global 4-cycle (rectangle) census of the link graph
    (graph/metrics.py::four_cycle_stats) — the motif family's C4 entry
    next to triangles / 4-cliques / triads.  SQL-certified against the
    wedge-enumerated codegree closure; brute-force parity in
    tests/test_fourcycles.py."""
    from .graph.metrics import four_cycle_stats

    g = gate_graph()
    return four_cycle_stats(read_layer(g.edges))


@_q("q_temporal_reach")
def q_temporal_reach(sf_dir: str):
    """Time-respecting earliest-arrival reachability from the
    lexicographic-min-url seed (graph/temporal.py::earliest_arrival):
    a link is traversable only if its source page was crawled at or
    after the crawler reached it.  SQL-certified against the recursive
    temporal closure; fixpoint semantics pinned in
    tests/test_temporal.py."""
    from .fixtures import ensure_anchors_parquet, ensure_pages_parquet
    from .graph.temporal import earliest_arrival
    from .ops.join import hash_join

    anchors = rd.read_parquet(ensure_anchors_parquet(_GATE_N, _SEED),
                              columns=["src_url", "dst_url"])
    pages = rd.read_parquet(ensure_pages_parquet(_GATE_N, _SEED),
                            columns=["url", "warc_ts"])
    pages_ts = pages.map_batches(
        lambda b: pa.table({"url": b.column("url"),
                            "ts": b.column("warc_ts").cast(pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)
    a_schema = pa.schema([pa.field("src_url", pa.string()),
                          pa.field("dst_url", pa.string())])
    p_schema = pa.schema([pa.field("url", pa.string()),
                          pa.field("ts", pa.int64())])
    e = hash_join(anchors, pages_ts, on="src_url", right_on="url",
                  right_cols=["ts"], num_parts=DEFAULT.num_parts,
                  left_schema=a_schema, right_schema=p_schema).materialize()
    from .ops.dedup import distinct

    seed_urls = (distinct(e.select_columns(["src_url"]), ["src_url"])
                 .sort("src_url").limit(10).to_pandas()["src_url"])
    arr, _info = earliest_arrival(e, [(s, 0) for s in seed_urls],
                                  src_col="src_url",
                                  dst_col="dst_url", ts_col="ts")
    return arr.map_batches(
        lambda b: pa.table({"url": b.column("v"),
                            "arrival": b.column("arrival")}),
        batch_format="pyarrow", zero_copy_batch=True)


@_q("q_bridges")
def q_bridges(sf_dir: str):
    """Bridge (cut-edge) census of the link graph
    (graph/bridges.py): BFS spanning forest + XOR-tag subtree coverage
    — the parallel replacement for sequential Tarjan low-link; exact
    w.h.p. (63-bit tags).  Rows-only: bridge edges at the url level;
    sequential Tarjan parity pinned in tests/test_bridges.py."""
    from .graph.bridges import bridges
    from .ops.join import hash_join

    g = gate_graph()
    b, _l2, _info = bridges(read_layer(g.edges), g.offsets,
                            f"{g.workdir}/bridges")
    v = read_layer(g.vertices, columns=["url", "vid"])
    b_schema = pa.schema([pa.field("u", pa.int64()),
                          pa.field("v", pa.int64())])
    v_schema = pa.schema([pa.field("url", pa.string()),
                          pa.field("vid", pa.int64())])
    j = hash_join(b, v, on="u", right_on="vid", right_cols=["url"],
                  num_parts=DEFAULT.num_parts, left_schema=b_schema,
                  right_schema=v_schema)
    j = j.map_batches(lambda t: t.rename_columns(["u", "v", "url_u"]),
                      batch_format="pyarrow", zero_copy_batch=True)
    j_schema = pa.schema([pa.field("u", pa.int64()),
                          pa.field("v", pa.int64()),
                          pa.field("url_u", pa.string())])
    j = hash_join(j, v, on="v", right_on="vid", right_cols=["url"],
                  num_parts=DEFAULT.num_parts, left_schema=j_schema,
                  right_schema=v_schema)
    return j.map_batches(
        lambda t: pa.table({"url_u": t.column("url_u"),
                            "url_v": t.column("url")}),
        batch_format="pyarrow", zero_copy_batch=True)


@_q("q_graph_profile")
def q_graph_profile(sf_dir: str):
    """One-row graph profile capstone: the structural summary a user
    reads FIRST on any new crawl — vertex/edge counts, component
    census, triangles, reciprocity, degree assortativity — composed
    entirely from the individually gate-certified operators; every
    float is the same single division of exact ints as its standalone
    oracle (bitwise)."""
    import pandas as pd

    from .graph.components import connected_components
    from .graph.metrics import degree_assortativity, reciprocity
    from .graph.triangles import triangles_edges
    from .ops.agg import grouped_aggregate

    g = gate_graph()
    edges = read_layer(g.edges)
    n_vertices = read_layer(g.vertices, columns=["vid"]).count()
    rec = reciprocity(edges)
    assort = degree_assortativity(edges)
    _per, n_tri = triangles_edges(edges)
    labels, _ = connected_components(
        symmetrize(edges, dedup=False), g.offsets, g.workdir)
    sz = grouped_aggregate(labels.select_columns(["label"]), ["label"],
                           {"n": ("count", None)},
                           num_parts=DEFAULT.num_parts).materialize()
    n_components = sz.count()
    largest = int(sz.max("n"))
    return pd.DataFrame({
        "n_vertices": pd.array([n_vertices], dtype="int64"),
        "n_edges": pd.array([rec["n_edges"]], dtype="int64"),
        "n_components": pd.array([n_components], dtype="int64"),
        "largest_cc": pd.array([largest], dtype="int64"),
        "n_triangles": pd.array([int(n_tri)], dtype="int64"),
        "reciprocity": [rec["reciprocity"]],
        "assortativity": [assort["assortativity"]]})


@_q("q_motif_significance")
def q_motif_significance(sf_dir: str):
    """Triangle significance vs the configuration-model null
    (graph/nullmodel.py): degree-preserving deterministic rewiring,
    then the exact triangle counter on both graphs — is the link
    graph's clustering explained by its degree sequence alone?
    Rows-only; degree-preservation/determinism/clustering-destruction
    pinned in tests/test_nullmodel.py."""
    import pandas as pd

    from .graph.nullmodel import motif_significance

    g = gate_graph()
    sig = motif_significance(read_layer(g.edges))
    return pd.DataFrame({
        "n_triangles": pd.array([sig["n_triangles"]], dtype="int64"),
        "n_triangles_null": pd.array([sig["n_triangles_null"]],
                                     dtype="int64"),
        "ratio": [sig["ratio"]]})


@_q("q_robots_filter")
def q_robots_filter(sf_dir: str):
    """Robots-exclusion admission filter (functions/robots.py, RFC
    9309 longest-match, allow-wins ties) over the crawled page table
    with a deterministic synthetic rule set (every host: disallow
    /p/1, allow /p/12, disallow /x/) — which urls SHOULD the crawler
    have fetched?  SQL-certified vs a starts_with + window-rank
    oracle; rule semantics pinned in tests/test_robots.py."""
    import ray

    from .functions.robots import robots_decide, split_host_path

    pages = rd.read_parquet(ensure_pages_parquet(_GATE_N, _SEED),
                            columns=["url"]).materialize()
    host_pdf = pages.map_batches(
        lambda b: pa.table({"host": pa.array(sorted(set(
            split_host_path(np.asarray(b.column("url").to_pylist(),
                                       dtype=object))[0].tolist())),
            type=pa.string())}),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    hosts = sorted(set(host_pdf["host"]))
    rules = {h: [("/p/1", False), ("/p/12", True), ("/x/", False)]
             for h in hosts}
    return robots_decide(pages, ray.put(rules))


@_q("q_crawl_budget")
def q_crawl_budget(sf_dir: str):
    """Crawl-budget apportionment: allocate 10,000 fetch slots across
    hosts proportional to page counts by the largest-remainder
    (Hamilton) method — the deterministic quota planner a recrawl
    scheduler runs.  One grouped host count (host dimension is
    bounded); the apportionment finish is driver-side closed-form.
    SQL-certified vs a floor + remainder-rank oracle."""
    import pandas as pd

    from .functions.robots import split_host_path
    from .ops.agg import grouped_aggregate

    pages = rd.read_parquet(ensure_pages_parquet(_GATE_N, _SEED),
                            columns=["url"])

    def hostify(b: pa.Table) -> pa.Table:
        h, _p = split_host_path(np.asarray(
            b.column("url").to_pylist(), dtype=object))
        return pa.table({"host": pa.array(h.tolist(),
                                          type=pa.string())})

    cnt = grouped_aggregate(
        pages.map_batches(hostify, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["host"], {"n_pages": ("count", None)}).to_pandas()
    total = int(cnt["n_pages"].sum())
    budget = 10000
    exact = cnt["n_pages"].to_numpy() * budget / total
    floor_ = np.floor(exact).astype(np.int64)
    rem = exact - floor_
    leftover = budget - int(floor_.sum())
    # largest remainders win the leftover slots; ties -> host asc
    order = np.lexsort((cnt["host"].to_numpy(), -rem))
    quota = floor_.copy()
    quota[order[:leftover]] += 1
    out = pd.DataFrame({"host": cnt["host"],
                        "n_pages": cnt["n_pages"].astype("int64"),
                        "quota": quota})
    return out.sort_values("host").reset_index(drop=True)
