"""Reference-parity metadata pipeline vs an independent pandas oracle —
the explode/filter/join/dedup/zip-index semantics of the reference's
compute_nodes/compute_edges, reference-style golden-count checks
(link_prediction_dataset.py:50-75 analogue)."""

import pandas as pd
import pytest

from halvesting_geometric_ray.fixtures import build_meta_rows, ensure_meta_jsonl
from halvesting_geometric_ray.pipelines.metadata import build_metadata_graph

N = 200
SEED = 42


def _oracle(rows, langs=None):
    if langs:
        rows = [r for r in rows if r["lang"] in langs]
    papers = sorted({r["halid"] for r in rows if r["title"] != ""})
    paper_idx = {h: i for i, h in enumerate(papers)}
    authors = sorted({int(a["halauthorid"]) for r in rows for a in r["authors"]
                      if int(a["halauthorid"]) != 0 and a["name"] != ""})
    author_idx = {a: i for i, a in enumerate(authors)}
    affs = sorted({aff for r in rows for a in r["authors"]
                   if int(a["halauthorid"]) != 0
                   for aff in a["affiliations"] if aff != ""})
    aff_idx = {a: i for i, a in enumerate(affs)}
    doms = sorted({(d.split(".")[0] or "other") for r in rows for d in r["domain"]})
    dom_idx = {d: i for i, d in enumerate(doms)}

    writes = set()
    affiliated = set()
    topics = set()
    for r in rows:
        for a in r["authors"]:
            aid = int(a["halauthorid"])
            if aid == 0:
                continue
            if r["halid"] in paper_idx and aid in author_idx:
                writes.add((author_idx[aid], paper_idx[r["halid"]]))
            for aff in a["affiliations"]:
                if aff != "" and aid in author_idx:
                    affiliated.add((author_idx[aid], aff_idx[aff]))
        for d in r["domain"]:
            d0 = d.split(".")[0] or "other"
            if r["halid"] in paper_idx:
                topics.add((paper_idx[r["halid"]], dom_idx[d0]))
    return {"papers": papers, "authors": authors, "affiliations": affs,
            "domains": doms, "writes": writes, "affiliated_with": affiliated,
            "has_topic": topics}


@pytest.fixture(scope="module")
def meta_graph(tmp_path_factory):
    path = ensure_meta_jsonl(N, SEED)
    wd = str(tmp_path_factory.mktemp("metagraph"))
    return build_metadata_graph(path, wd, langs=["en", "fr"])


@pytest.fixture(scope="module")
def oracle():
    return _oracle(build_meta_rows(N, SEED), langs=["en", "fr"])


def test_node_tables(meta_graph, oracle):
    papers = meta_graph["papers"].to_pandas().sort_values("paper_idx")
    assert list(papers.halid) == oracle["papers"]
    assert list(papers.paper_idx) == list(range(len(oracle["papers"])))

    authors = meta_graph["authors"].to_pandas().sort_values("author_idx")
    assert list(authors.halauthorid) == oracle["authors"]

    affs = meta_graph["affiliations"].to_pandas().sort_values("affiliation_idx")
    assert list(affs.affiliation) == oracle["affiliations"]

    doms = meta_graph["domains"].to_pandas().sort_values("domain_idx")
    assert list(doms.domain) == oracle["domains"]


def test_edge_tables(meta_graph, oracle):
    writes = meta_graph["writes"].to_pandas()
    assert set(zip(writes.author_idx, writes.paper_idx)) == oracle["writes"]
    assert len(writes) == len(oracle["writes"])  # exact dedup

    aw = meta_graph["affiliated_with"].to_pandas()
    assert set(zip(aw.author_idx, aw.affiliation_idx)) == oracle["affiliated_with"]

    ht = meta_graph["has_topic"].to_pandas()
    assert set(zip(ht.paper_idx, ht.domain_idx)) == oracle["has_topic"]


def test_hash_id_mode_isomorphic(tmp_path_factory, oracle):
    """id_mode='hash' (the scale path) yields the same graph up to a
    paper-id relabeling: identical node/edge counts, dense 0..N-1 paper
    ids, and identical (halid -> author) edge structure."""
    path = ensure_meta_jsonl(N, SEED)
    wd = str(tmp_path_factory.mktemp("metagraph_hash"))
    g = build_metadata_graph(path, wd, langs=["en", "fr"], id_mode="hash")

    papers = g["papers"].to_pandas()
    assert sorted(papers.halid) == oracle["papers"]
    assert sorted(papers.paper_idx) == list(range(len(oracle["papers"])))

    writes = g["writes"].to_pandas()
    assert len(writes) == len(oracle["writes"])
    # relabel via the halid<->paper_idx bijection and compare structure
    idx2hal = dict(zip(papers.paper_idx, papers.halid))
    srt = sorted(oracle["papers"])
    hal2ref = {h: i for i, h in enumerate(srt)}
    relabeled = {(a, hal2ref[idx2hal[p]])
                 for a, p in zip(writes.author_idx, writes.paper_idx)}
    assert relabeled == oracle["writes"]

    ht = g["has_topic"].to_pandas()
    relabeled_ht = {(hal2ref[idx2hal[p]], d)
                    for p, d in zip(ht.paper_idx, ht.domain_idx)}
    assert relabeled_ht == oracle["has_topic"]


def test_domain_split_and_filters(meta_graph):
    doms = meta_graph["domains"].to_pandas()
    assert not doms.domain.str.contains(r"\.").any()  # "cs.AI" -> "cs"
    authors = meta_graph["authors"].to_pandas()
    assert (authors.halauthorid != 0).all()
    papers = meta_graph["papers"].to_pandas()
    assert (papers.title != "").all()
    assert set(papers.lang) <= {"en", "fr"}
