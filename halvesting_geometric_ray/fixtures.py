"""Deterministic synthetic web-page corpus (FIXTURES.md section 1-3).

Generates the `pages` Parquet table of BASELINE.json's input_hint shape:
``(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string)`` whose html embeds ``<a href>`` anchors drawn from a seeded
preferential-attachment graph (power-law degrees -> guaranteed hubs at
every scale), plus:

- 5% of anchors point to EXTERNAL urls not in pages (tests vertex
  union/dedup; reference analogue: cited papers absent from HAL,
  link_prediction_metadata.py:308-319);
- duplicate anchors on some pages (tests exact edge dedup, D1 —
  reference drop_duplicates, link_prediction_metadata.py:228,250-252);
- isolated pages (singleton components);
- 3 disjoint planted 5-cliques (known triangle counts / components);
- 2% malformed rows (truncated html bytes) -> extractor must yield empty
  text + no outlinks, never fail (tolerance semantics of
  link_prediction_metadata.py:150-155,177-191).

The `text` column IS the extraction oracle: it is what
functions/extract.py must reproduce byte-for-byte.  Everything is a pure
function of (n_core, seed); parquet output is cached under /tmp.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FIXTURE_ROOT = os.environ.get("HGR_FIXTURE_ROOT", "/tmp/hgr_fixtures")

_LANGS = ["en", "fr", "de", "es"]
_LANG_SENTENCES = {
    "en": "The quick brown fox jumps over the lazy dog and the cat.",
    "fr": "Le renard brun saute par dessus le chien et le chat paresseux.",
    "de": "Der schnelle braune Fuchs springt über den faulen Hund und die Katze.",
    "es": "El rápido zorro marrón salta sobre el perro perezoso y el gato.",
}

_EPOCH_US = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")


def page_url(i: int, n_hosts: int) -> str:
    return f"https://host{i % n_hosts}.example/p/{i}"


def external_url(j: int) -> str:
    return f"https://ext{j}.example/x/{j}"


@dataclass
class PageCorpus:
    """In-memory truth for a generated corpus."""

    n_core: int
    seed: int
    n_hosts: int
    urls: List[str]                      # all page urls, row order
    langs: List[str]
    texts: List[str]                     # oracle extraction per row ("" if malformed)
    malformed: np.ndarray                # bool per row
    # raw anchors per row as authored (including anchors on malformed pages)
    anchors: List[List[str]]
    # expected outlinks (well-formed pages only), duplicates preserved
    outlinks: List[Tuple[str, str]] = field(repr=False, default_factory=list)

    @property
    def n_pages(self) -> int:
        return len(self.urls)

    def expected_vertex_urls(self) -> List[str]:
        s = set(self.urls)
        s.update(d for _, d in self.outlinks)
        return sorted(s)

    def expected_edge_set(self) -> set:
        return set(self.outlinks)


def _ba_edges(n: int, m: int, rng: np.random.Generator) -> List[List[int]]:
    """Preferential-attachment out-link lists (node i links to < i)."""
    targets: List[List[int]] = [[] for _ in range(n)]
    pool: List[int] = [0]  # endpoint multiset; node 0 starts in the pool
    for i in range(1, n):
        k = min(m, i)
        chosen: set = set()
        # preferential draw with replacement from the endpoint pool,
        # retrying to get k distinct targets (standard BA construction)
        tries = 0
        while len(chosen) < k and tries < 20 * k:
            j = pool[int(rng.integers(0, len(pool)))]
            chosen.add(j)
            tries += 1
        while len(chosen) < k:  # fallback: uniform fill (tiny graphs)
            chosen.add(int(rng.integers(0, i)))
        ts = sorted(chosen)
        targets[i] = ts
        pool.extend(ts)
        pool.extend([i] * len(ts))
    return targets


def build_corpus(n_core: int, seed: int = 42) -> PageCorpus:
    rng = np.random.default_rng(seed)
    n_hosts = max(4, n_core // 50)
    n_iso = max(2, n_core // 100)
    n_ext = max(3, n_core // 20)

    ba = _ba_edges(n_core, 3, rng)

    urls: List[str] = []
    anchors: List[List[str]] = []

    # core BA pages
    for i in range(n_core):
        urls.append(page_url(i, n_hosts))
        links = [page_url(j, n_hosts) for j in ba[i]]
        if i % 20 == 3:  # ~5% external anchor
            links.append(external_url(i % n_ext))
        if i % 10 == 0 and links:  # duplicate anchor
            links.append(links[0])
        anchors.append(links)

    # isolated pages (no in/out anchors; BA never targets them)
    for i in range(n_core, n_core + n_iso):
        urls.append(page_url(i, n_hosts))
        anchors.append([])

    # 3 planted 5-cliques (each page links to the other 4)
    for c in range(3):
        base = n_core + n_iso + c * 5
        members = [page_url(base + t, n_hosts) for t in range(5)]
        for t in range(5):
            urls.append(members[t])
            anchors.append([u for u in members if u != members[t]])

    n_pages = len(urls)
    malformed = np.zeros(n_pages, dtype=bool)
    malformed[np.arange(n_pages) % 50 == 7] = True

    langs = [_LANGS[i % 4] for i in range(n_pages)]
    texts: List[str] = []
    outlinks: List[Tuple[str, str]] = []
    for i in range(n_pages):
        body_text = f"{_LANG_SENTENCES[langs[i]]} Page {i} of host {i % n_hosts}."
        if malformed[i]:
            texts.append("")
        else:
            texts.append(body_text)
            outlinks.extend((urls[i], d) for d in anchors[i])
    return PageCorpus(
        n_core=n_core,
        seed=seed,
        n_hosts=n_hosts,
        urls=urls,
        langs=langs,
        texts=texts,
        malformed=malformed,
        anchors=anchors,
        outlinks=outlinks,
    )


def _render_html(i: int, lang: str, n_hosts: int, anchors: List[str]) -> bytes:
    body_text = f"{_LANG_SENTENCES[lang]} Page {i} of host {i % n_hosts}."
    a = "".join(f'<a href="{u}">l</a>' for u in anchors)
    html = (
        f"<html><head><title>Page {i}</title>"
        f'<style>p {{margin: 0}}</style></head>'
        f"<body><p>{body_text}</p>{a}</body></html>"
    )
    return html.encode("utf-8")


def corpus_to_table(c: PageCorpus) -> pa.Table:
    htmls: List[bytes] = []
    for i in range(c.n_pages):
        h = _render_html(i, c.langs[i], c.n_hosts, c.anchors[i])
        if c.malformed[i]:
            h = h[: max(1, len(h) // 2)]  # truncated bytes -> malformed
        htmls.append(h)
    ts = pa.array(_EPOCH_US + np.arange(c.n_pages, dtype="int64") * 97_000_000,
                  type=pa.timestamp("us"))
    return pa.table(
        {
            "url": pa.array(c.urls, type=pa.string()),
            "warc_ts": ts,
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(c.texts, type=pa.string()),
            "lang": pa.array(c.langs, type=pa.string()),
        }
    )


def pages_dir(n_core: int, seed: int = 42) -> str:
    return os.path.join(FIXTURE_ROOT, f"pages_n{n_core}_seed{seed}")


def ensure_pages_parquet(n_core: int, seed: int = 42, shards: int = 8) -> str:
    """Generate (once) and return the fixture pages parquet directory.

    Written as multiple row-grouped files so ray.data reads it in
    parallel blocks even at small scale.
    """
    d = pages_dir(n_core, seed)
    done = os.path.join(d, "_SUCCESS")
    if os.path.exists(done):
        return d
    c = build_corpus(n_core, seed)
    tbl = corpus_to_table(c)
    tmp = d + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    n = tbl.num_rows
    k = min(shards, max(1, n // 64))
    bounds = np.linspace(0, n, k + 1).astype(int)
    for s in range(k):
        pq.write_table(tbl.slice(bounds[s], bounds[s + 1] - bounds[s]),
                       os.path.join(tmp, f"part-{s:05d}.parquet"))
    os.makedirs(os.path.dirname(d), exist_ok=True)
    if os.path.exists(d):
        import shutil
        shutil.rmtree(d)
    os.replace(tmp, d)
    with open(done, "w") as f:
        f.write("ok")
    return d


def anchors_path(n_core: int, seed: int = 42) -> str:
    return os.path.join(FIXTURE_ROOT, f"anchors_n{n_core}_seed{seed}.parquet")


def ensure_anchors_parquet(n_core: int, seed: int = 42) -> str:
    """Write (once) the corpus TRUTH anchor table (src_url, dst_url), one
    row per authored anchor on a well-formed page, duplicates preserved —
    the independent oracle for extraction/graph queries (the same
    authored truth the html and text columns are rendered from), readable
    by DuckDB for SQL oracles."""
    path = anchors_path(n_core, seed)
    if os.path.exists(path):
        return path
    c = build_corpus(n_core, seed)
    src = [s for s, _ in c.outlinks]
    dst = [d for _, d in c.outlinks]
    t = pa.table({"src_url": pa.array(src, type=pa.string()),
                  "dst_url": pa.array(dst, type=pa.string())})
    os.makedirs(FIXTURE_ROOT, exist_ok=True)
    tmp = f"{path}.tmp{os.getpid()}"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return path


# ---------------------------------------------------------------------------
# Reference-shaped metadata fixture (FIXTURES.md section 4): the nested
# document-metadata rows consumed by the reference at build_metadata.py:58-68,
# including the edge cases its pipeline filters: halauthorid == "0"
# (link_prediction_metadata.py:237,392), empty titles (:384), dotted
# domains ("cs.AI" -> "cs", :452-470), duplicate (title, year) pairs (:316).
# ---------------------------------------------------------------------------

_DOMAIN_POOL = ["cs.AI", "cs.DB", "math.CO", "math", "phys.GR", "bio", "chem.OC"]
_META_LANGS = ["en", "fr", "de"]


def build_meta_rows(n: int, seed: int = 42) -> List[dict]:
    rng = np.random.default_rng(seed)
    n_authors = max(5, n // 3)
    n_affil = max(3, n // 6)
    rows = []
    for i in range(n):
        n_auth = int(rng.integers(1, 4))
        authors = []
        for _ in range(n_auth):
            aid = int(rng.integers(1, n_authors + 1))
            if rng.random() < 0.05:
                aid = 0  # filtered by the pipeline
            n_aff = int(rng.integers(0, 3))
            affs = [f"lab{int(rng.integers(0, n_affil))}" for _ in range(n_aff)]
            authors.append({"name": f"author {aid}" if aid else "",
                            "halauthorid": str(aid),
                            "affiliations": affs})
        title = f"Paper number {i}"
        if i % 40 == 13:
            title = ""  # filtered
        if i % 25 == 7 and i > 25:
            title = f"Paper number {i - 25}"  # duplicate (title, year) pair
        doms = list({str(_DOMAIN_POOL[int(rng.integers(0, len(_DOMAIN_POOL)))])
                     for _ in range(int(rng.integers(1, 3)))})
        rows.append({
            "halid": f"hal-{i:06d}",
            "title": title,
            "lang": _META_LANGS[i % 3],
            "year": str(2000 + i % 25),
            "domain": doms,
            "authors": authors,
        })
    return rows


def ensure_meta_jsonl(n: int, seed: int = 42) -> str:
    import json

    d = os.path.join(FIXTURE_ROOT, f"meta_n{n}_seed{seed}")
    done = os.path.join(d, "_SUCCESS")
    if os.path.exists(done):
        return d
    rows = build_meta_rows(n, seed)
    tmp = d + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    k = min(4, max(1, n // 50))
    bounds = np.linspace(0, n, k + 1).astype(int)
    for s in range(k):
        with open(os.path.join(tmp, f"part-{s:04d}.jsonl"), "w") as f:
            for r in rows[bounds[s]:bounds[s + 1]]:
                f.write(json.dumps(r) + "\n")
    if os.path.exists(d):
        import shutil
        shutil.rmtree(d)
    os.replace(tmp, d)
    with open(done, "w") as f:
        f.write("ok")
    return d


# ---------------------------------------------------------------------------
# Direct edge-table fixture for iteration-throughput benchmarking: a skewed
# (src ~ quadratic-density toward low vids -> hub partitions) random edge
# table big enough that PageRank rounds are compute-bound rather than
# latency-bound.  Used by bench.py --scaling; correctness of the iteration
# engine is covered by the page-corpus tests, this fixture only sizes it.
# ---------------------------------------------------------------------------


def ensure_edges_parquet(n_edges: int, n_vertices: int, seed: int = 99,
                         files: int = 32) -> str:
    d = os.path.join(FIXTURE_ROOT, f"edges_e{n_edges}_v{n_vertices}_seed{seed}")
    done = os.path.join(d, "_SUCCESS")
    if os.path.exists(done):
        return d
    tmp = d + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    rng = np.random.default_rng(seed)
    per = n_edges // files
    for f_i in range(files):
        n = per if f_i < files - 1 else n_edges - per * (files - 1)
        u = rng.random(n)
        src = (n_vertices * u * u).astype(np.int64)
        dst = rng.integers(0, n_vertices, size=n, dtype=np.int64)
        t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
        pq.write_table(t, os.path.join(tmp, f"part-{f_i:05d}.parquet"))
    if os.path.exists(d):
        import shutil
        shutil.rmtree(d)
    os.replace(tmp, d)
    with open(done, "w") as f:
        f.write("ok")
    return d


def even_offsets(n_vertices: int, num_parts: int) -> np.ndarray:
    return np.linspace(0, n_vertices, num_parts + 1).astype(np.int64)


# ---------------------------------------------------------------------------
# Realistically-sized page fixture for throughput/scaling benchmarks.
# The graph-correctness corpus above uses ~300-byte pages (fast tests);
# real Common-Crawl payloads are tens of KB, where per-document parsing —
# the reference's core compute (citation extraction,
# link_prediction_metadata.py:128-156) — dominates.  ~35 KB pages built
# from a seeded paragraph pool (cheap to generate, full cost to parse).
# ---------------------------------------------------------------------------


def _para_pool(seed: int, n_paras: int = 64, words_per: int = 110):
    rng = np.random.default_rng(seed)
    pool = [f"word{i}" for i in range(500)]
    paras = []
    for _ in range(n_paras):
        idx = rng.integers(0, len(pool), size=words_per)
        text = " ".join(pool[i] for i in idx)
        paras.append((f"<p>{text}</p>", text))
    return paras


def ensure_heavy_pages_parquet(n: int, seed: int = 777, paras_per_page: int = 60,
                               links_per_page: int = 25,
                               rows_per_file: int = 4000) -> str:
    d = os.path.join(FIXTURE_ROOT, f"heavy_n{n}_seed{seed}")
    done = os.path.join(d, "_SUCCESS")
    if os.path.exists(done):
        return d
    tmp = d + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    pool = _para_pool(seed)
    rng = np.random.default_rng(seed + 1)
    n_hosts = max(16, n // 1000)
    f_i = 0
    for start in range(0, n, rows_per_file):
        stop = min(start + rows_per_file, n)
        urls, htmls, texts, langs = [], [], [], []
        count = stop - start
        para_idx = rng.integers(0, len(pool), size=(count, paras_per_page))
        link_idx = rng.integers(0, n, size=(count, links_per_page))
        for r in range(count):
            i = start + r
            url = page_url(i, n_hosts)
            head = f"<p>page {i} unique lead paragraph.</p>"
            body = head + "".join(pool[j][0] for j in para_idx[r])
            anchors = "".join(
                f'<a href="{page_url(int(t), n_hosts)}">l</a>'
                for t in link_idx[r])
            html = (f"<html><head><title>Page {i}</title></head>"
                    f"<body>{body}{anchors}</body></html>")
            urls.append(url)
            htmls.append(html.encode("utf-8"))
            texts.append("\n".join([f"page {i} unique lead paragraph."]
                                   + [pool[j][1] for j in para_idx[r]]))
            langs.append(_LANGS[i % 4])
        ts = pa.array(_EPOCH_US + np.arange(start, stop, dtype="int64") * 97_000_000,
                      type=pa.timestamp("us"))
        t = pa.table({"url": pa.array(urls, type=pa.string()),
                      "warc_ts": ts,
                      "html": pa.array(htmls, type=pa.binary()),
                      "text": pa.array(texts, type=pa.string()),
                      "lang": pa.array(langs, type=pa.string())})
        pq.write_table(t, os.path.join(tmp, f"part-{f_i:05d}.parquet"))
        f_i += 1
    if os.path.exists(d):
        import shutil
        shutil.rmtree(d)
    os.replace(tmp, d)
    with open(done, "w") as f:
        f.write("ok")
    return d


def ensure_embeddings_parquet(n_vecs: int, dim: int = 64, seed: int = 7,
                              files: int = 32, centers: int = 256) -> str:
    """Synthetic embeddings table (vec_id:int64, embedding
    fixed_size_list<double>[dim]) — clustered Gaussians so ANN/k-means
    ladder runs exercise realistic structure.  Cached like the edge
    fixture."""
    d = os.path.join(FIXTURE_ROOT, f"emb_n{n_vecs}_d{dim}_seed{seed}")
    done = os.path.join(d, "_SUCCESS")
    if os.path.exists(done):
        return d
    tmp = d + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    rng = np.random.default_rng(seed)
    mu = rng.normal(0.0, 4.0, (centers, dim))
    per = n_vecs // files
    for f_i in range(files):
        n = per if f_i < files - 1 else n_vecs - per * (files - 1)
        lo = f_i * per
        x = (mu[rng.integers(0, centers, n)] +
             rng.normal(0.0, 1.0, (n, dim)))
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(x.ravel(), type=pa.float64()), dim)
        t = pa.table({"vec_id": pa.array(np.arange(lo, lo + n,
                                                   dtype=np.int64)),
                      "embedding": arr})
        pq.write_table(t, os.path.join(tmp, f"part-{f_i:05d}.parquet"))
    if os.path.exists(d):
        import shutil
        shutil.rmtree(d)
    os.replace(tmp, d)
    with open(done, "w") as f:
        f.write("ok")
    return d
