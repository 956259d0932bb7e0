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
