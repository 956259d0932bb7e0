"""HTML link + text extraction — the engine's flagship per-row UDF.

This is the web-page analogue of the reference's GROBID-XML citation
extractor (reference link_prediction_metadata.py:128-156 `_get_citations`,
helpers.py:223-249 `str_to_xml`): a *pure function of the payload bytes*
with pinned parsing rules and the same error-tolerance semantics — a
malformed document yields an empty result and never fails the job
(reference swallows per-row exceptions at link_prediction_metadata.py:150-155,177-191).

Pinned extraction semantics (the byte-identity invariant of
BASELINE.json's input_hint — fixture `text` columns are generated against
exactly these rules):

1. `html` bytes MUST decode as strict UTF-8 and, after trailing
   whitespace strip, end with ``</html>``; otherwise the document is
   malformed -> ``("", [])``.
2. Outlinks are the ``href`` attribute values of ``<a>`` tags inside
   ``<body>``, in document order, duplicates preserved, empty hrefs
   skipped.
3. Text is the concatenation of character-data chunks inside ``<body>``
   that are NOT inside ``<a>``, ``<script>`` or ``<style>``; each chunk
   is stripped, empty chunks dropped, chunks joined with ``"\\n"``.
4. Any parser exception -> ``("", [])``.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List, Tuple

import pyarrow as pa

_SKIP_TAGS = {"a", "script", "style"}


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.in_body = 0
        self.skip = 0
        self.chunks: List[str] = []
        self.links: List[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "body":
            self.in_body += 1
            return
        if self.in_body:
            if tag == "a":
                href = next((v for k, v in attrs if k == "href" and v), None)
                if href:
                    self.links.append(href)
            if tag in _SKIP_TAGS:
                self.skip += 1

    def handle_endtag(self, tag):
        if tag == "body":
            self.in_body = max(0, self.in_body - 1)
        elif self.in_body and tag in _SKIP_TAGS:
            self.skip = max(0, self.skip - 1)

    def handle_data(self, data):
        if self.in_body and not self.skip:
            d = data.strip()
            if d:
                self.chunks.append(d)


def extract_one(html: bytes) -> Tuple[str, List[str]]:
    """Pure extraction of (text, outlinks) from html bytes. Never raises."""
    try:
        s = html.decode("utf-8", errors="strict")
    except (UnicodeDecodeError, AttributeError):
        return "", []
    if not s.rstrip().endswith("</html>"):
        return "", []
    try:
        p = _Extractor()
        p.feed(s)
        p.close()
        return "\n".join(p.chunks), p.links
    except Exception:
        return "", []


def extract_batch(batch: pa.Table) -> pa.Table:
    """map_batches UDF: pages(url, html, ...) -> (url, text, links).

    One output row per input row; ``links`` is a list<string> column
    (exploded downstream by ops/explode.py).  The per-row Python parse is
    unavoidable (stdlib HTMLParser is the extractor definition); the Arrow
    assembly around it is columnar and the stage scales by `concurrency`.
    """
    urls = batch.column("url")
    htmls = batch.column("html").to_pylist()
    texts: List[str] = []
    links: List[List[str]] = []
    for h in htmls:
        t, ls = extract_one(h)
        texts.append(t)
        links.append(ls)
    return pa.table(
        {
            "url": urls,
            "text": pa.array(texts, type=pa.large_string()),
            "links": pa.array(links, type=pa.list_(pa.string())),
        }
    )
