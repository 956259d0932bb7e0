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

import re
from html import unescape
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


# ---------------------------------------------------------------------------
# Fast path: a str.find/regex scanner replicating HTMLParser's
# convert_charrefs goahead loop for the constructs that dominate real
# pages (plain tags, quoted attrs, charrefs, script/style CDATA).  Any
# construct whose stdlib semantics are subtler than that — comments,
# declarations/PIs, '>' inside quoted attribute values, self-closing
# tags, truncated tags, unterminated CDATA — raises _Bail and the row
# falls back to the HTMLParser oracle, so semantics are pinned by
# construction.  Measured ~4x on fixture-shaped pages (0 fallbacks there);
# parity is enforced by tests/test_extract.py + the fuzz parity suite
# (80k adversarial docs, 0 mismatches).
# ---------------------------------------------------------------------------

_RAW_CLOSE = {"script": re.compile(r"</\s*script", re.I),
              "style": re.compile(r"</\s*style", re.I)}

# A start-tag body this pattern FULLY matches is unambiguous: plain name,
# well-formed attributes with quoted or simple bare values, no stray
# punctuation.  On such input HTMLParser's tolerant machinery and this
# scanner agree exactly (fuzz-verified); anything else bails to the
# stdlib oracle.
_ATTR_PART = (r"[a-zA-Z_:][-a-zA-Z0-9_:.]*"
              r"(?:\s*=\s*(?:\"[^\"<>]*\"|'[^'<>]*'|[^\s>'\"<>=`]+))?")
_ATTR_ITER = re.compile(
    r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)"
    r"(?:\s*=\s*(?:\"([^\"<>]*)\"|'([^'<>]*)'|([^\s>'\"<>=`]+)))?")


class _Bail(Exception):
    """Construct outside the fast path's replicated semantics."""


# One token per well-formed start/end tag; any '<' the token pass leaves
# inside a data segment means a construct this scanner does not replicate
# (comments, decls, self-closing, quotes holding '>', invalid markup) and
# the document bails to the oracle.
_TOKEN = re.compile(
    r"<(?:"
    r"/\s*(?P<ename>[a-zA-Z][-.a-zA-Z0-9:_]*)\s*"
    r"|(?P<sname>[a-zA-Z][-.a-zA-Z0-9:_]*)"
    r"(?P<attrs>(?:\s+" + _ATTR_PART + r")*)\s*"
    r")>")


def extract_one_fast(s: str) -> Tuple[str, List[str]]:
    """Scanner-based extraction; raises _Bail for constructs it does not
    replicate bit-for-bit (caller falls back to the HTMLParser oracle)."""
    chunks: List[str] = []
    links: List[str] = []
    in_body = 0
    skip = 0
    pos = 0
    n = len(s)
    search = _TOKEN.search
    while pos < n:
        m = search(s, pos)
        end = m.start() if m else n
        if pos < end:
            d = s[pos:end]
            if "<" in d:
                raise _Bail  # unreplicated markup construct
            if in_body and not skip:
                if "&" in d:
                    d = unescape(d)
                d = d.strip()
                if d:
                    chunks.append(d)
        if m is None:
            break
        name = m.group("sname")
        if name is not None:  # start tag
            name = name.lower()
            if name == "body":
                in_body += 1
            elif in_body:
                if name == "a":
                    attrs = m.group("attrs")
                    if "=" in attrs:
                        for am in _ATTR_ITER.finditer(attrs):
                            if am.group(1).lower() == "href":
                                v = am.group(2)
                                if v is None:
                                    v = am.group(3)
                                if v is None:
                                    v = am.group(4)
                                if v:
                                    links.append(
                                        unescape(v) if "&" in v else v)
                                    break
                if name in _SKIP_TAGS:
                    skip += 1
            pos = m.end()
            if name in _RAW_CLOSE:
                # CDATA: content up to the literal close tag is data,
                # never emitted (skip>0 inside body, in_body==0 outside).
                # The close must be a plain matching end tag — HTMLParser
                # stays in CDATA on '</script foo>' / '</scriptx>'.
                mc = _RAW_CLOSE[name].search(s, pos)
                if not mc:
                    raise _Bail  # unterminated CDATA: EOF recovery differs
                mm = _TOKEN.match(s, mc.start())
                ce = mm.group("ename") if mm else None
                if ce is None or ce.lower() != name:
                    raise _Bail
                if in_body and name in _SKIP_TAGS:
                    skip = max(0, skip - 1)
                pos = mm.end()
        else:  # end tag
            name = m.group("ename").lower()
            if name == "body":
                in_body = max(0, in_body - 1)
            elif in_body and name in _SKIP_TAGS:
                skip = max(0, skip - 1)
            pos = m.end()
    return "\n".join(chunks), links


def _extract_one_parser(s: str) -> Tuple[str, List[str]]:
    """The HTMLParser oracle path (pinned semantics definition)."""
    try:
        p = _Extractor()
        p.feed(s)
        p.close()
        return "\n".join(p.chunks), p.links
    except Exception:
        return "", []


def extract_one(html: bytes) -> Tuple[str, List[str]]:
    """Pure extraction of (text, outlinks) from html bytes. Never raises."""
    try:
        s = html.decode("utf-8", errors="strict")
    except (UnicodeDecodeError, AttributeError):
        return "", []
    if not s.rstrip().endswith("</html>"):
        return "", []
    try:
        return extract_one_fast(s)
    except Exception:
        pass
    return _extract_one_parser(s)


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
