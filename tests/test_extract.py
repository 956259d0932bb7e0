"""Extractor byte-identity + tolerance semantics (the input_hint
invariant; reference error tolerance link_prediction_metadata.py:150-155)."""

import pyarrow as pa

from halvesting_geometric_ray.fixtures import build_corpus, corpus_to_table
from halvesting_geometric_ray.functions.extract import extract_batch, extract_one


def test_extract_byte_identity_tiny(tiny_corpus):
    c = tiny_corpus
    t = corpus_to_table(c)
    htmls = t.column("html").to_pylist()
    for i in range(c.n_pages):
        text, links = extract_one(htmls[i])
        assert text == c.texts[i]
        if c.malformed[i]:
            assert links == []
        else:
            assert links == c.anchors[i]


def test_extract_batch_matches_oracle_column(small_corpus):
    c = small_corpus
    t = corpus_to_table(c)
    out = extract_batch(t)
    assert out.column("text").to_pylist() == t.column("text").to_pylist()


def test_malformed_inputs_never_fail():
    cases = [b"", b"\xff\xfe garbage", b"<html><body><p>x</p>",
             b"<html><body></html>", b"not html at all</html>"]
    for h in cases:
        text, links = extract_one(h)
        assert isinstance(text, str) and isinstance(links, list)
    # truncated -> empty
    assert extract_one(b"<html><body><p>x</p>") == ("", [])


def test_anchor_text_excluded_and_order_preserved():
    h = (b"<html><head><title>T</title></head><body><p>A</p>"
         b'<a href="u1">skip</a><p>B</p><a href="u2">skip</a>'
         b"<script>var x=1;</script></body></html>")
    text, links = extract_one(h)
    assert text == "A\nB"
    assert links == ["u1", "u2"]


def test_duplicate_anchors_preserved():
    h = b'<html><body><a href="u">l</a><a href="u">l</a></body></html>'
    assert extract_one(h)[1] == ["u", "u"]
