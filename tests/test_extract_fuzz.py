"""Extractor tolerance under adversarial bytes (hypothesis fuzz) —
the never-fail invariant of link_prediction_metadata.py:150-155 — plus
fast-scanner vs HTMLParser-oracle parity: whenever the fast path does
NOT bail, its output must be bit-identical to the stdlib parser's."""

from hypothesis import given, settings, strategies as st

from halvesting_geometric_ray.functions.extract import (
    _Bail, _extract_one_parser, extract_one, extract_one_fast)


def _assert_fast_parity(s: str):
    try:
        fast = extract_one_fast(s)
    except _Bail:
        return  # fell back — oracle path used, trivially correct
    except Exception:
        return  # extract_one falls back on any fast-path error
    assert fast == _extract_one_parser(s)


_MARKUPISH = st.text(
    alphabet="<>/ab &;\"'=x-!?\n\tscriptoledybmh", max_size=200)


@settings(max_examples=500, deadline=None)
@given(_MARKUPISH)
def test_fast_parity_markup_soup(s):
    _assert_fast_parity(f"<html><body>{s}</body></html>")


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=300))
def test_fast_parity_arbitrary_text(s):
    _assert_fast_parity(f"<html><body>{s}</body></html>")


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(alphabet="ab\"'&<>=; x", max_size=20), max_size=6))
def test_fast_parity_attr_soup(parts):
    tags = "".join(f"<a {p}>t</a>" for p in parts)
    _assert_fast_parity(f"<html><body>{tags}</body></html>")


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=2048))
def test_extract_never_raises_on_bytes(data):
    text, links = extract_one(data)
    assert isinstance(text, str)
    assert isinstance(links, list)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=1024))
def test_extract_never_raises_on_textish_html(s):
    html = f"<html><body>{s}</body></html>".encode("utf-8", errors="ignore")
    text, links = extract_one(html)
    assert isinstance(text, str) and isinstance(links, list)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet="abcdefghij:/.-", min_size=1, max_size=30),
                max_size=8))
def test_extract_link_order_and_count(hrefs):
    anchors = "".join(f'<a href="{h}">x</a>' for h in hrefs)
    html = f"<html><body>{anchors}</body></html>".encode()
    _, links = extract_one(html)
    assert links == [h for h in hrefs if h]
