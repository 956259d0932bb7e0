"""Extractor tolerance under adversarial bytes (hypothesis fuzz) —
the never-fail invariant of link_prediction_metadata.py:150-155."""

from hypothesis import given, settings, strategies as st

from halvesting_geometric_ray.functions.extract import extract_one


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
