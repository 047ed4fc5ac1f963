"""Fuzz the extraction path: arbitrary garbage must never raise and must
always return the five-tuple shape (reference html_data_extractor.py:165
catches everything; our parser must be at least as forgiving)."""

from hypothesis import given, settings, strategies as st

from web_scraper_spark.operators.extract import extract_record
from web_scraper_spark.operators.htmlparse import parse_page

html_ish = st.text(
    alphabet=st.sampled_from(list("<>/=\"' abcdefghijk&#;:!-\n\t%")), max_size=400
)


@settings(max_examples=300, deadline=None)
@given(html_ish)
def test_parse_never_raises(html):
    doc = parse_page(html)
    assert isinstance(doc.texts, list)


@settings(max_examples=200, deadline=None)
@given(html_ish, st.sampled_from(["", "http://x.test/contact"]))
def test_extract_shape_stable(html, contact):
    out = extract_record("http://x.test", html, contact)
    assert len(out) == 5
    phones, socials, addrs, contacts, images = out
    for part in (phones, socials, addrs, contacts):
        assert all(isinstance(x, str) for x in part)
    if contact:
        assert contacts == []


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=200))
def test_extract_survives_binary_garbage(data):
    html = data.decode("utf-8", "replace")
    out = extract_record("http://x.test", html, "")
    assert len(out) == 5
