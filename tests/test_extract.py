"""Hand-built fixtures pinning the extraction semantics (SURVEY.md §2 C1-C5).

These pin the pure-Python extractors that both the Spark UDF and the
oracle simulator call — expected values are written by hand from the
reference's documented behavior (html_data_extractor.py), NOT generated.
"""

from web_scraper_spark.operators.extract import (
    clean_phone,
    extract_record,
    normalize_url,
)
from web_scraper_spark.operators.htmlparse import page_text, parse_page

BASE = "http://acme.test"

HTML = """
<html><head>
<style>p { color: red } /* 555-111-2222 */</style>
<script>var t = 'tel:+19998887777';</script>
</head><body>
<h1>Acme, Inc.</h1>
<a href="tel:+1 (212) 555-0173">Call us</a>
<p>Or dial 646-555-0199 today</p>
<a href="https://www.facebook.com/acmeinc">FB</a>
<a href="https://twitter.com/acme_co">TW</a>
<a href="https://www.linkedin.com/company/acme-inc/">LI</a>
<address>123 Main Street, Springfield, IL 62704</address>
<div itemprop="address">Suite 5, 200 Oak Avenue, Portland</div>
<p>Our office: 45 Elm Road, floor 3</p>
<a href="/contact">Contact us</a>
<a href="/team">Get in touch</a>
<a href="http://other.test/contact">external contact</a>
<a href="#frag">skip</a>
<a href="mailto:a@b.c">skip</a>
<img src="/img/0.png" alt="hero image">
</body></html>
"""


def test_phone_extraction_tel_and_text():
    phones, _, _, _, _ = extract_record(BASE, HTML, "")
    assert "+12125550173" in phones  # tel: href, cleaned (B8)
    assert any("6465550199" in p for p in phones)  # free-text regex (C1)
    assert "+19998887777" not in phones  # script content removed (B6)


def test_social_extraction_canonical_rebuild():
    _, socials, _, _, _ = extract_record(BASE, HTML, "")
    assert "https://www.facebook.com/acmeinc" in socials
    assert "https://twitter.com/acme_co" in socials
    # linkedin rebuild keeps the company/ prefix (html_data_extractor.py:78-80)
    assert "https://www.linkedin.com/company/acme-inc" in socials


def test_address_extraction_tags_and_lines():
    _, _, addrs, _, _ = extract_record(BASE, HTML, "")
    assert "123 Main Street, Springfield, IL 62704" in addrs
    assert "Suite 5, 200 Oak Avenue, Portland" in addrs
    # keyword line ("office") with digits, 10<len<200
    assert "Our office: 45 Elm Road, floor 3" in addrs


def test_contact_discovery_same_netloc_only():
    _, _, _, contacts, _ = extract_record(BASE, HTML, "")
    assert "http://acme.test/contact" in contacts  # href keyword
    assert "http://acme.test/team" in contacts  # link-text pattern
    assert all("other.test" not in c for c in contacts)  # same-netloc gate (E6)


def test_contact_discovery_depth_gated():
    # contact_url truthy -> no discovery (html_data_extractor.py:153-155)
    _, _, _, contacts, _ = extract_record(BASE, HTML, "http://acme.test/contact")
    assert contacts == []


def test_image_collection_absolutized():
    _, _, _, _, images = extract_record(BASE, HTML, "")
    assert images == [{"src": "http://acme.test/img/0.png", "caption": "hero image"}]


def test_exception_returns_empty():
    phones, socials, addrs, contacts, images = extract_record(BASE, None, "")
    assert (phones, socials, addrs, contacts, images) == ([], [], [], [], [])


def test_normalize_url_reference_semantics():
    # html_data_extractor.py:37-42: urljoin, scheme coercion, strip('/')
    assert normalize_url("/contact", "http://a.test") == "http://a.test/contact"
    assert normalize_url("b.html", "http://a.test/x/y.html") == "http://a.test/x/b.html"
    assert normalize_url("ftp://a.test/f", "http://a.test") == "http://a.test/f"
    assert normalize_url("http://a.test/p/", "http://a.test") == "http://a.test/p"
    assert normalize_url("?q=1#f", "http://a.test/p") == "http://a.test/p"


def test_clean_phone():
    assert clean_phone("+1 (212) 555-0173") == "+12125550173"
    assert clean_phone("%2B1%20212.555.0173") == "+12125550173"


def test_page_text_skips_script_style():
    doc = parse_page(HTML)
    text = page_text(doc)
    assert "color: red" not in text
    assert "tel:+19998887777" not in text
    assert "Acme, Inc." in text


def test_anchor_text_nested():
    doc = parse_page('<a href="/x"><b>Get</b> in <i>touch</i></a>')
    assert doc.anchors == [("/x", "Getintouch")]
