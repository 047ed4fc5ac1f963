"""Extraction operators C1-C5 (SURVEY.md §2) as one Arrow-batched UDF.

The reference runs four extractors over a shared parse
(html_data_extractor.py:143-168); here all four share one
``parse_page`` pass and the whole thing is a single scalar pandas UDF
returning a struct of four string-arrays — one Arrow batch in, one out.
At 100 TB scale this is the only Python stage in the crawl hot path and
it is embarrassingly parallel (per-page, no shuffle).

Semantics parity notes (each cited to the reference):

- PHONE_REGEX (html_data_extractor.py:12-14) is reproduced verbatim as a
  *data* constant including its quirk: the repeated group
  ``(\\d{2,5}[\\s.-]?){1,2}`` only retains the final repetition in
  ``findall`` tuples, and the reference joins group captures — so a
  middle repetition can be dropped from the reconstructed match. We
  reproduce that by joining the same capture tuple.
- Social patterns here are the *extractor* variants with capturing path
  prefixes for linkedin/youtube (html_data_extractor.py:15-21), NOT the
  storage-side variants (normalization_utils.py:10-16) — the two differ
  deliberately (SURVEY.md §7 hard-part 2).
- Platform precedence: first match in dict order wins, then ``break``
  (html_data_extractor.py:67-89).
- Contact discovery only on depth-0 pages (contact_url falsy,
  html_data_extractor.py:153-155).
"""

from __future__ import annotations

import re
from urllib.parse import unquote, urljoin, urlparse

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from web_scraper_spark.operators.htmlparse import (
    PageDoc,
    page_text,
    parse_page,
    text_with_newlines,
)

PHONE_REGEX = re.compile(
    r"""
    (\+?\d{1,3}[\s.-]?)? (\(?\d{2,5}\)?[\s.-]?)? (\d{2,5}[\s.-]?){1,2} (\d{3,5}) (?!\d)
""",
    re.VERBOSE,
)

SOCIAL_MEDIA_PATTERNS = {
    "facebook": re.compile(
        r"facebook\.com/((?!.*\b(?:sharer|plugins|events|groups|notes|photo)\b)[a-zA-Z0-9._/-]+)"
    ),
    "twitter": re.compile(
        r"(?:twitter|x)\.com/([a-zA-Z0-9_]{1,15})(?!\b(?:intent|share|search)\b)"
    ),
    "linkedin": re.compile(
        r"linkedin\.com/(company/|in/)([a-zA-Z0-9._-]+/?)(?!.*\bshare\b)"
    ),
    "instagram": re.compile(
        r"instagram\.com/([a-zA-Z0-9._]+/?)(?!.*\b(?:p/|explore)\b)"
    ),
    "youtube": re.compile(
        r"youtube\.com/(user/|channel/|c/)?([a-zA-Z0-9._-]+/?)(?!.*\b(?:watch|embed|results|playlist)\b)"
    ),
}

ADDRESS_KEYWORDS = ("address", "location", "contact", "office", "headquarters")
ADDRESS_MIN_LENGTH = 10
ADDRESS_MAX_LENGTH = 200
BASIC_ADDRESS_PART_REGEX = re.compile(
    r"\d+\s+[A-Za-z]+\s+(Street|St|Road|Rd|Avenue|Ave|Lane|Ln|Drive|Dr|Boulevard|Blvd)\b",
    re.IGNORECASE,
)
CONTACT_PAGE_KEYWORDS = (
    "contact", "kontakt", "contact-us", "contactus",
    "get-in-touch", "reach-us", "support", "help", "impressum", "about",
)
CONTACT_LINK_TEXT_PATTERNS = tuple(
    re.compile(p, re.IGNORECASE)
    for p in (
        r"\bcontact\b", r"\bkontakt\b", r"contact us", r"get in touch",
        r"support", r"help", r"impressum", r"\babout us\b",
    )
)
_SKIP_HREF_PREFIXES = ("#", "mailto:", "javascript:")


def normalize_url(url: str, base_url: str) -> str:
    """Absolutize + canonicalize (reference html_data_extractor.py:37-42)."""
    parsed = urlparse(urljoin(base_url, url.strip()))
    scheme = parsed.scheme or urlparse(base_url).scheme
    if not scheme or scheme.lower() not in ("http", "https"):
        scheme = "http"
    return f"{scheme}://{parsed.netloc}{parsed.path}".strip("/")


def clean_phone(number_str: str) -> str:
    """URL-decode + strip separators (html_data_extractor.py:44-46)."""
    return re.sub(r"[\s().-]", "", unquote(number_str))


def extract_phones(doc: PageDoc, text: str) -> set[str]:
    phones: set[str] = set()
    for href, _ in doc.anchors:
        if href.startswith("tel:"):
            phones.add(clean_phone(href[4:].strip()))
    for groups in PHONE_REGEX.findall(text):
        candidate = "".join(g for g in groups if g)
        if len(re.sub(r"\D", "", candidate)) >= 7:
            phones.add(clean_phone(candidate))
    return phones


def extract_socials(doc: PageDoc, text: str, base_url: str) -> set[str]:
    links: set[str] = set()
    for href, _ in doc.anchors:
        if not href or href.startswith(_SKIP_HREF_PREFIXES):
            continue
        absolute = normalize_url(href, base_url)
        netloc = urlparse(absolute).netloc
        for platform, pattern in SOCIAL_MEDIA_PATTERNS.items():
            m = pattern.search(absolute)
            if not m:
                continue
            clean = absolute
            if platform == "twitter":
                clean = f"https://{netloc}/{m.group(1).strip('/')}"
            elif platform == "facebook":
                clean = f"https://www.facebook.com/{m.group(1).strip('/')}"
            elif platform == "linkedin":
                clean = (
                    f"https://www.linkedin.com/{m.group(1).strip('/')}/"
                    f"{m.group(2).strip('/')}"
                )
            elif platform == "instagram":
                clean = f"https://www.instagram.com/{m.group(1).strip('/')}"
            elif platform == "youtube":
                prefix = m.group(1) or "user/"
                clean = (
                    f"https://www.youtube.com/{prefix.strip('/')}/"
                    f"{m.group(2).strip('/')}"
                )
            links.add(clean)
            break
    for pattern in SOCIAL_MEDIA_PATTERNS.values():
        for m in pattern.finditer(text):
            links.add("https://" + m.group(0))
    return links


def extract_addresses(doc: PageDoc, newline_text: str) -> set[str]:
    addresses: set[str] = set()
    for segment in doc.address_segments:
        if ADDRESS_MIN_LENGTH < len(segment) < ADDRESS_MAX_LENGTH:
            addresses.add(segment)
    for line in newline_text.splitlines():
        if any(ch.isdigit() for ch in line):
            line = line.strip()
            if ADDRESS_MIN_LENGTH < len(line) < ADDRESS_MAX_LENGTH:
                lower = line.lower()
                if any(k in lower for k in ADDRESS_KEYWORDS) or BASIC_ADDRESS_PART_REGEX.search(line):
                    addresses.add(line)
    return addresses


def find_contact_pages(doc: PageDoc, base_url: str) -> set[str]:
    contact_urls: set[str] = set()
    base_domain = urlparse(base_url).netloc
    for href, link_text in doc.anchors:
        if not href or href.startswith(_SKIP_HREF_PREFIXES):
            continue
        lower_href = href.lower()
        is_potential = any(k in lower_href for k in CONTACT_PAGE_KEYWORDS)
        if not is_potential:
            is_potential = any(p.search(link_text) for p in CONTACT_LINK_TEXT_PATTERNS)
        if is_potential:
            absolute = normalize_url(href, base_url)
            if urlparse(absolute).netloc == base_domain and absolute != base_url:
                contact_urls.add(absolute)
    return contact_urls


def extract_images(doc: PageDoc, base_url: str) -> list[dict]:
    """Graft: absolutized <img src> + alt caption, document order, first
    occurrence wins per src (the reference has no image path)."""
    seen: set[str] = set()
    out: list[dict] = []
    for src, alt in doc.images:
        absolute = normalize_url(src, base_url)
        if absolute not in seen:
            seen.add(absolute)
            out.append({"src": absolute, "caption": alt})
    return out


def extract_record(
    base_url: str, html: str, contact_url: str | None
) -> tuple[list[str], list[str], list[str], list[str], list[dict]]:
    """C5 orchestrator: parse once, run C1-C4 (+ graft image collection);
    empty on any exception (html_data_extractor.py:143-168). Returns
    sorted lists (set semantics — deterministic order for columnar
    storage)."""
    try:
        doc = parse_page(html)
        text = page_text(doc)
        phones = extract_phones(doc, text)
        socials = extract_socials(doc, text, base_url)
        addresses = extract_addresses(doc, text_with_newlines(doc))
        contacts = find_contact_pages(doc, base_url) if not contact_url else set()
        images = extract_images(doc, base_url)
        return sorted(phones), sorted(socials), sorted(addresses), sorted(contacts), images
    except Exception:
        return [], [], [], [], []


EXTRACT_SCHEMA = StructType(
    [
        StructField("phone_numbers", ArrayType(StringType())),
        StructField("social_media_links", ArrayType(StringType())),
        StructField("addresses", ArrayType(StringType())),
        StructField("contact_links", ArrayType(StringType())),
        StructField(
            "images",
            ArrayType(
                StructType(
                    [
                        StructField("src", StringType()),
                        StructField("caption", StringType()),
                    ]
                )
            ),
        ),
    ]
)


@pandas_udf(EXTRACT_SCHEMA)
def extract_all(
    base_url: pd.Series, html: pd.Series, contact_url: pd.Series
) -> pd.DataFrame:
    """Arrow-batched extraction: one parse per page, five columns out."""
    rows = [
        extract_record(
            u,
            h if isinstance(h, str) else (h.decode("utf-8", "replace") if h is not None else ""),
            c,
        )
        for u, h, c in zip(base_url, html, contact_url)
    ]
    return pd.DataFrame(
        rows,
        columns=[
            "phone_numbers",
            "social_media_links",
            "addresses",
            "contact_links",
            "images",
        ],
    )
