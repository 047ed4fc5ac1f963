"""URL normalization as pure Catalyst column expressions.

Semantics mirror the reference (cited per function); implementation is
whole-stage-codegen Spark SQL, not Python. At 100 TB scale these run inside
codegen over billions of frontier rows — zero Python cost.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference: src/utils/normalization_utils.py:63 — domains dropped as
# non-informative. The membership test happens BEFORE lowercasing there;
# we mirror that exactly (a cased "Google.com" passes the denylist).
GENERIC_DOMAINS = (
    "google.com",
    "facebook.com",
    "twitter.com",
    "linkedin.com",
    "youtube.com",
)

_SCHEME_RE = r"^[a-zA-Z]+://"
_NETLOC_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)"


def strip_ws(col: Column) -> Column:
    """Python ``str.strip()`` equivalent. Spark's ``trim`` strips ONLY
    ASCII spaces; the reference strips all (Unicode) whitespace — ``(?U)``
    makes Java's ``\\s`` Unicode-aware to match."""
    return F.regexp_replace(col, r"(?U)^\s+|\s+$", "")


def prepare_url(url: Column) -> Column:
    """Trim; prepend ``http://`` unless a ``scheme://`` prefix exists.

    Mirrors ``prepare_url`` (reference src/utils/normalization_utils.py:103-110):
    empty input stays empty, existing scheme is preserved verbatim.
    """
    trimmed = strip_ws(url)
    return (
        F.when(trimmed == "", F.lit(""))
        .when(trimmed.rlike(_SCHEME_RE), trimmed)
        .otherwise(F.concat(F.lit("http://"), trimmed))
    )


def domain_from_url(url: Column) -> Column:
    """Netloc with ``www.`` stripped, generic domains dropped, lowercased.

    Mirrors ``get_domain_from_url`` (normalization_utils.py:55-81):
    - prepend ``http://`` when ``://`` is absent (so bare domains parse),
    - strip a literal leading ``www.`` (case-sensitive, as in the reference),
    - NULL for empty netloc or a netloc in the generic denylist
      (membership tested before lowercasing, as in the reference),
    - lowercase the survivor.
    """
    with_scheme = F.when(
        url.contains("://"), url
    ).otherwise(F.concat(F.lit("http://"), url))
    netloc = F.regexp_extract(with_scheme, _NETLOC_RE, 1)
    stripped = F.when(
        netloc.startswith("www."), netloc.substr(F.lit(5), F.length(netloc))
    ).otherwise(netloc)
    return (
        F.when(url.isNull() | (url == ""), F.lit(None))
        .when(stripped == "", F.lit(None))
        .when(stripped.isin(*GENERIC_DOMAINS), F.lit(None))
        .otherwise(F.lower(stripped))
    )


def canonicalize_url(url: Column) -> Column:
    """Canonical absolute-URL form: ``scheme://netloc/path``, no query or
    fragment, trailing ``/`` stripped, scheme coerced into {http, https}.

    Mirrors ``HtmlDataExtractor._normalize_url`` for already-absolute URLs
    (reference src/components/html_data_extractor.py:37-42). Relative-href
    absolutization (urljoin) happens in the extraction UDF where the base
    URL is in hand. This expression is the frontier's canonicalizer feeding
    ``xxhash64`` for the URL-seen set.
    """
    scheme = F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://", 1))
    scheme = F.when(scheme.isin("http", "https"), scheme).otherwise(F.lit("http"))
    netloc = F.regexp_extract(url, _NETLOC_RE, 1)
    path = F.regexp_extract(url, _PATH_RE, 1)
    return F.regexp_replace(
        F.concat(scheme, F.lit("://"), netloc, path), r"/+$", ""
    )


def host_of(url: Column) -> Column:
    """Raw netloc (lowercased) — the politeness-bucket key.

    Unlike :func:`domain_from_url` this keeps ``www.`` and generic hosts:
    politeness is about the physical host being hit, not record identity.
    """
    with_scheme = F.when(
        url.contains("://"), url
    ).otherwise(F.concat(F.lit("http://"), url))
    return F.lower(F.regexp_extract(with_scheme, _NETLOC_RE, 1))
