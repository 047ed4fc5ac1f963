"""Company-name normalization and best-name precedence — pure Catalyst.

Mirrors reference semantics:
- ``normalize_company_name``: src/utils/normalization_utils.py:83-101
- best-name precedence: services/company_name_data_producer.py:14-27
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Whole-word legal suffixes, each optionally followed by a dot
# (normalization_utils.py:92-96). "p.c" contains dots, escaped below.
_LEGAL_SUFFIXES = ["inc", "llc", "ltd", "p.c", "pty", "corporation", "company"]


def normalize_company_name(name: Column) -> Column:
    """lowercase -> strip whole-word legal suffixes (+ optional trailing dot)
    -> drop non-word/non-space chars -> collapse whitespace -> trim.

    NULL/empty input yields "" (the reference returns "" for falsy input).
    """
    out = F.lower(F.coalesce(name, F.lit("")))
    for suffix in _LEGAL_SUFFIXES:
        escaped = suffix.replace(".", r"\.")
        out = F.regexp_replace(out, rf"\b{escaped}\b\.?", "")
    # Python's \w is Unicode-aware; Java's is ASCII-only — spell out the
    # Unicode classes so accented letters survive like in the reference
    out = F.regexp_replace(out, r"(?U)[^\p{L}\p{N}_\s]", "")
    # Python's ' '.join(s.split()) collapses *Unicode* whitespace
    out = F.regexp_replace(out, r"(?U)\s+", " ")
    from web_scraper_spark.functions.urls import strip_ws

    return strip_ws(out)


def best_name(
    legal: Column, commercial: Column, all_available: Column
) -> Column:
    """Precedence: legal -> commercial -> first of pipe-split all_available;
    NULL when every candidate is empty/blank.

    Mirrors services/company_name_data_producer.py:14-27 (rows with no name
    at all are skipped there — filter on isNotNull afterwards).
    """
    def _nonblank(c: Column) -> Column:
        from web_scraper_spark.functions.urls import strip_ws

        return F.nullif(strip_ws(F.coalesce(c, F.lit(""))), F.lit(""))

    first_of_all = F.split(F.coalesce(all_available, F.lit("")), r"\|")[0]
    return F.coalesce(_nonblank(legal), _nonblank(commercial), _nonblank(first_of_all))


def searchable_name_tokens(name: Column) -> Column:
    """Tokenized, accent-folded searchable name — the engine's explicit
    replacement for the reference's ES analyzer (standard tokenizer +
    lowercase + asciifolding, src/utils/elastic_search_utils.py:51-63).
    """
    folded = F.regexp_replace(
        F.translate(
            F.lower(F.coalesce(name, F.lit(""))),
            "àáâãäåèéêëìíîïòóôõöùúûüçñ",
            "aaaaaaeeeeiiiiooooouuuucn",
        ),
        r"[^\w\s]",
        " ",
    )
    return F.array_remove(F.split(F.trim(folded), r"\s+"), "")
