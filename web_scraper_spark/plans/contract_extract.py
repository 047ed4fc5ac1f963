"""Driver-contract queries, part 3: C1-C5 extraction under the driver's
independent DuckDB check (VERDICT r1 item 2).

HTML extraction is not expressible over the TPC-H oracle tables, so these
entries use committed fixtures instead: ``tests/fixtures/extract_pages.
parquet`` holds deterministic synthetic-web HTML (sources/synthetic_web.py,
seed pinned below) and ``extract_golden.parquet`` holds the expected
extraction outputs computed by the pure-Python ``extract_record`` path
(the one pinned against the reference's semantics by tests/test_extract.py
hand fixtures, reference ``src/components/html_data_extractor.py:48-141``).

The Spark side runs the REAL Arrow-batched ``extract_all`` UDF over the
pages fixture; the oracle is a plain SELECT over the golden parquet — so
the driver's gate now covers the full Spark plumbing (Arrow batching,
struct schema, null handling) of the densest operator in the engine, and
any semantic drift in the extractors breaks the committed golden.

``tests/test_extract_contract.py`` regenerates the golden in-memory and
asserts the committed files match (no silent fixture drift).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from web_scraper_spark.plans.contract import ORACLES, QUERIES, register

FIXTURE_N_DOMAINS = 60
FIXTURE_SEED = 7


def _fixture_dir() -> str:
    """Committed-fixture location, robust to HOW the package is imported:
    a checkout import resolves relative to __file__; a --py-files zip
    import (where __file__ sits inside the archive and the relative walk
    lands nowhere) falls back to the repo checkout, then to cwd."""
    rel = os.path.join(
        os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ),
        "tests",
        "fixtures",
    )
    for cand in (rel, "/root/repo/tests/fixtures",
                 os.path.join(os.getcwd(), "tests", "fixtures")):
        if os.path.isdir(cand):
            return cand
    return rel


_FIXTURE_DIR = _fixture_dir()
PAGES_PATH = os.path.join(_FIXTURE_DIR, "extract_pages.parquet")
GOLDEN_PATH = os.path.join(_FIXTURE_DIR, "extract_golden.parquet")


# ---------------------------------------------------------------------------
# fixture generation (pure Python; no Spark) --------------------------------
def build_fixture_rows() -> tuple[list[dict], list[dict]]:
    """(pages, golden) row dicts. Pages are every text/html row of the
    synthetic web; contact pages carry ``contact_url`` = their own URL and
    ``seed_url`` = the seed page (the reference attributes contact-page
    extraction to the SEED url and gates C4 on contact_url being set —
    html_data_extractor.py:153-155, extractor_service.py:69-76)."""
    from web_scraper_spark.operators.extract import extract_record
    from web_scraper_spark.sources.synthetic_web import build_web

    _, web = build_web(FIXTURE_N_DOMAINS, seed=FIXTURE_SEED)
    pages: list[dict] = []
    golden: list[dict] = []
    html_rows = sorted(
        (r for r in web if "text/html" in r.content_type), key=lambda r: r.url
    )
    for page_id, row in enumerate(html_rows):
        seed_url = f"http://{row.host}"
        contact_url = row.url if row.depth > 0 else ""
        html = row.body.decode("utf-8")
        pages.append(
            {
                "page_id": page_id,
                "url": row.url,
                "seed_url": seed_url,
                "contact_url": contact_url,
                "html": html,
            }
        )
        phones, socials, addrs, contacts, images = extract_record(
            seed_url, html, contact_url
        )
        golden.append(
            {
                "page_id": page_id,
                "url": row.url,
                "phones": "|".join(sorted(phones)),
                "socials": "|".join(sorted(socials)),
                "addresses": "|".join(sorted(addrs)),
                "contacts": "|".join(sorted(contacts)),
                "images": "|".join(
                    sorted(f"{i['src']}~{i['caption']}" for i in images)
                ),
            }
        )
    return pages, golden


def write_fixtures() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pages, golden = build_fixture_rows()
    os.makedirs(_FIXTURE_DIR, exist_ok=True)
    pq.write_table(pa.Table.from_pylist(pages), PAGES_PATH)
    pq.write_table(pa.Table.from_pylist(golden), GOLDEN_PATH)


# ---------------------------------------------------------------------------
# contract queries -----------------------------------------------------------
_EXTRACTED_CACHE: dict[str, object] = {}


def _extracted(spark):
    """Pages fixture -> the real extract_all UDF -> one row per page with
    pipe-joined sorted outputs (matching the golden's serialization).
    Memoized per SparkSession (C1-C5 all project from the same UDF pass —
    the driver runs five queries, the 176-page extraction runs once).
    Keyed on applicationId, not id(spark): a stopped session's id() can be
    reused by a new one, handing out a DataFrame bound to a dead context
    (ADVICE r3). Single-entry: only the CURRENT session's fixture is ever
    needed, and evicting on key change keeps a many-session process from
    accumulating dead DataFrame handles."""
    key = spark.sparkContext.applicationId
    cached = _EXTRACTED_CACHE.get(key)
    if cached is not None:
        return cached
    _EXTRACTED_CACHE.clear()
    from web_scraper_spark.operators.extract import extract_all

    pages = spark.read.parquet(PAGES_PATH)
    ex = pages.select(
        "page_id",
        "url",
        extract_all(
            F.col("seed_url"), F.col("html"), F.col("contact_url")
        ).alias("ex"),
    )

    def joined(c):
        return F.array_join(F.array_sort(F.col(f"ex.{c}")), "|")

    out = ex.select(
        "page_id",
        "url",
        joined("phone_numbers").alias("phones"),
        joined("social_media_links").alias("socials"),
        joined("addresses").alias("addresses"),
        joined("contact_links").alias("contacts"),
        F.array_join(
            F.array_sort(
                F.transform(
                    F.col("ex.images"),
                    lambda i: F.concat_ws("~", i["src"], i["caption"]),
                )
            ),
            "|",
        ).alias("images"),
    ).cache()
    _EXTRACTED_CACHE[key] = out
    return out


def _golden_sql(cols: str) -> str:
    return f"SELECT {cols} FROM read_parquet('{GOLDEN_PATH}')"


@register("c1_phones_extract", _golden_sql("page_id, url, phones"))
def c1_phones_extract(spark, sf_dir):
    """C1 — tel: hrefs + PHONE_REGEX over page text (>=7 digits), cleaned
    (html_data_extractor.py:48-58)."""
    return _extracted(spark).select("page_id", "url", "phones")


@register("c2_socials_extract", _golden_sql("page_id, url, socials"))
def c2_socials_extract(spark, sf_dir):
    """C2 — anchor hrefs absolutized, first-matching platform wins with
    per-platform canonical rebuild, plus raw-text finditer
    (html_data_extractor.py:60-98)."""
    return _extracted(spark).select("page_id", "url", "socials")


@register("c3_addresses_extract", _golden_sql("page_id, url, addresses"))
def c3_addresses_extract(spark, sf_dir):
    """C3 — <address>/itemprop segments + digit-bearing keyword/street
    lines, length-gated (html_data_extractor.py:100-116)."""
    return _extracted(spark).select("page_id", "url", "addresses")


@register("c4_contacts_extract", _golden_sql("page_id, url, contacts"))
def c4_contacts_extract(spark, sf_dir):
    """C4 — contact-page discovery: keyword hrefs / link-text patterns,
    same-netloc gate, DEPTH-GATED (empty on contact pages — the fixture
    keeps contact-page rows so the gate itself is checked;
    html_data_extractor.py:118-141,153-155)."""
    return _extracted(spark).select("page_id", "url", "contacts")


@register(
    "c5_extract_all",
    _golden_sql("page_id, url, phones, socials, addresses, contacts, images"),
)
def c5_extract_all(spark, sf_dir):
    """C5 — the one-parse orchestrator, all five outputs in one row
    (html_data_extractor.py:143-168 + graft image collection)."""
    return _extracted(spark)


__all__ = ["QUERIES", "ORACLES", "build_fixture_rows", "write_fixtures"]

if __name__ == "__main__":
    write_fixtures()
    print(f"wrote {PAGES_PATH} and {GOLDEN_PATH}")
