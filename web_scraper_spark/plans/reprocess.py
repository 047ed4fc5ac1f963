"""Archive reprocessing: re-run extraction over a WARC crawl archive.

The workflow the archive exists for — extractor logic changes (new
regexes, new fields) and the corpus is re-extracted WITHOUT re-crawling.
The reference can't do this (fetched bytes die with the Kafka message,
``services/scraper_service.py`` produces and forgets); the graft's
``run_crawl(export_warc=True)`` archive makes extraction a pure,
repeatable function of stored bytes.

Scale shape: read_warc fans out one task per .warc.gz file, the filter
on (status, content-type) prunes before decode of the HTML string, and
the same Arrow-batched ``extract_all`` UDF the crawl uses runs directly
on the scan output — one stage, no shuffle, bodies never leave the task
that read them.

Base-URL caveat (documented, reference-parity): at crawl time the
extractor's base_url is the SEED url even on contact pages (reference
quirk, SURVEY.md; ``extractor_service.py``). A WARC response record only
knows its target URI, so reprocessing uses the page's own URL as base —
phones/socials/addresses are base-independent (regex over page text) and
reproduce crawl-time values exactly; contact-link absolutization can
differ on relative hrefs. Callers that need crawl-parity contacts join
the crawl log's (seed_url, url) mapping back on and re-extract with it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from web_scraper_spark.operators.extract import extract_all
from web_scraper_spark.sources.warc import read_warc


def extract_from_warc(spark: SparkSession, warc_path: str) -> DataFrame:
    """(url, phone_numbers, social_media_links, addresses, contact_urls)
    for every archived HTML 200 page under ``warc_path`` (glob ok)."""
    pages = read_warc(spark, warc_path).where(
        (F.col("status") == 200) & F.col("content_type").contains("text/html")
    )
    return pages.select(
        "url",
        extract_all(
            F.col("url"), F.col("body").cast("string"), F.lit("")
        ).alias("ex"),
    ).select("url", "ex.*")
