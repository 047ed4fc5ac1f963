"""Pipeline coverage + fill-rate report (SURVEY.md G1/G2; reference
pipeline_metrics_tracker.py:62-96 regex-scraped log lines — here the
same numbers come from structured tables).

The reference publishes (README.md:236-246): fetch coverage % and
per-field fill rates (% of input domains with ≥1 phone / social link /
address). Those are the numbers this report reproduces from a
CrawlResult.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from web_scraper_spark.plans.crawl import CrawlResult


def coverage_report(result: CrawlResult) -> dict:
    """One-row report dict: produced/fetched/coverage + fill rates."""
    # produced = distinct seed URLs queued (depth 0 attempts);
    # fetched = distinct seed URLs whose fetch succeeded — a seed counts
    # as fetched iff its domain produced any extracted record
    # (pipeline_metrics_tracker counts per 'Successfully fetched' log
    # line; a succeeded fetch always yields an extraction message)
    produced = (
        result.crawl_log.where(F.col("depth") == 0)
        .select("url").distinct().count()
    )
    attempts_ok = result.metrics.agg(F.sum("ok")).collect()[0][0] or 0

    docs = result.company_records
    crawled = docs.where(F.col("url").isNotNull())  # domains with extraction
    n_domains = crawled.count()
    fills = crawled.agg(
        F.sum((F.size(F.coalesce(F.col("phone_numbers"), F.array())) > 0).cast("long")).alias("phones"),
        F.sum((F.size(F.coalesce(F.col("social_media_links"), F.array())) > 0).cast("long")).alias("socials"),
        F.sum((F.size(F.coalesce(F.col("addresses"), F.array())) > 0).cast("long")).alias("addresses"),
    ).collect()[0]

    def pct(n: int) -> float:
        return round(100.0 * n / produced, 2) if produced else 0.0

    return {
        "urls_produced": produced,
        "fetches_ok": int(attempts_ok),
        "domains_with_data": n_domains,
        "coverage_pct": pct(n_domains),
        "fill_rate_phones_pct": pct(fills["phones"]),
        "fill_rate_social_pct": pct(fills["socials"]),
        "fill_rate_addresses_pct": pct(fills["addresses"]),
    }


def lineage_report(result: CrawlResult) -> DataFrame:
    """Per-round, per-partition lineage rows (graft requirement:
    'per-partition lineage + metrics')."""
    return result.metrics.orderBy("round", "partition_id")
