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


def attempts_robots_asof(attempts: DataFrame, robots_history: DataFrame) -> DataFrame:
    """Attribute every fetch attempt to the robots snapshot in effect
    when it ran — the crawl-side consumer of ``operators/asof.asof_join``
    (VERDICT r2 item 9). ``attempts``: crawl-log rows carrying (host,
    ts); ``robots_history``: the APPEND history of the live robots cache
    (host, fetched_at, transient, crawl_delay — one row per (host,
    pre-pass)). Output = attempts + robots_fetched_at /
    robots_transient / robots_crawl_delay of the latest snapshot with
    fetched_at <= ts (nulls when the attempt predates any snapshot)."""
    from web_scraper_spark.operators.asof import asof_join

    hist = robots_history.select(
        "host",
        "fetched_at",
        F.col("fetched_at").alias("robots_fetched_at"),
        F.col("transient").alias("robots_transient"),
        F.col("crawl_delay").alias("robots_crawl_delay"),
    )
    return asof_join(
        attempts,
        hist,
        key="host",
        left_time="ts",
        right_time="fetched_at",
        payload=["robots_fetched_at", "robots_transient", "robots_crawl_delay"],
    )


def mirror_host_groups(pages: DataFrame) -> DataFrame:
    """(host, mirror_group): mirror/alias detection over fetched pages —
    the crawl-side consumer of ``operators/components.
    connected_components`` (VERDICT r2 item 9). Two hosts are aliased
    when they serve at least one byte-identical body; the transitive
    closure labels each mirror cluster by its min host, which a frontier
    can use to crawl one representative per cluster. Edges form per
    content-hash as a min-host STAR (one representative per hash), so a
    page mirrored by g hosts costs g-1 edges, never g^2/2 — the same
    guard shape as operators/dedup_guard.py."""
    from web_scraper_spark.operators.components import connected_components

    h = (
        pages.where(F.col("body").isNotNull())
        .select("host", F.md5(F.col("body")).alias("_ck"))
        .dropDuplicates(["host", "_ck"])
    )
    rep = h.groupBy("_ck").agg(F.min("host").alias("_rep"))
    edges = (
        h.join(rep, "_ck")
        .where(F.col("host") != F.col("_rep"))
        .select(F.col("_rep").alias("src"), F.col("host").alias("dst"))
    )
    verts = pages.select(F.col("host").alias("id")).dropDuplicates()
    return connected_components(verts, edges).select(
        F.col("id").alias("host"), F.col("component").alias("mirror_group")
    )
