"""Fetch stage (SURVEY.md A6/H3) — two implementations, one interface.

``fetch(frontier, web=...)`` returns the frontier with
``(status, content_type, body)`` columns attached:

- **Hermetic (CI / parity)**: equi-join of the frontier against the
  synthetic ``web_host`` table on the canonical URL. Deterministic, no
  network. The join is how the driver's oracle checks see it too.
- **Live (production; never exercised in CI — SURVEY.md Phase 4)**:
  ``mapInPandas`` running a bounded thread pool of stdlib
  ``urllib.request`` GETs per partition — per-partition concurrency x
  #partitions = global concurrency, the Spark analogue of the
  reference's asyncio.Semaphore(256) (fetcher_service.py:17-27).
  Per-host crawl delays are honored INSIDE the partition because the
  crawl plan partitions the round's fetches by salted host key, so one
  host's URLs land in few partitions and can be paced locally.

Reference fetch semantics carried over (web_fetcher.py:10-49):
UA header, 15 s total timeout, follow redirects, errors -> dropped row
(status recorded, no retry — parity-relevant: failed URLs simply never
produce results), non-HTML responses *routed* (graft) instead of dropped.
"""

from __future__ import annotations

import time
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, StringType, StructField, StructType,
)

from web_scraper_spark.functions.urls import canonicalize_url

USER_AGENT = "Mozilla/5.0 (compatible; SparkFrontierBot/0.1)"
FETCH_TIMEOUT_S = 15.0
PER_PARTITION_CONCURRENCY = 8

FETCH_RESULT_FIELDS = [
    StructField("status", IntegerType()),
    StructField("content_type", StringType()),
    StructField("body", BinaryType()),
]


def fetch_join(frontier: DataFrame, web: DataFrame) -> DataFrame:
    """Hermetic fetch: join on canonical URL. Keeps every frontier column;
    unmatched URLs get status 0 (the timeout sentinel)."""
    lookup = (
        web.withColumn("_canon", canonicalize_url(F.col("url")))
        .select(
            "_canon",
            F.col("status").alias("_status"),
            F.col("content_type").alias("_content_type"),
            F.col("body").alias("_body"),
        )
        # the synthetic web is a dimension next to a 10^10 frontier? No —
        # at scale the web IS the big side; but in hermetic tests it is
        # small, and the frontier side arrives hash-partitioned, so let
        # AQE pick the strategy. Broadcast only under an explicit hint
        # from the caller.
    )
    out = (
        frontier.withColumn("_canon", canonicalize_url(F.col("url")))
        .join(lookup, "_canon", "left")
        .withColumn("status", F.coalesce(F.col("_status"), F.lit(0)))
        .withColumn("content_type", F.coalesce(F.col("_content_type"), F.lit("")))
        .withColumn("body", F.col("_body"))
        .drop("_canon", "_status", "_content_type", "_body")
    )
    return out


def fetch_live(
    frontier: DataFrame,
    crawl_delays: dict[str, float] | None = None,
    timeout_s: float = FETCH_TIMEOUT_S,
    concurrency: int = PER_PARTITION_CONCURRENCY,
    proxy: str | None = None,
) -> DataFrame:
    """Live fetch via mapInPandas + thread pool. Exercised in CI against a
    loopback HTTP server and, for full crawl parity, through a loopback
    HTTP *proxy* serving the synthetic web (tests/test_fetch_live.py,
    tests/test_live_crawl.py); the scheduling logic is additionally
    unit-tested through ``_pace_batch`` below.

    ``proxy``: optional ``http://host:port`` forward proxy — the proxy
    receives absolute request URIs, so fixture hostnames need no DNS.
    """
    schema = StructType(
        [StructField(f.name, f.dataType) for f in frontier.schema.fields]
        + FETCH_RESULT_FIELDS
    )
    delays = dict(crawl_delays or {})

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import concurrent.futures as cf
        import urllib.error
        import urllib.request

        if proxy:
            opener = urllib.request.build_opener(
                urllib.request.ProxyHandler({"http": proxy})
            )
        else:
            opener = urllib.request.build_opener()

        def get(url: str):
            req = urllib.request.Request(url, headers={"User-Agent": USER_AGENT})
            try:
                with opener.open(req, timeout=timeout_s) as resp:
                    ctype = resp.headers.get("Content-Type", "")
                    return resp.status, ctype, resp.read()
            except urllib.error.HTTPError as e:
                return e.code, "", None
            except Exception:
                return 0, "", None  # timeout sentinel; no retry (H7)

        with cf.ThreadPoolExecutor(max_workers=concurrency) as pool:
            for batch in batches:
                order = _pace_batch(batch, delays)
                results = [None] * len(batch)
                for when, idx in order:
                    now = time.monotonic()
                    if when > now:
                        time.sleep(when - now)
                    results[idx] = pool.submit(get, batch["url"].iloc[idx])
                resolved = [r.result() for r in results]
                out = batch.copy()
                out["status"] = [r[0] for r in resolved]
                out["content_type"] = [r[1] for r in resolved]
                out["body"] = [r[2] for r in resolved]
                yield out

    return frontier.mapInPandas(run, schema)


def _pace_batch(batch: pd.DataFrame, delays: dict[str, float]):
    """Schedule (monotonic-deadline, row-idx) per URL honoring per-host
    crawl delays within this partition. Pure logic -> unit-testable.

    Delay source precedence: a non-null per-row ``crawl_delay`` column
    (the frontier carries it from the robots broadcast join — scales to
    any host count, no driver dict) > the ``delays`` dict (kept for
    direct fetch_live callers and tests) > 0."""
    start = time.monotonic()
    next_slot: dict[str, float] = {}
    order = []
    hosts = batch["host"] if "host" in batch else pd.Series([""] * len(batch))
    delay_col = batch["crawl_delay"] if "crawl_delay" in batch else None
    for idx in range(len(batch)):
        host = hosts.iloc[idx]
        if delay_col is not None and pd.notna(delay_col.iloc[idx]):
            delay = float(delay_col.iloc[idx])
        else:
            delay = delays.get(host, 0.0)
        when = max(start, next_slot.get(host, start))
        next_slot[host] = when + delay
        order.append((when, idx))
    order.sort()
    return order
