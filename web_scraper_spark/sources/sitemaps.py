"""Sitemap ingestion (graft; the reference has no sitemap handling).

robots.txt ``Sitemap:`` records (sources/robots.discovered_sitemaps)
point at XML documents in the sitemaps.org protocol: either a
``<urlset>`` of ``<url><loc>`` page entries or a ``<sitemapindex>`` of
``<sitemap><loc>`` child sitemaps. ``parse_sitemap_xml`` handles both
(namespace-agnostic, stdlib ElementTree, malformed XML -> empty);
``sitemap_frontier`` turns fetched sitemap bodies into frontier
candidate rows, expanding one level of index indirection via a second
hermetic fetch of the child sitemaps.

Scale shape: sitemap bodies parse in an Arrow-batched UDF (one XML
parse per sitemap, never per URL); the output is (host, url) rows that
feed the normal seed/dedup/politeness machinery — a sitemap with 50k
URLs (the protocol cap) is just 50k frontier rows.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

_PARSED_SCHEMA = StructType(
    [
        StructField("page_urls", ArrayType(StringType())),
        StructField("child_sitemaps", ArrayType(StringType())),
    ]
)


def parse_sitemap_xml(body: str) -> tuple[list[str], list[str]]:
    """-> (page urls, child sitemap urls). Namespace-agnostic tag
    matching; anything unparsable yields ([], [])."""
    try:
        root = ET.fromstring(body or "")
    except ET.ParseError:
        return [], []

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1].lower()

    pages: list[str] = []
    children: list[str] = []
    root_kind = local(root.tag)
    for entry in root:
        kind = local(entry.tag)
        for field in entry:
            if local(field.tag) != "loc" or not (field.text or "").strip():
                continue
            loc = field.text.strip()
            if root_kind == "sitemapindex" or kind == "sitemap":
                children.append(loc)
            else:
                pages.append(loc)
    return pages, children


def _parse_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(_PARSED_SCHEMA)
    def parse(body: pd.Series) -> pd.DataFrame:
        rows = [
            parse_sitemap_xml(b if isinstance(b, str) else "") for b in body
        ]
        return pd.DataFrame(rows, columns=["page_urls", "child_sitemaps"])

    return parse


def _fetch_bodies(urls: DataFrame, web: DataFrame) -> DataFrame:
    """(host, url) -> (host, url, body string) via the hermetic fetch
    join (live crawls can swap in fetch_live — same columns)."""
    from web_scraper_spark.sources.fetch import fetch_join

    fetched = fetch_join(urls, web)
    return fetched.where(F.col("status") == 200).select(
        "host", "url", F.col("body").cast("string").alias("body")
    )


def sitemap_frontier(
    rules: DataFrame, web: DataFrame, max_index_depth: int = 1
) -> DataFrame:
    """robots rules table -> (host, url) frontier candidates from every
    advertised sitemap, expanding ``max_index_depth`` levels of
    ``<sitemapindex>`` indirection (the protocol allows one)."""
    from web_scraper_spark.sources.robots import discovered_sitemaps

    todo = discovered_sitemaps(rules).select(
        "host", F.col("sitemap_url").alias("url")
    )
    pages = None
    parse = _parse_udf()
    cached_levels = []
    for _ in range(max_index_depth + 1):
        parsed = (
            _fetch_bodies(todo, web)
            .select("host", parse(F.col("body")).alias("p"))
            .select("host", "p.page_urls", "p.child_sitemaps")
            .cache()  # consumed twice (pages + child todo); released below
        )
        cached_levels.append(parsed)
        batch = parsed.select(
            "host", F.explode("page_urls").alias("url")
        ).dropDuplicates(["host", "url"])
        pages = batch if pages is None else pages.unionByName(batch)
        todo = parsed.select(
            "host", F.explode("child_sitemaps").alias("url")
        ).dropDuplicates(["host", "url"])
        if todo.isEmpty():
            break
    out = pages.dropDuplicates(["host", "url"]) if pages is not None else todo
    # materialize the result off the cached lineage, then release every
    # level's cache — long-lived sessions were leaking one cached plan per
    # index-expansion level per call (ADVICE r3)
    out = out.localCheckpoint(eager=True)
    for parsed in cached_levels:
        parsed.unpersist()
    return out
