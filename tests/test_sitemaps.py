"""Sitemap ingestion: XML parsing (urlset + sitemapindex, namespaced and
bare), and rules-table -> frontier-candidate expansion over the hermetic
fetch join."""

from web_scraper_spark.sources.sitemaps import parse_sitemap_xml

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def test_parse_urlset_and_index():
    urlset = f"""<?xml version="1.0"?>
    <urlset {NS}>
      <url><loc>http://s.test/a</loc><lastmod>2024-01-01</lastmod></url>
      <url><loc> http://s.test/b </loc></url>
      <url></url>
    </urlset>"""
    assert parse_sitemap_xml(urlset) == (
        ["http://s.test/a", "http://s.test/b"], [],
    )
    index = f"""<sitemapindex {NS}>
      <sitemap><loc>http://s.test/child-1.xml</loc></sitemap>
      <sitemap><loc>http://s.test/child-2.xml</loc></sitemap>
    </sitemapindex>"""
    assert parse_sitemap_xml(index) == (
        [], ["http://s.test/child-1.xml", "http://s.test/child-2.xml"],
    )
    # bare tags (no namespace) and malformed bodies
    assert parse_sitemap_xml("<urlset><url><loc>http://x/p</loc></url></urlset>") == (
        ["http://x/p"], [],
    )
    assert parse_sitemap_xml("not xml <<<") == ([], [])
    assert parse_sitemap_xml("") == ([], [])


def test_sitemap_frontier_expands_index(spark):
    from pyspark.sql.types import (
        BinaryType, IntegerType, StringType, StructField, StructType,
    )

    from web_scraper_spark.sources.robots import build_rules_table
    from web_scraper_spark.sources.sitemaps import sitemap_frontier

    robots = (b"User-agent: *\nDisallow: /private\n"
              b"Sitemap: http://sm.test/sitemap.xml\n")
    index = (f'<sitemapindex {NS}>'
             f'<sitemap><loc>http://sm.test/pages.xml</loc></sitemap>'
             f'</sitemapindex>').encode()
    pages_xml = (f'<urlset {NS}>'
                 f'<url><loc>http://sm.test/p1</loc></url>'
                 f'<url><loc>http://sm.test/p2</loc></url>'
                 f'</urlset>').encode()
    schema = StructType([
        StructField("url", StringType()), StructField("host", StringType()),
        StructField("depth", IntegerType()), StructField("status", IntegerType()),
        StructField("content_type", StringType()), StructField("body", BinaryType()),
    ])
    web = spark.createDataFrame(
        [
            ("http://sm.test/robots.txt", "sm.test", 0, 200, "text/plain", robots),
            ("http://sm.test/sitemap.xml", "sm.test", 0, 200, "application/xml", index),
            ("http://sm.test/pages.xml", "sm.test", 0, 200, "application/xml", pages_xml),
        ],
        schema,
    )
    rules = build_rules_table(
        web.where(web["url"].endswith("/robots.txt")).select("host", "body")
    )
    got = {(r.host, r.url) for r in sitemap_frontier(rules, web).collect()}
    assert got == {("sm.test", "http://sm.test/p1"), ("sm.test", "http://sm.test/p2")}


def test_crawl_ingests_sitemap_pages(spark, tmp_path):
    """Opt-in e2e wiring: with ingest_sitemaps=True a robots-advertised
    sitemap's pages are fetched at depth 0 (attributed to the host's
    seed) and their extractions land in the merged record; with the
    default False nothing changes."""
    from pyspark.sql.types import (
        BinaryType, IntegerType, StringType, StructField, StructType,
    )

    from web_scraper_spark.plans.crawl import run_crawl

    robots = (b"User-agent: *\n"
              b"Sitemap: http://sm.test/sitemap.xml\n")
    sm_xml = (f'<urlset {NS}>'
              f'<url><loc>http://sm.test/deep-page</loc></url>'
              f'</urlset>').encode()
    seed_page = b"<html><body><p>home</p></body></html>"
    deep_page = (b"<html><body>"
                 b"<a href='tel:+1 (212) 555-0042'>call</a>"
                 b"</body></html>")
    schema = StructType([
        StructField("url", StringType()), StructField("host", StringType()),
        StructField("depth", IntegerType()), StructField("status", IntegerType()),
        StructField("content_type", StringType()), StructField("body", BinaryType()),
    ])
    web = spark.createDataFrame(
        [
            ("http://sm.test", "sm.test", 0, 200, "text/html", seed_page),
            ("http://sm.test/robots.txt", "sm.test", 0, 200, "text/plain", robots),
            ("http://sm.test/sitemap.xml", "sm.test", 0, 200, "application/xml", sm_xml),
            ("http://sm.test/deep-page", "sm.test", 1, 200, "text/html", deep_page),
        ],
        schema,
    )

    plain = run_crawl(
        spark, ["sm.test"], web, None,
        workdir=str(tmp_path / "plain"), use_robots=True,
    )
    assert {r.url for r in plain.crawl_log.collect()} == {"http://sm.test"}

    ingested = run_crawl(
        spark, ["sm.test"], web, None,
        workdir=str(tmp_path / "sm"), use_robots=True, ingest_sitemaps=True,
    )
    assert {r.url for r in ingested.crawl_log.collect()} == {
        "http://sm.test", "http://sm.test/deep-page",
    }
    rec = {r.domain: r.phone_numbers for r in ingested.company_records.collect()}
    assert rec["sm.test"] == ["+12125550042"]  # tel: href, B8-cleaned


def test_sitemap_multi_seed_host_is_deterministic(spark, tmp_path):
    """ADVICE r3: a host with MULTIPLE seeds must attribute sitemap-seeded
    depth-0 rows to one deterministic representative (min seed_idx) — the
    old host-join + dropDuplicates kept an arbitrary fan-out row, making
    crawl order irreproducible. Two identical runs must agree exactly, and
    the sitemap row must carry the host's FIRST seed identity."""
    from pyspark.sql.types import (
        BinaryType, IntegerType, StringType, StructField, StructType,
    )

    from web_scraper_spark.plans.crawl import run_crawl

    robots = b"User-agent: *\nSitemap: http://multi.test/sitemap.xml\n"
    sm_xml = (f'<urlset {NS}>'
              f'<url><loc>http://multi.test/from-sitemap</loc></url>'
              f'</urlset>').encode()
    page = b"<html><body><p>x</p></body></html>"
    schema = StructType([
        StructField("url", StringType()), StructField("host", StringType()),
        StructField("depth", IntegerType()), StructField("status", IntegerType()),
        StructField("content_type", StringType()), StructField("body", BinaryType()),
    ])
    web = spark.createDataFrame(
        [
            ("http://multi.test", "multi.test", 0, 200, "text/html", page),
            ("http://multi.test/alt", "multi.test", 0, 200, "text/html", page),
            ("http://multi.test/robots.txt", "multi.test", 0, 200, "text/plain", robots),
            ("http://multi.test/sitemap.xml", "multi.test", 0, 200, "application/xml", sm_xml),
            ("http://multi.test/from-sitemap", "multi.test", 1, 200, "text/html", page),
        ],
        schema,
    )
    # two seeds on the same host: multi.test (seed_idx 0), /alt (seed_idx 1)
    seeds = ["multi.test", "multi.test/alt"]
    runs = []
    for i in range(2):
        res = run_crawl(
            spark, seeds, web, None,
            workdir=str(tmp_path / f"run{i}"), use_robots=True,
            ingest_sitemaps=True,
        )
        runs.append(sorted(
            (r["round"], r.depth, r.seed_idx, r.url)
            for r in res.crawl_log.collect()
        ))
    assert runs[0] == runs[1]
    sm_rows = [t for t in runs[0] if t[3] == "http://multi.test/from-sitemap"]
    assert len(sm_rows) == 1
    assert sm_rows[0][2] == 0  # attributed to the host's min seed_idx
